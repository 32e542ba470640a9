"""UNet3D (nmodel) tests: shapes, normalization contract, and numerical
parity with the reference torch implementation when mounted."""
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ducosy_tpu.models import unet3d
from tests.conftest import REFERENCE_DIR, reference_available

pytestmark = pytest.mark.slow  # full-tier only: heavy compiles /
# torch parity (round-5 fast tier: pytest -m "not slow")



def test_normalization_contract():
    vol = np.array([-2000.0, -1024.0, 1023.5, 3071.0, 5000.0])
    n = np.asarray(unet3d.normalize_hu(jnp.asarray(vol)))
    assert n[0] == -1.0 and n[1] == -1.0 and n[3] == 1.0 and n[4] == 1.0
    np.testing.assert_allclose(n[2], 0.0, atol=1e-6)
    d = np.asarray(unet3d.denormalize_diff(jnp.asarray([-1.0, 0.0, 1.0])))
    np.testing.assert_allclose(d, [0.0, 2000.0, 4000.0])


def test_unet3d_light_shapes(rng):
    m = unet3d.UNet3DLight(base_channels=4)
    x = jnp.asarray(rng.standard_normal((1, 2, 32, 32, 1)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (1, 2, 32, 32, 1)


def test_unet3d_shapes(rng):
    m = unet3d.UNet3D(base_channels=4)
    x = jnp.asarray(rng.standard_normal((1, 1, 32, 32, 1)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (1, 1, 32, 32, 1)


def test_batchnorm_updates_in_train_mode(rng):
    m = unet3d.UNet3DLight(base_channels=4)
    x = jnp.asarray(rng.standard_normal((2, 1, 16, 16, 1)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=True)
    _y, mutated = m.apply(variables, x, train=True,
                          mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


@pytest.fixture(scope="module")
def torch_unet():
    if not reference_available():
        pytest.skip("reference repo not mounted")
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from modules.nmodel.model import UNet3D as TU
        from modules.nmodel.model import UNet3DLight as TUL
    finally:
        sys.path.remove(REFERENCE_DIR)
        for mod in [m for m in sys.modules if m.startswith("modules")]:
            del sys.modules[mod]
    return torch, TU, TUL


@pytest.mark.parametrize("light", [True, False])
def test_parity_with_torch(torch_unet, rng, light):
    torch, TU, TUL = torch_unet
    torch.manual_seed(0)
    tm = (TUL(base_channels=4) if light else TU(base_channels=4)).eval()
    params, stats = unet3d.unet3d_params_from_torch(tm.state_dict())
    m = (unet3d.UNet3DLight if light else unet3d.UNet3D)(base_channels=4)

    x = rng.standard_normal((1, 2, 32, 32, 1)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    got = np.asarray(m.apply({"params": params, "batch_stats": stats},
                             jnp.asarray(x), train=False))
    np.testing.assert_allclose(got.transpose(0, 4, 1, 2, 3), want,
                               rtol=2e-3, atol=1e-4)


def test_predict_volume(rng):
    m = unet3d.UNet3DLight(base_channels=4)
    x0 = jnp.zeros((1, 1, 32, 32, 1), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x0, train=False)
    vol = rng.uniform(-1000, 1000, (5, 32, 32)).astype(np.float32)
    diff = unet3d.predict_volume(m, variables, vol, slice_batch=4)
    assert diff.shape == (5, 32, 32)
    assert np.isfinite(diff).all()
    assert diff.min() >= 0.0 and diff.max() <= 4000.0
