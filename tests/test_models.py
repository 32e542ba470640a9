"""Model architecture tests: shapes, param counts, and numerical parity with
the reference PyTorch implementation (loaded from /root/reference when
present — skipped otherwise)."""
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ducosy_tpu.models import Discriminator, Generator
from ducosy_tpu.models.torch_import import (
    discriminator_params_from_torch,
    generator_params_from_torch,
    generator_params_to_torch,
)
from tests.conftest import REFERENCE_DIR, reference_available

pytestmark = pytest.mark.slow  # full-tier only: heavy compiles /
# torch parity (round-5 fast tier: pytest -m "not slow")



def _init(model, shape):
    return model.init(jax.random.PRNGKey(0), jnp.zeros(shape, jnp.float32))


def test_generator_output_shape():
    g = Generator(input_channels=3, num_residual_blocks=2)
    variables = _init(g, (1, 64, 64, 3))
    y = g.apply(variables, jnp.zeros((2, 64, 64, 3)))
    assert y.shape == (2, 64, 64, 1)
    assert np.all(np.abs(np.asarray(y)) <= 1.0)


def test_discriminator_output_shape():
    d = Discriminator()
    variables = _init(d, (1, 64, 64, 1))
    y = d.apply(variables, jnp.zeros((2, 64, 64, 1)))
    # img_size // 16 patch map (trainer.py:459-460)
    assert y.shape == (2, 4, 4, 1)


def test_generator_param_count_matches_torch_formula():
    """11.366M params for the 1-channel CBAM ResNet-9 generator — computed
    independently from the architecture spec (modules/model.py:90-115)."""
    g = Generator(input_channels=1, num_residual_blocks=9)
    variables = _init(g, (1, 32, 32, 1))
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"]))

    def convp(i, o, k, bias=True):
        return i * o * k * k + (o if bias else 0)

    want = (
        convp(1, 64, 7) + convp(64, 128, 3) + convp(128, 256, 3)
        + 9 * (2 * convp(256, 256, 3)          # block convs
               + 256 * 16 * 2                  # CBAM channel MLP (no bias)
               + convp(2, 1, 7, bias=False))   # CBAM spatial conv
        + convp(256, 128, 3) + convp(128, 64, 3) + convp(64, 1, 7)
    )
    assert n == want


@pytest.fixture(scope="module")
def torch_models():
    if not reference_available():
        pytest.skip("reference repo not mounted")
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from modules.model import Discriminator as TD
        from modules.model import Generator as TG
    finally:
        sys.path.remove(REFERENCE_DIR)
        for mod in [m for m in sys.modules if m.startswith("modules")]:
            del sys.modules[mod]
    return torch, TG, TD


def test_generator_parity_with_torch(torch_models, rng):
    """Config 1 of BASELINE.json: generator forward parity vs the PyTorch
    reference at fp32 on a 128x128 slice."""
    torch, TG, _ = torch_models
    torch.manual_seed(0)
    tg = TG(input_channels=1, num_residual_blocks=9, use_cbam=True).eval()
    params = generator_params_from_torch(tg.state_dict())

    x = rng.standard_normal((2, 128, 128, 1)).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    g = Generator(input_channels=1, num_residual_blocks=9)
    got = np.asarray(g.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=2e-5)


def test_generator_parity_with_masks_no_cbam(torch_models, rng):
    torch, TG, _ = torch_models
    torch.manual_seed(1)
    tg = TG(input_channels=3, num_residual_blocks=3, use_cbam=False).eval()
    params = generator_params_from_torch(tg.state_dict(),
                                         num_residual_blocks=3)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    g = Generator(input_channels=3, num_residual_blocks=3, use_cbam=False)
    got = np.asarray(g.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=2e-5)


def test_discriminator_parity_with_torch(torch_models, rng):
    torch, _, TD = torch_models
    torch.manual_seed(2)
    td = TD(input_channels=1).eval()
    params = discriminator_params_from_torch(td.state_dict())
    x = rng.standard_normal((2, 128, 128, 1)).astype(np.float32)
    with torch.no_grad():
        want = td(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    d = Discriminator()
    got = np.asarray(d.apply({"params": params}, jnp.asarray(x)))
    assert got.transpose(0, 3, 1, 2).shape == want.shape
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=2e-5)


def test_generator_torch_roundtrip(torch_models):
    """flax -> torch -> flax keeps every weight bit-identical."""
    torch, TG, _ = torch_models
    torch.manual_seed(3)
    tg = TG(input_channels=1, num_residual_blocks=2, use_cbam=True)
    params = generator_params_from_torch(tg.state_dict(),
                                         num_residual_blocks=2)
    sd = generator_params_to_torch(params, num_residual_blocks=2)
    params2 = generator_params_from_torch(sd, num_residual_blocks=2)
    jax.tree_util.tree_map(np.testing.assert_array_equal, params, params2)
