"""Loss-term parity against the reference's ACTUAL torch loss classes
(modules/trainer.py:22-184), at the exact hyperparameters the reference
trainer instantiates them with (:350-358). The numpy-recompute tests in
test_losses.py pin our reading of the formulas; this pins the formulas to
the reference's code itself."""
import os
import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp

from ducosy_tpu.losses.basic import gradient_loss
from ducosy_tpu.losses.contrast import (
    contrast_attention_loss,

    contrast_edge_loss,
    contrast_region_loss,
)

pytestmark = pytest.mark.slow  # full-tier only: heavy compiles /
# torch parity (round-5 fast tier: pytest -m "not slow")


REFERENCE_DIR = os.environ.get("REFERENCE_DIR", "/root/reference")


def _reference_losses():
    if not os.path.isdir(os.path.join(REFERENCE_DIR, "modules")):
        pytest.skip("reference repo not mounted")
    torch = pytest.importorskip("torch")
    # modules/trainer.py imports GPU-training deps its loss classes never
    # touch — stub what the environment doesn't ship
    for name in ("pydicom", "pytorch_msssim", "torchvision",
                 "torchvision.transforms", "torchvision.utils"):
        mod = sys.modules.setdefault(name, types.ModuleType(name))
        for attr in ("SSIM", "save_image", "transforms", "utils"):
            if not hasattr(mod, attr):
                setattr(mod, attr, object)
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from modules.trainer import (
            ContrastAttentionLoss,
            ContrastEdgeLoss,
            ContrastRegionLoss,
            GradientLoss,
        )
    finally:
        sys.path.remove(REFERENCE_DIR)
        for mod in [m for m in sys.modules if m.startswith("modules")]:
            del sys.modules[mod]
    return torch, (GradientLoss, ContrastAttentionLoss, ContrastRegionLoss,
                   ContrastEdgeLoss)


@pytest.fixture(scope="module")
def tensors():
    rng = np.random.default_rng(7)
    shape = (2, 1, 32, 32)  # NCHW for torch; NHWC for ours
    return {k: rng.uniform(-1, 1, shape).astype(np.float32)
            for k in ("pred", "target", "source")}


def _both(t, x):
    return t.from_numpy(x), jnp.asarray(x.transpose(0, 2, 3, 1))


def test_gradient_loss_matches_reference(tensors):
    torch, (GradientLoss, *_rest) = _reference_losses()
    tp, jp = _both(torch, tensors["pred"])
    tt, jt = _both(torch, tensors["target"])
    with torch.no_grad():
        want = float(GradientLoss()(tp, tt))
    got = float(gradient_loss(jp, jt))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_contrast_attention_matches_reference(tensors):
    torch, (_g, CA, *_rest) = _reference_losses()
    tp, jp = _both(torch, tensors["pred"])
    tt, jt = _both(torch, tensors["target"])
    ts, js = _both(torch, tensors["source"])
    with torch.no_grad():
        want = float(CA(sigma=0.15, min_weight=1.0, max_weight=3.0,
                        blur_kernel=7)(tp, tt, ts))  # trainer.py:356
    got = float(contrast_attention_loss(jp, jt, js))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_contrast_region_matches_reference(tensors):
    torch, (_g, _ca, CR, _ce) = _reference_losses()
    tp, jp = _both(torch, tensors["pred"])
    tt, jt = _both(torch, tensors["target"])
    ts, js = _both(torch, tensors["source"])
    with torch.no_grad():
        want = float(CR(threshold=0.15, weight=1.5)(tp, tt, ts))  # :357
    got = float(contrast_region_loss(jp, jt, js))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_contrast_edge_matches_reference(tensors):
    torch, (_g, _ca, _cr, CE) = _reference_losses()
    tp, jp = _both(torch, tensors["pred"])
    tt, jt = _both(torch, tensors["target"])
    ts, js = _both(torch, tensors["source"])
    with torch.no_grad():
        want = float(CE()(tp, tt, ts))  # trainer.py:358
    got = float(contrast_edge_loss(jp, jt, js))
    np.testing.assert_allclose(got, want, rtol=1e-4)
