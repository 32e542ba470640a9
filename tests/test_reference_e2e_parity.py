"""Whole-pipeline parity against the ACTUAL reference implementation.

The same random torch checkpoints drive both sides:
  (a) the reference chain, executed with the reference's own code —
      modules.model.Generator forwards, modules.preprocess.
      postprocess_tensor (imported with a stubbed pydicom), the
      stored-space complementary compositing of generate.py:219-240, the
      scipy z-gaussian of :257, and modules.postprocess.
      postprocess_ct_volume(:260-263);
  (b) ducosy_tpu's DualGeneratorEngine.run_patient — the whole chain as
      ONE fused XLA program.
The final int16 volumes must agree to within +-1 stored unit almost
everywhere (fp32 both sides; knife-edge compositing pixels may differ)."""
import os
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ducosy_tpu.config import LUNG, SOFT_TISSUE, ModelConfig
from ducosy_tpu.infer.engine import DualGeneratorEngine
from ducosy_tpu.models.torch_import import generator_params_from_torch

pytestmark = pytest.mark.slow  # full-tier only: heavy compiles /
# torch parity (round-5 fast tier: pytest -m "not slow")


REFERENCE_DIR = os.environ.get("REFERENCE_DIR", "/root/reference")


def _reference_modules():
    if not os.path.isdir(os.path.join(REFERENCE_DIR, "modules")):
        pytest.skip("reference repo not mounted")
    torch = pytest.importorskip("torch")
    scipy = pytest.importorskip("scipy")  # noqa: F841 (ref postprocess)
    # modules.preprocess does `import pydicom` at module level but
    # postprocess_tensor never touches it — stub it for the import
    sys.path.insert(0, REFERENCE_DIR)
    sys.modules.setdefault("pydicom", types.ModuleType("pydicom"))
    try:
        from modules.model import Generator as TG
        from modules.postprocess import postprocess_ct_volume
        from modules.preprocess import postprocess_tensor
    finally:
        sys.path.remove(REFERENCE_DIR)
        for mod in [m for m in sys.modules if m.startswith("modules")]:
            del sys.modules[mod]
    return torch, TG, postprocess_tensor, postprocess_ct_volume


class _DcmShim:
    """The two attributes postprocess_tensor reads (preprocess.py:135-158)."""

    def __init__(self, pixel_array):
        self.pixel_array = pixel_array
        self.RescaleSlope = 1.0
        self.RescaleIntercept = -1024.0


def test_engine_matches_reference_generate_synthesis(rng):
    torch, TG, postprocess_tensor, postprocess_ct_volume = \
        _reference_modules()

    size, n_slices, blocks = 64, 6, 2
    torch.manual_seed(0)
    tg_st = TG(input_channels=1, num_residual_blocks=blocks,
               use_cbam=True).eval()
    torch.manual_seed(1)
    tg_lung = TG(input_channels=1, num_residual_blocks=blocks,
                 use_cbam=True).eval()

    stored = rng.integers(0, 3000, (n_slices, size, size)).astype(np.int16)

    # ---- reference side (generate.py generate() + synthesis())
    merged_volume = []
    with torch.no_grad():
        for px in stored:
            shim = _DcmShim(px)
            hu = px.astype(np.float32) * 1.0 + (-1024.0)
            # preprocess_dicom:113-125 — clip + linear normalize per range
            outs = {}
            for name, model, rc in (("st", tg_st, SOFT_TISSUE),
                                    ("lung", tg_lung, LUNG)):
                norm = np.clip(hu, rc.hu_min, rc.hu_max)
                norm = (2.0 * (norm - rc.hu_min)
                        / (rc.hu_max - rc.hu_min) - 1.0)
                t = torch.from_numpy(norm).unsqueeze(0).unsqueeze(0)
                out = model(t)  # img_size == input size: Resize is identity
                outs[name] = postprocess_tensor(out, shim, rc.hu_min,
                                                rc.hu_max)
            # synthesis():219-240 — complementary stored-space compositing
            merged = px.copy()
            st_mask = (hu >= SOFT_TISSUE.hu_min) & (hu <= SOFT_TISSUE.hu_max)
            lung_mask = (hu >= LUNG.hu_min) & (hu <= LUNG.hu_max)
            merged[st_mask] = outs["st"][st_mask]
            merged[lung_mask] = outs["lung"][lung_mask]
            merged_volume.append(merged)
    from scipy.ndimage import gaussian_filter1d
    ref = np.asarray(merged_volume, dtype=np.float32)
    ref = gaussian_filter1d(ref, sigma=0.8, axis=0)   # generate.py:257
    ref = postprocess_ct_volume(ref, method="gaussian3d",  # :260-263
                                sigma_z=0.7, sigma_xy=0.05,
                                enhance_sharpness=True, sharpen_amount=1.7,
                                sharpen_radius=1.2)
    assert ref.dtype == np.int16  # postprocess.py:109

    # ---- ducosy_tpu side: one fused program on the same checkpoints
    engine = DualGeneratorEngine(
        generator_params_from_torch(tg_st.state_dict(),
                                    num_residual_blocks=blocks),
        generator_params_from_torch(tg_lung.state_dict(),
                                    num_residual_blocks=blocks),
        model_cfg=ModelConfig(num_residual_blocks=blocks), img_size=size,
        compute_dtype=jnp.float32)
    got = np.asarray(engine.run_patient_async(stored, 1.0, -1024.0, chunk=3))

    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert np.mean(diff <= 1) > 0.99, (np.mean(diff <= 1), diff.max())
    assert float(np.mean(diff)) < 0.5
