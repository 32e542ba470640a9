"""Volume-postprocess parity against the reference's ACTUAL
modules/postprocess.py (importable: numpy+scipy only) for every method,
with and without unsharp sharpening. test_infer.py pins each filter to a
scipy re-derivation; this pins the full postprocess_ct_volume composition
(smooth -> unsharp -> bone preserve -> int16) to the reference's code."""
import os
import sys

import numpy as np
import pytest

from ducosy_tpu.infer.postprocess import postprocess_ct_volume

pytestmark = pytest.mark.slow  # full-tier only: heavy compiles /
# torch parity (round-5 fast tier: pytest -m "not slow")


REFERENCE_DIR = os.environ.get("REFERENCE_DIR", "/root/reference")


@pytest.fixture(scope="module")
def ref_postprocess():
    if not os.path.isdir(os.path.join(REFERENCE_DIR, "modules")):
        pytest.skip("reference repo not mounted")
    pytest.importorskip("scipy")
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from modules.postprocess import postprocess_ct_volume as ref_fn
    finally:
        sys.path.remove(REFERENCE_DIR)
        for mod in [m for m in sys.modules if m.startswith("modules")]:
            del sys.modules[mod]
    return ref_fn


@pytest.fixture(scope="module")
def volume():
    rng = np.random.default_rng(3)
    vol = rng.uniform(-1024, 1500, (8, 24, 24)).astype(np.float32)
    vol[2:4, 5:9, 5:9] = 1200.0  # bone-range voxels exercise the preserve
    return vol


CASES = [
    ("gaussian", {"sigma": 1.0}, True),
    ("gaussian3d", {"sigma_z": 0.7, "sigma_xy": 0.05}, True),
    ("gaussian3d", {"sigma_z": 2.0, "sigma_xy": 0.5}, False),
    ("adaptive", {"base_sigma": 1.5, "max_sigma": 3.0}, True),
    ("median", {"kernel_size": 3}, True),
    ("interpolation", {}, False),
    ("kalman", {"process_variance": 1e-5,
                "measurement_variance": 1e-2}, True),
]


@pytest.mark.parametrize("method,kwargs,sharpen", CASES)
def test_postprocess_matches_reference(ref_postprocess, volume, method,
                                       kwargs, sharpen):
    extra = {"sharpen_amount": 1.7, "sharpen_radius": 1.2} if sharpen else {}
    want = ref_postprocess(volume.copy(), method=method,
                           enhance_sharpness=sharpen, **kwargs, **extra)
    got = postprocess_ct_volume(volume.copy(), method=method,
                                enhance_sharpness=sharpen, **kwargs, **extra)
    assert want.dtype == got.dtype == np.int16
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    # fp32 (ours, TPU-jittable) vs float64 (reference scipy) rounding can
    # move an int16 cast by one unit on knife-edge voxels
    assert np.mean(diff <= 1) > 0.999, (method, np.mean(diff <= 1),
                                        diff.max())
    assert float(np.mean(diff)) < 0.05, (method, float(np.mean(diff)))
