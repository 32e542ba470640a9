"""Dataset parity against the reference's ACTUAL DicomDataset
(modules/dataset.py:61-185), executed with our self-written codec standing
in for pydicom (the codec's Dataset exposes the same attribute surface).
Pins pairing order (InstanceNumber sort over shuffled filenames), the
soft-squeezing HU transform, and auto-generated mask channel assembly to
the reference's own code."""
import os
import sys
import types

import numpy as np
import pytest

from ducosy_tpu.config import SOFT_TISSUE
from ducosy_tpu.data.dataset import SlicePairDataset
from ducosy_tpu.dicom.codec import dcmread, new_ct_dataset

pytestmark = pytest.mark.slow  # full-tier only: heavy compiles /
# torch parity (round-5 fast tier: pytest -m "not slow")


REFERENCE_DIR = os.environ.get("REFERENCE_DIR", "/root/reference")


@pytest.fixture(scope="module")
def ref_dataset_cls():
    if not os.path.isdir(os.path.join(REFERENCE_DIR, "modules")):
        pytest.skip("reference repo not mounted")
    pytest.importorskip("torch")
    pytest.importorskip("matplotlib")  # mask_generator dependency
    shim = types.ModuleType("pydicom")
    shim.dcmread = dcmread
    sys.modules["pydicom"] = shim
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from modules.dataset import DicomDataset
    finally:
        sys.path.remove(REFERENCE_DIR)
        for mod in [m for m in sys.modules if m.startswith("modules")]:
            del sys.modules[mod]
        del sys.modules["pydicom"]
    return DicomDataset


def _write_patient_shuffled(patient_dir, n_slices=3, size=64):
    """Filename order deliberately DISAGREES with InstanceNumber order so
    only an InstanceNumber sort pairs slices correctly."""
    rng = np.random.default_rng(11)
    for series in ("POST VUE", "POST STD"):
        d = os.path.join(patient_dir, series)
        os.makedirs(d)
        for i in range(n_slices):
            ds = new_ct_dataset(rows=size, cols=size)
            ds.InstanceNumber = i + 1
            ds.set_pixel_array(
                rng.integers(0, 3000, (size, size)).astype(np.int16))
            # instance 1 -> "z.dcm", instance 2 -> "y.dcm", ...
            name = chr(ord("z") - i) + ".dcm"
            ds.save_as(os.path.join(d, name))


def test_dataset_matches_reference(tmp_path, ref_dataset_cls):
    size = 64
    _write_patient_shuffled(str(tmp_path / "p1"), n_slices=3, size=size)

    args = types.SimpleNamespace(
        ncct_folder="POST VUE", cect_folder="POST STD",
        hu_min=SOFT_TISSUE.hu_min, hu_max=SOFT_TISSUE.hu_max,
        use_soft_squeezing=True, use_masks=True, auto_generate_masks=True,
        mask_types=list(SOFT_TISSUE.mask_types))
    ref_ds = ref_dataset_cls([str(tmp_path / "p1")], args, transform=None)

    ours = SlicePairDataset([str(tmp_path / "p1")], SOFT_TISSUE,
                            img_size=size)
    assert len(ref_ds) == len(ours) == 3

    for i in range(3):
        want = ref_ds[i]
        got = ours[i]
        np.testing.assert_allclose(got["a"][..., 0], np.asarray(want["A"]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(got["b"][..., 0], np.asarray(want["B"]),
                                   rtol=1e-6, atol=1e-6)
        # (C, H, W) torch masks vs our (H, W, C) channels — byte-exact
        want_masks = np.asarray(want["masks"]).transpose(1, 2, 0)
        np.testing.assert_array_equal(got["masks"], want_masks)
