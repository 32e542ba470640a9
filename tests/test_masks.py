"""Anatomical mask generator tests: synthetic chest phantoms plus direct
behavior-parity against the reference implementation
(/root/reference/modules/mask_generator.py) when mounted."""
import sys

import numpy as np
import pytest

from ducosy_tpu.masks import anatomy
from tests.conftest import REFERENCE_DIR, reference_available


def chest_phantom(h=256, w=256):
    """Synthetic axial chest slice: air background, body ellipse (~40 HU),
    two air lungs, a bright sternum/spine, vessels inside lungs."""
    hu = np.full((h, w), -1024.0, np.float32)
    yy, xx = np.mgrid[:h, :w]
    body = ((yy - h / 2) / (h * 0.42)) ** 2 + ((xx - w / 2) / (w * 0.45)) ** 2 < 1
    hu[body] = 40.0
    for cx in (w * 0.32, w * 0.68):
        lung = ((yy - h / 2) / (h * 0.26)) ** 2 + \
               ((xx - cx) / (w * 0.14)) ** 2 < 1
        hu[lung] = -850.0
        vessel = ((yy - h / 2) ** 2 + (xx - cx) ** 2) < (h * 0.02) ** 2
        hu[vessel] = 50.0
    spine = (np.abs(xx - w / 2) < w * 0.05) & (np.abs(yy - h * 0.78) < h * 0.06)
    hu[spine & body] = 700.0
    sternum = (np.abs(xx - w / 2) < w * 0.04) & (np.abs(yy - h * 0.22) < h * 0.03)
    hu[sternum & body] = 500.0
    return hu


def test_lung_detection_on_phantom():
    hu = chest_phantom()
    lung = anatomy.detect_lung_2d(hu)
    assert lung.sum() > 1000
    # lungs are air-filled regions inside the body
    assert np.all(hu[lung == 1] >= -1000) and np.all(hu[lung == 1] <= -300)
    # border margin enforced
    assert lung[:32, :].sum() == 0 and lung[:, :32].sum() == 0


def test_mediastinum_between_lungs():
    hu = chest_phantom()
    lung = anatomy.detect_lung_2d(hu)
    med = anatomy.detect_mediastinum_2d(hu, lung)
    assert med.sum() > 0
    # mediastinum lies strictly outside the lungs, inside soft-tissue HU
    assert np.all(lung[med == 1] == 0)
    assert np.all(hu[med == 1] >= -300) and np.all(hu[med == 1] <= 450)
    # concentrated near the midline between the lungs
    cols = np.argwhere(med == 1)[:, 1]
    assert abs(cols.mean() - 128) < 35


def test_bone_detection():
    hu = chest_phantom()
    lung = anatomy.detect_lung_2d(hu)
    bone = anatomy.detect_bone_2d(hu, lung)
    assert bone.sum() > 0
    # spine (bottom band) must survive the mediastinal-vessel exclusion
    spine_rows = slice(int(256 * 0.72), int(256 * 0.84))
    assert bone[spine_rows, 116:140].sum() > 0


def test_vessels_inside_lungs():
    hu = chest_phantom()
    lung = anatomy.detect_lung_2d(hu)
    ves = anatomy.detect_lung_vessels_2d(hu, lung)
    assert ves.sum() > 0
    assert np.all(hu[ves == 1] >= -300) and np.all(hu[ves == 1] <= 600)


def test_gate_rejects_single_lung():
    """With <2 lung components the vessel/mediastinum detectors return
    zeros (mask_generator.py:68,116)."""
    hu = np.full((128, 128), 40.0, np.float32)
    yy, xx = np.mgrid[:128, :128]
    lungish = ((yy - 64) ** 2 + (xx - 64) ** 2) < 20 ** 2
    hu[lungish] = -800.0
    lung = anatomy.detect_lung_2d(hu)
    assert anatomy.detect_lung_vessels_2d(hu, lung).sum() == 0
    assert anatomy.detect_mediastinum_2d(hu, lung).sum() == 0


def test_3d_volume_dispatch():
    hu = np.stack([chest_phantom(128, 128)] * 3)
    masks = anatomy.generate_anatomical_masks(hu, ["lung", "bone"])
    assert masks["lung"].shape == (3, 128, 128)
    assert masks["bone"].shape == (3, 128, 128)
    np.testing.assert_array_equal(masks["lung"][0], masks["lung"][2])


@pytest.fixture(scope="module")
def ref_maskgen():
    if not reference_available():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from modules import mask_generator as ref
    finally:
        sys.path.remove(REFERENCE_DIR)
    return ref


@pytest.mark.parametrize("mask_type", ["lung", "lung_vessel", "bone",
                                       "mediastinum"])
def test_parity_with_reference(ref_maskgen, mask_type):
    """IoU >= 0.99 vs the reference detectors on the phantom (hull
    rasterization may differ by <=1 px at boundaries; exact_hull mode must
    match exactly)."""
    hu = chest_phantom()
    ours = anatomy.generate_anatomical_masks(hu, [mask_type],
                                             exact_hull=True)[mask_type]
    theirs = ref_maskgen.generate_anatomical_masks(hu, [mask_type])[mask_type]
    np.testing.assert_array_equal(ours, theirs)


def test_fast_hull_close_to_exact():
    hu = chest_phantom()
    lung = anatomy.detect_lung_2d(hu)
    fast = anatomy._hull_mask(lung, exact=False)
    exact = anatomy._hull_mask(lung, exact=True)
    inter = (fast & exact).sum()
    union = (fast | exact).sum()
    assert inter / union > 0.98
