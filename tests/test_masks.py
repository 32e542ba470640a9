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


def noisy_volume(z=6, h=256, w=256, seed=0):
    """Multi-slice phantom with random speckle to stress components/holes."""
    rng = np.random.default_rng(seed)
    vol = np.stack([chest_phantom(h, w)] * z).copy()
    sp = rng.random(vol.shape) < 0.002
    vol[sp] = rng.uniform(-1000, 1000, int(sp.sum())).astype(np.float32)
    return vol


def test_fused_driver_matches_independent_detectors():
    """generate_anatomical_masks (fused=True, the default) must be
    byte-identical to running each detector independently."""
    vol = noisy_volume()
    fused = anatomy.generate_anatomical_masks(vol)
    unfused = anatomy.generate_anatomical_masks(vol, fused=False)
    assert set(fused) == set(unfused)
    for k in fused:
        np.testing.assert_array_equal(fused[k], unfused[k])


@pytest.mark.skipif(not anatomy._HAS_CV2, reason="cv2 not installed")
def test_cv2_primitives_match_scipy():
    """The cv2 fast paths for labeling and hole filling must be exact:
    identical component partitions and identical fills (4-connectivity)."""
    rng = np.random.default_rng(1)
    mask = (rng.random((256, 256)) < 0.3).astype(np.uint8)
    mask[100:140, 100:140] = 1
    mask[110:130, 110:130] = 0  # a hole
    # fills
    from scipy import ndimage
    np.testing.assert_array_equal(
        anatomy._fill_holes(mask),
        ndimage.binary_fill_holes(mask).astype(np.uint8))
    # labels: same partition (bijection between labelings)
    l_cv, n_cv = anatomy._label(mask)
    l_sp, n_sp = ndimage.label(mask)
    assert n_cv == n_sp
    pairs = set(zip(l_cv.ravel().tolist(), l_sp.ravel().tolist()))
    assert len(pairs) == n_cv + 1  # background plus one pair per component


@pytest.mark.skipif(not anatomy._HAS_CV2, reason="cv2 not installed")
def test_masks_identical_with_and_without_cv2():
    """End-to-end: the cv2-accelerated pipeline and the scipy fallback give
    identical masks (exact_hull=True removes the one documented <=1px
    hull-raster deviation)."""
    vol = noisy_volume(z=3)
    with_cv2 = anatomy.generate_anatomical_masks(vol, exact_hull=True)
    anatomy._HAS_CV2 = False
    try:
        without = anatomy.generate_anatomical_masks(vol, exact_hull=True)
    finally:
        anatomy._HAS_CV2 = True
    for k in with_cv2:
        np.testing.assert_array_equal(with_cv2[k], without[k])


def test_row_extreme_hull_equals_all_pixel_hull():
    """The row-extreme point reduction must produce the same hull REGION as
    hulling every masked pixel (rasterized identically via cv2)."""
    rng = np.random.default_rng(2)
    for _ in range(5):
        mask = np.zeros((128, 128), np.uint8)
        pts = rng.integers(20, 108, size=(40, 2))
        mask[pts[:, 0], pts[:, 1]] = 1
        if not anatomy._HAS_CV2:
            pytest.skip("cv2 not installed")
        from scipy.spatial import ConvexHull
        import cv2
        all_px = np.argwhere(mask == 1)
        ref = np.zeros_like(mask)
        verts = all_px[ConvexHull(all_px).vertices][:, ::-1].astype(np.int32)
        cv2.fillConvexPoly(ref, verts.reshape(-1, 1, 2), 1)
        fast = anatomy._hull_mask(mask, exact=False)
        np.testing.assert_array_equal(fast, ref)
