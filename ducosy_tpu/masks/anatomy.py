"""HU-threshold anatomical mask generation (lung / lung-vessel / mediastinum
/ bone).

Behavior-parity rebuild of the reference detectors
(modules/mask_generator.py:11-347), which condition the generators via extra
input channels (modules/dataset.py:130-158). These are host-side numpy/scipy
functions by design: connected-component labeling, hole filling and convex
hulls do not XLA-compile, and the reference also runs them inside DataLoader
workers — the TPU pipeline runs them in the async host loader
(ducosy_tpu/data), overlapped with device steps.

Deviations from the reference (same semantics, faster):
  - small-component removal uses a single vectorized ndimage.sum_labels pass
    instead of a Python loop over region ids;
  - convex-hull rasterization uses cv2.fillConvexPoly (exact=False, default)
    instead of matplotlib Path.contains_points — boundary pixels can differ
    by <=1 px, immaterial for soft conditioning channels; pass exact=True for
    the reference's point-in-polygon test;
  - bone region-growing keeps the same label-union rule but runs it with one
    labeling pass.
All thresholds/margins identical: lung HU in [-1000,-300] within body
(>-1000 HU), 32-px border zeroed, components <64 px dropped; vessels
[-300,600] inside filled-lung minus lung; mediastinum [-300,450] inside
hull(lung) minus lung; bone >=200 HU with mediastinal-vessel exclusion except
the bottom-25% spine band, region-grown back, holes filled.
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
from scipy import ndimage

try:
    import cv2
    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

LUNG_LOWER, LUNG_UPPER = -1000.0, -300.0
VESSEL_LOWER, VESSEL_UPPER = -300.0, 600.0
MEDIASTINUM_LOWER, MEDIASTINUM_UPPER = -300.0, 450.0
BONE_THRESHOLD = 200.0
BODY_THRESHOLD = -1000.0
MIN_LUNG_COMPONENT = 64
BORDER_MARGIN = 32
SPINE_MARGIN_RATIO = 0.25
MIN_LUNG_BODY_RATIO = 0.1


def _remove_small_components(mask: np.ndarray, min_size: int) -> np.ndarray:
    """Zero connected components smaller than min_size (vectorized)."""
    labeled, n = ndimage.label(mask)
    if n == 0:
        return mask
    sizes = ndimage.sum_labels(mask, labeled, index=np.arange(1, n + 1))
    keep = np.zeros(n + 1, dtype=bool)
    keep[1:] = sizes >= min_size
    return (keep[labeled]).astype(np.uint8)


def detect_lung_2d(hu: np.ndarray, *, lung_lower=LUNG_LOWER,
                   lung_upper=LUNG_UPPER, min_size=MIN_LUNG_COMPONENT,
                   border_margin=BORDER_MARGIN) -> np.ndarray:
    """Lung mask for one slice (mask_generator.py:11-52, 2-D path)."""
    body = hu > BODY_THRESHOLD
    lung = ((hu >= lung_lower) & (hu <= lung_upper) & body).astype(np.uint8)
    h, w = lung.shape
    lung[:border_margin, :] = 0
    lung[h - border_margin:, :] = 0
    lung[:, :border_margin] = 0
    lung[:, w - border_margin:] = 0
    return _remove_small_components(lung, min_size)


def _lung_gate(hu: np.ndarray, lung: np.ndarray) -> bool:
    """The shared eligibility check (mask_generator.py:68,116,196): at least
    two lung components and lung/body area ratio >= 0.1."""
    _, n = ndimage.label(lung)
    body_area = int((hu > BODY_THRESHOLD).sum())
    return n >= 2 and body_area > 0 and (lung.sum() / body_area) >= \
        MIN_LUNG_BODY_RATIO


def _hull_mask(lung: np.ndarray, *, exact: bool = False) -> np.ndarray:
    """Rasterized convex hull of the lung pixels; falls back to the lung mask
    itself for degenerate inputs (mask_generator.py:119-130)."""
    coords = np.argwhere(lung == 1)
    if len(coords) < 3:
        return lung.copy()
    try:
        from scipy.spatial import ConvexHull
        hull = ConvexHull(coords)
    except Exception:
        return lung.copy()
    verts = coords[hull.vertices]  # (k, 2) in (y, x)
    if _HAS_CV2 and not exact:
        out = np.zeros(lung.shape, np.uint8)
        pts = verts[:, ::-1].astype(np.int32)  # cv2 wants (x, y)
        cv2.fillConvexPoly(out, pts.reshape(-1, 1, 2), 1)
        return out
    from matplotlib.path import Path
    yy, xx = np.mgrid[: lung.shape[0], : lung.shape[1]]
    pts = np.vstack((yy.ravel(), xx.ravel())).T
    return Path(verts).contains_points(pts).reshape(lung.shape).astype(
        np.uint8)


def detect_lung_vessels_2d(hu: np.ndarray, lung: np.ndarray) -> np.ndarray:
    """Vessels: filled-lung minus lung, gated on HU in [-300, 600]
    (mask_generator.py:55-99, 2-D path)."""
    if _lung_gate(hu, lung):
        filled = ndimage.binary_fill_holes(lung).astype(np.uint8)
        candidate = filled - lung
    else:
        candidate = np.zeros_like(lung)
    hu_ok = (hu >= VESSEL_LOWER) & (hu <= VESSEL_UPPER)
    return (candidate.astype(bool) & hu_ok).astype(np.uint8)


def detect_mediastinum_2d(hu: np.ndarray, lung: np.ndarray, *,
                          exact_hull: bool = False) -> np.ndarray:
    """Mediastinum: hull(lung) minus lung, HU in [-300, 450]
    (mask_generator.py:102-174, 2-D path)."""
    if not _lung_gate(hu, lung):
        return np.zeros_like(lung)
    hull = _hull_mask(lung, exact=exact_hull)
    candidate = (hull.astype(np.int16) - lung.astype(np.int16)) > 0
    hu_ok = (hu >= MEDIASTINUM_LOWER) & (hu <= MEDIASTINUM_UPPER)
    return (candidate & hu_ok).astype(np.uint8)


def detect_bone_2d(hu: np.ndarray, lung: np.ndarray, *,
                   bone_threshold=BONE_THRESHOLD,
                   spine_margin_ratio=SPINE_MARGIN_RATIO,
                   exact_hull: bool = False) -> np.ndarray:
    """Bone: HU>=200 within body, minus the mediastinal-vessel region inside
    hull(lung) (except the bottom-quarter spine band), with removed
    spine-connected components grown back and holes filled
    (mask_generator.py:177-245, 2-D path)."""
    body = hu > BODY_THRESHOLD
    all_bone = ((hu >= bone_threshold) & body).astype(np.uint8)
    bone = all_bone.copy()

    if _lung_gate(hu, lung) and (lung == 1).sum() >= 3:
        hull = _hull_mask(lung, exact=exact_hull)
        h = lung.shape[0]
        spine = np.zeros_like(lung)
        spine[int(h * (1 - spine_margin_ratio)):, :] = 1
        vessel_region = hull.astype(bool) & ~lung.astype(bool) & \
            ~spine.astype(bool)
        bone = (bone.astype(bool) & ~vessel_region).astype(np.uint8)

    # region growing: re-attach removed bone pixels whose component touches
    # surviving bone, but only where HU still qualifies
    removed = (all_bone.astype(bool) & ~bone.astype(bool))
    if removed.any():
        combined = (bone.astype(bool) | removed).astype(np.uint8)
        labeled, _ = ndimage.label(combined)
        bone_labels = np.unique(labeled[bone > 0])
        bone_labels = bone_labels[bone_labels != 0]
        if bone_labels.size:
            grow = np.isin(labeled, bone_labels) & (hu >= bone_threshold)
            bone = (bone.astype(bool) | grow).astype(np.uint8)

    if bone.sum() > 0:
        bone = ndimage.binary_fill_holes(bone).astype(np.uint8)
    return bone


def _per_slice(fn, hu: np.ndarray, *args, **kw) -> np.ndarray:
    if hu.ndim == 2:
        return fn(hu, *args, **kw)
    return np.stack([fn(hu[z], *(a[z] if isinstance(a, np.ndarray)
                                 and a.ndim == 3 else a for a in args), **kw)
                     for z in range(hu.shape[0])])


def generate_anatomical_masks(
        hu_image: np.ndarray,
        mask_types: Sequence[str] = ("lung", "mediastinum", "bone",
                                     "lung_vessel"),
        *, exact_hull: bool = False) -> Dict[str, np.ndarray]:
    """Dispatcher matching generate_anatomical_masks
    (mask_generator.py:313-347): lung always computed first (the others
    depend on it), each requested mask returned as uint8 with hu_image's
    spatial shape. Accepts 2-D slices or 3-D (Z,H,W) volumes."""
    hu_image = np.asarray(hu_image, dtype=np.float32)
    masks: Dict[str, np.ndarray] = {}
    lung = _per_slice(detect_lung_2d, hu_image)
    if "lung" in mask_types:
        masks["lung"] = lung
    if "mediastinum" in mask_types:
        masks["mediastinum"] = _per_slice(
            detect_mediastinum_2d, hu_image, lung, exact_hull=exact_hull)
    if "bone" in mask_types:
        masks["bone"] = _per_slice(
            detect_bone_2d, hu_image, lung, exact_hull=exact_hull)
    if "lung_vessel" in mask_types:
        masks["lung_vessel"] = _per_slice(
            detect_lung_vessels_2d, hu_image, lung)
    return masks
