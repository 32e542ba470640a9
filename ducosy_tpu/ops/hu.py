"""Hounsfield-unit transforms as jittable pure functions.

Reproduces the reference's preprocessing semantics
(modules/preprocess.py:6-112) without pydicom/torch: every function here maps
arrays -> arrays, works under jit/vmap, and is dtype-polymorphic. DICOM tag
handling lives in ducosy_tpu.dicom; these functions only see pixel arrays plus
scalar slope/intercept.
"""
from __future__ import annotations

import jax.numpy as jnp

SQUEEZE_THRESHOLD = 0.9  # normalized value where soft squeezing kicks in
SQUEEZE_SIGMA = 50.0     # sigmoid softness (k = 10/sigma)


def soft_squeeze(image, hu_min, hu_max, sigma=SQUEEZE_SIGMA):
    """Nonlinear [-1,1] normalization preserving near-ceiling detail.

    Linear (x-min)/(max-min) normalization; values above 0.9 are compressed
    through a sigmoid so e.g. vessels near 250 HU stay distinguishable from
    bone clipped at 250 HU. Matches modules/preprocess.py:6-40.
    """
    normalized = (image - hu_min) / (hu_max - hu_min)
    k = 10.0 / sigma
    soft = 1.0 / (1.0 + jnp.exp(-k * (normalized - SQUEEZE_THRESHOLD)))
    result = jnp.where(
        normalized < SQUEEZE_THRESHOLD,
        normalized,
        SQUEEZE_THRESHOLD + (1.0 - SQUEEZE_THRESHOLD) * soft,
    )
    return 2.0 * result - 1.0


def stored_to_hu(stored, slope, intercept):
    """Raw stored pixel values -> HU (modules/preprocess.py:45-46)."""
    return stored.astype(jnp.float32) * slope + intercept


def hu_transform(stored, slope, intercept, hu_min, hu_max,
                 use_soft_squeezing=True):
    """Stored pixels -> clipped, normalized [-1,1] model input.

    Matches apply_hu_transform (modules/preprocess.py:43-55): HU rescale,
    clip to [hu_min, hu_max], then soft-squeeze or linear normalization.
    """
    image = stored_to_hu(stored, slope, intercept)
    image = jnp.clip(image, hu_min, hu_max)
    if use_soft_squeezing:
        return soft_squeeze(image, hu_min, hu_max)
    return 2.0 * (image - hu_min) / (hu_max - hu_min) - 1.0


def normalize_window(hu, hu_min, hu_max):
    """HU clipped + linearly mapped to [-1,1] — the inference-time transform
    (no soft squeezing), modules/preprocess.py:79-84."""
    clipped = jnp.clip(hu, hu_min, hu_max)
    return 2.0 * (clipped - hu_min) / (hu_max - hu_min) - 1.0


def denormalize_to_hu(x, hu_min, hu_max):
    """[-1,1] model output -> HU (modules/preprocess.py:99)."""
    return (x + 1.0) / 2.0 * (hu_max - hu_min) + hu_min


def hu_to_stored(hu, slope, intercept):
    """HU -> raw stored pixel value: (HU - intercept) / slope
    (modules/preprocess.py:106). Caller casts to the original DICOM dtype."""
    return (hu - intercept) / slope


def apply_windowing(x, hu_min, hu_max, window_center, window_width):
    """[-1,1] tensor -> display window [0,1] for validation image grids.

    Matches apply_windowing (modules/preprocess.py:58-65): denormalize to HU,
    clamp to WC +- WW/2, scale by 1/WW.
    """
    hu = denormalize_to_hu(x, hu_min, hu_max)
    lo = window_center - window_width / 2.0
    hi = window_center + window_width / 2.0
    return (jnp.clip(hu, lo, hi) - lo) / window_width


def preprocess_dual(stored, slope, intercept, st_range, lung_range):
    """One stored-pixel slice -> (soft-tissue, lung) normalized inputs.

    The inference-time preprocess (modules/preprocess.py:68-90): both HU
    windows, linear normalization, NO soft squeezing.
    """
    hu = stored_to_hu(stored, slope, intercept)
    st = normalize_window(hu, st_range.hu_min, st_range.hu_max)
    lung = normalize_window(hu, lung_range.hu_min, lung_range.hu_max)
    return st, lung
