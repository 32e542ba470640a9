"""Complementary dual-HU-range synthesis.

Rebuild of generate.py's synthesis() (:137-299) plus the additive
synthesis_test() variant (:302-477):

  composite_slice / composite_volume — start from raw NCCT stored pixels,
  overwrite pixels whose RAW HU falls in the soft-tissue range with the
  soft-tissue model output, then those in the lung range with the lung output
  (lung wins the -150 HU boundary overlap, matching the reference's
  assignment order at generate.py:236-237).

  additive_composite — the v3 test path: add per-model HU enhancement deltas
  (> 5 HU, only where raw HU > -400) onto the NCCT (generate.py:390-415).

  synthesize_volume — compositing + the volume postprocess chain
  (z gaussian sigma 0.8, then gaussian3d sigma_z 0.7 / sigma_xy 0.05 with
  unsharp 1.7/1.2 — generate.py:254-263), returning the final int16 volume.

Everything here is numpy/jax array -> array; DICOM writeback tag surgery
lives in the CLI (cli/generate.py) next to the file layout it mirrors.
"""
from __future__ import annotations

import numpy as np

from ducosy_tpu.config import LUNG, SOFT_TISSUE, InferConfig, RangeConfig
from ducosy_tpu.infer.postprocess import postprocess_ct_volume
from ducosy_tpu.ops.filters import gaussian_filter_1d

import jax.numpy as jnp


def composite_slice(raw_stored: np.ndarray, raw_hu: np.ndarray,
                    st_stored: np.ndarray, lung_stored: np.ndarray,
                    st_range: RangeConfig = SOFT_TISSUE,
                    lung_range: RangeConfig = LUNG) -> np.ndarray:
    """HU-range-gated overwrite compositing for one slice
    (generate.py:218-237; the reference composites integer pixel arrays,
    so np.where's dtype promotion is exact there — and it keeps this
    function consistent with composite_volume when callers pass float
    model outputs against an int raw array, where in-place fancy
    assignment would silently truncate instead)."""
    st_mask = (raw_hu >= st_range.hu_min) & (raw_hu <= st_range.hu_max)
    lung_mask = (raw_hu >= lung_range.hu_min) & (raw_hu <= lung_range.hu_max)
    merged = np.where(st_mask, st_stored, raw_stored)
    return np.where(lung_mask, lung_stored, merged)


def composite_volume(raw_stored, raw_hu, st_stored, lung_stored,
                     st_range: RangeConfig = SOFT_TISSUE,
                     lung_range: RangeConfig = LUNG) -> np.ndarray:
    """Vectorized compositing over a (Z, H, W) volume."""
    st_mask = (raw_hu >= st_range.hu_min) & (raw_hu <= st_range.hu_max)
    lung_mask = (raw_hu >= lung_range.hu_min) & (raw_hu <= lung_range.hu_max)
    merged = np.where(st_mask, st_stored, raw_stored)
    return np.where(lung_mask, lung_stored, merged)


def additive_composite(raw_stored, raw_hu, st_hu, lung_hu, slope: float,
                       *, enhancement_threshold: float = 5.0,
                       valid_hu_floor: float = -400.0) -> np.ndarray:
    """The synthesis_test additive path (generate.py:377-415): add HU
    enhancement deltas above `enhancement_threshold` (converted back to
    stored units via 1/slope) where raw HU > valid_hu_floor."""
    merged = np.asarray(raw_stored, np.float32).copy()
    valid = raw_hu > valid_hu_floor
    for model_hu in (st_hu, lung_hu):
        enhancement = model_hu - raw_hu
        mask = (enhancement > enhancement_threshold) & valid
        merged[mask] += enhancement[mask] / slope
    return merged


def synthesize_volume(merged_volume: np.ndarray,
                      cfg: InferConfig = InferConfig()) -> np.ndarray:
    """Volume postprocess chain after compositing (generate.py:254-263):
    z gaussian (sigma 0.8) then gaussian3d + unsharp, int16 out."""
    vol = np.asarray(merged_volume, np.float32)
    vol = np.asarray(gaussian_filter_1d(jnp.asarray(vol), cfg.pre_z_sigma,
                                        axis=0))
    return postprocess_ct_volume(
        vol, method="gaussian3d",
        sigma_z=cfg.sigma_z, sigma_xy=cfg.sigma_xy,
        enhance_sharpness=True,
        sharpen_amount=cfg.sharpen_amount, sharpen_radius=cfg.sharpen_radius)
