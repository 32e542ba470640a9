"""Slice-pair dataset: DICOM decode + HU transform + mask channels.

Host-side equivalent of the reference DicomDataset.__getitem__
(modules/dataset.py:109-181): per sample it
  1. decodes the NCCT/CECT pair and rescales to HU,
  2. soft-squeeze-normalizes both to [-1,1] for the configured HU range,
  3. builds the conditioning mask channels, either auto-generated from the
     raw NCCT HU image (the training default, argmanager.py:131,148) or
     loaded from precomputed mask DICOM folders (binarized >0,
     modules/dataset.py:16-27),
  4. resizes everything to img_size (bilinear+antialias for images, nearest
     for masks, matching torchvision Resize / F.interpolate at
     trainer.py:420 and dataset.py:146-150).

Returns NHWC numpy arrays; batching/prefetch live in loader.py.
"""
from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ducosy_tpu.config import RangeConfig
from ducosy_tpu.dicom import dcmread
from ducosy_tpu.masks import generate_anatomical_masks
from ducosy_tpu.data.pairing import pair_patient_slices


def _resize_bilinear_aa(img: np.ndarray, size: int) -> np.ndarray:
    """Antialiased bilinear resize on host (matches jax.image / torchvision
    within interpolation tolerance)."""
    if img.shape == (size, size):
        return img
    import jax
    import jax.numpy as jnp
    out = jax.image.resize(jnp.asarray(img), (size, size), method="linear",
                           antialias=True)
    return np.asarray(out)


def _resize_nearest(img: np.ndarray, size: int) -> np.ndarray:
    if img.shape == (size, size):
        return img
    ys = (np.arange(size) * img.shape[0] / size).astype(np.int64)
    xs = (np.arange(size) * img.shape[1] / size).astype(np.int64)
    return img[np.ix_(ys, xs)]


def _soft_squeeze_np(image, hu_min, hu_max, sigma=50.0):
    normalized = (image - hu_min) / (hu_max - hu_min)
    k = 10.0 / sigma
    soft = 1.0 / (1.0 + np.exp(-k * (normalized - 0.9)))
    out = np.where(normalized < 0.9, normalized, 0.9 + 0.1 * soft)
    return 2.0 * out - 1.0


def _load_hu(path: str) -> np.ndarray:
    """DICOM path -> raw HU array, through the native C parser when built
    (zero-copy pixel view; falls back to the Python codec)."""
    from ducosy_tpu.dicom.native import read_slice_any

    info = read_slice_any(path)
    return (info.pixels.astype(np.float32) * info.rescale_slope
            + info.rescale_intercept)


def _hu_transform_np(raw_hu, hu_min, hu_max, use_soft_squeezing):
    img = np.clip(raw_hu, hu_min, hu_max)
    if use_soft_squeezing:
        img = _soft_squeeze_np(img, hu_min, hu_max)
    else:
        img = 2.0 * (img - hu_min) / (hu_max - hu_min) - 1.0
    return img.astype(np.float32)


class SlicePairDataset:
    """Indexable dataset of (NCCT, CECT, masks) training samples."""

    def __init__(self, patient_dirs: Sequence[str], range_cfg: RangeConfig,
                 *, img_size: int = 512, ncct_folder: str = "POST VUE",
                 cect_folder: str = "POST STD"):
        self.range_cfg = range_cfg
        self.img_size = img_size
        self.pairs: List[Tuple[str, str, Dict[str, str]]] = []
        for pdir in patient_dirs:
            for ncct, cect in pair_patient_slices(pdir, ncct_folder,
                                                  cect_folder):
                mask_paths: Dict[str, str] = {}
                if (range_cfg.use_masks and not range_cfg.auto_generate_masks):
                    for folder in range_cfg.mask_folders:
                        candidate = os.path.join(
                            pdir, folder, os.path.basename(ncct))
                        if os.path.exists(candidate):
                            mask_paths[folder] = candidate
                self.pairs.append((ncct, cect, mask_paths))

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        ncct_path, cect_path, mask_paths = self.pairs[index]
        cfg = self.range_cfg
        raw_hu = _load_hu(ncct_path)
        a = _hu_transform_np(raw_hu, cfg.hu_min, cfg.hu_max,
                             cfg.use_soft_squeezing)
        b = _hu_transform_np(_load_hu(cect_path), cfg.hu_min, cfg.hu_max,
                             cfg.use_soft_squeezing)
        a = _resize_bilinear_aa(a, self.img_size)[..., None]
        b = _resize_bilinear_aa(b, self.img_size)[..., None]
        out = {"a": a.astype(np.float32), "b": b.astype(np.float32)}

        if cfg.use_masks and (cfg.mask_types or cfg.mask_folders):
            channels: List[np.ndarray] = []
            if cfg.auto_generate_masks:
                masks = generate_anatomical_masks(raw_hu, cfg.mask_types)
                for name in cfg.mask_types:
                    m = masks.get(name)
                    if m is None:
                        m = np.zeros_like(raw_hu, np.uint8)
                    channels.append(
                        _resize_nearest(m.astype(np.float32), self.img_size))
            else:
                for folder in cfg.mask_folders:
                    path = mask_paths.get(folder)
                    m = None
                    if path is not None:
                        try:
                            m = (dcmread(path).pixel_array > 0).astype(
                                np.float32)
                        except Exception:
                            m = None
                    if m is None:
                        m = np.zeros((self.img_size, self.img_size),
                                     np.float32)
                    channels.append(_resize_nearest(m, self.img_size))
            if channels:
                out["masks"] = np.stack(channels, axis=-1).astype(np.float32)
        return out
