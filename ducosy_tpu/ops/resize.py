"""Image resizing matching torchvision's antialiased bilinear Resize.

The reference resizes every slice to img_size for the model and back to the
original Rows x Columns afterwards (generate.py:94-100, trainer transform
modules/trainer.py:420). jax.image.resize with method='linear' and
antialias=True uses the same triangle-kernel antialiasing, so outputs agree
with torchvision to within interpolation tolerance.
"""
from __future__ import annotations

import jax


def resize_hw(x: jax.Array, out_h: int, out_w: int, *, antialias: bool = True,
              method: str = "linear") -> jax.Array:
    """Resize the trailing two spatial dims of (..., H, W) or NHWC arrays.

    For NHWC input pass arrays shaped (..., H, W, C) with `channel_last=True`
    via resize_nhwc instead; this helper treats the LAST TWO dims as (H, W).
    """
    shape = list(x.shape)
    shape[-2:] = [out_h, out_w]
    return jax.image.resize(x, tuple(shape), method=method, antialias=antialias)


def resize_nhwc(x: jax.Array, out_h: int, out_w: int, *, antialias: bool = True,
                method: str = "linear") -> jax.Array:
    """Resize NHWC (or HWC) arrays on the H, W axes."""
    shape = list(x.shape)
    shape[-3:-1] = [out_h, out_w]
    return jax.image.resize(x, tuple(shape), method=method, antialias=antialias)


def resize_nearest_hw(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest-neighbour resize of the last two dims (mask resizing,
    modules/dataset.py:146-150)."""
    shape = list(x.shape)
    shape[-2:] = [out_h, out_w]
    return jax.image.resize(x, tuple(shape), method="nearest")
