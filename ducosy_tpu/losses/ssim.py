"""SSIM re-implementation compatible with pytorch_msssim.

The reference trains with `pytorch_msssim.SSIM(data_range=1.0,
size_average=True, channel=1)` on [-1,1] cycle reconstructions
(modules/trainer.py:10,351,485), used as `1 - SSIM`. pytorch_msssim's
convention: separable 11-tap gaussian window (sigma 1.5), VALID convolution
(no padding), K1=0.01 / K2=0.03, biased statistics. This module reproduces
that bit-for-bit modulo float-accumulation order so loss magnitudes match the
torch run.

Also provides ms_ssim (5-scale, pytorch_msssim weights) for the evaluation
suite (calculate.py:274-291 uses torchmetrics MS-SSIM with the same
defaults).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

_K1 = 0.01
_K2 = 0.03
MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _filter_valid(x, win):
    """Separable VALID gaussian filtering of NHWC over H then W."""
    c = x.shape[-1]
    kh = jnp.asarray(win).reshape(-1, 1, 1, 1)
    kh = jnp.broadcast_to(kh, (win.shape[0], 1, 1, c)).astype(x.dtype)
    x = lax.conv_general_dilated(
        x, kh, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c, precision="highest")
    kw = jnp.asarray(win).reshape(1, -1, 1, 1)
    kw = jnp.broadcast_to(kw, (1, win.shape[0], 1, c)).astype(x.dtype)
    return lax.conv_general_dilated(
        x, kw, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c, precision="highest")


def _ssim_maps(x, y, win, data_range):
    c1 = (_K1 * data_range) ** 2
    c2 = (_K2 * data_range) ** 2
    mu1 = _filter_valid(x, win)
    mu2 = _filter_valid(y, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter_valid(x * x, win) - mu1_sq
    sigma2_sq = _filter_valid(y * y, win) - mu2_sq
    sigma12 = _filter_valid(x * y, win) - mu12
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu12 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map, cs_map


def ssim(x, y, *, data_range: float = 1.0, win_size: int = 11,
         win_sigma: float = 1.5):
    """Mean SSIM of NHWC tensors (pytorch_msssim-compatible scalar)."""
    win = _gaussian_window(win_size, win_sigma)
    ssim_map, _ = _ssim_maps(x.astype(jnp.float32), y.astype(jnp.float32),
                             win, data_range)
    return jnp.mean(ssim_map)


def ssim_loss(x, y, **kw):
    """1 - SSIM, the training loss form (trainer.py:485)."""
    return 1.0 - ssim(x, y, **kw)


def _avg_pool_2x(x):
    """2x2 stride-2 average pooling with implicit floor-crop (matches
    F.avg_pool2d with padding computed from odd shapes in pytorch_msssim)."""
    n, h, w, c = x.shape
    x = x[:, : h - h % 2, : w - w % 2, :]
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))


def ms_ssim(x, y, *, data_range: float = 1.0, win_size: int = 11,
            win_sigma: float = 1.5, weights=MS_WEIGHTS):
    """Multi-scale SSIM (torchmetrics/pytorch_msssim defaults; evaluation
    metric at calculate.py:274-291). Requires spatial dims > (win_size-1)*2^4."""
    win = _gaussian_window(win_size, win_sigma)
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    levels = len(weights)
    mcs = []
    value = None
    for i in range(levels):
        ssim_map, cs_map = _ssim_maps(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(jnp.maximum(jnp.mean(cs_map), 0.0))
            x = _avg_pool_2x(x)
            y = _avg_pool_2x(y)
        else:
            value = jnp.maximum(jnp.mean(ssim_map), 0.0)
    result = value ** weights[-1]
    for w, cs in zip(weights[:-1], mcs):
        result = result * cs ** w
    return result
