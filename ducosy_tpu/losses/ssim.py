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

_K1 = 0.01
_K2 = 0.03
MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _to_nhw(x):
    """Fold any channel dim into the batch: (N,H,W,C) -> (N*C, H, W)."""
    if x.ndim == 3:
        return x, x.shape[0:1]
    n, h, w, c = x.shape
    return jnp.moveaxis(x, -1, 1).reshape(n * c, h, w), (n, c)


def _filter_valid(x_nhw, win):
    """Separable VALID gaussian filtering over H then W of (N, H, W).

    Implemented as banded Toeplitz matmuls — 1-channel NHWC depthwise convs
    force a 128x-padded lane layout on TPU (see ops/filters.py); matmuls keep
    W on the lane axis and use the MXU."""
    from ducosy_tpu.ops.filters import _toeplitz_valid, apply_h, apply_w

    h, w = x_nhw.shape[1], x_nhw.shape[2]
    kern = tuple(np.asarray(win, np.float64))
    return apply_w(apply_h(x_nhw, _toeplitz_valid(h, kern)),
                   _toeplitz_valid(w, kern))


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
         win_sigma: float = 1.5, sample_weight=None):
    """Mean SSIM of NHWC or NHW tensors (pytorch_msssim-compatible scalar).
    Channel dims fold into the batch — no 1-channel NHWC tensors on TPU.
    Optional (N,) sample_weight restricts the mean to the weighted samples
    (exact ragged-batch semantics for padded batches)."""
    win = _gaussian_window(win_size, win_sigma)
    x3, shape = _to_nhw(x)
    y3, _ = _to_nhw(y)
    ssim_map, _ = _ssim_maps(x3.astype(jnp.float32), y3.astype(jnp.float32),
                             win, data_range)
    if sample_weight is None:
        return jnp.mean(ssim_map)
    from ducosy_tpu.losses.basic import wmean
    w = sample_weight
    if len(shape) == 2:  # channels were folded into the batch axis
        w = jnp.repeat(w, shape[1])
    return wmean(ssim_map, w)


def ssim_loss(x, y, **kw):
    """1 - SSIM, the training loss form (trainer.py:485)."""
    return 1.0 - ssim(x, y, **kw)


def _avg_pool_2x(x):
    """2x2 stride-2 average pooling of (N, H, W) with floor-crop (matches
    F.avg_pool2d with padding computed from odd shapes in pytorch_msssim)."""
    n, h, w = x.shape
    x = x[:, : h - h % 2, : w - w % 2]
    x = x.reshape(n, h // 2, 2, w // 2, 2)
    return x.mean(axis=(2, 4))


def ms_ssim(x, y, *, data_range: float = 1.0, win_size: int = 11,
            win_sigma: float = 1.5, weights=MS_WEIGHTS,
            return_per_sample: bool = False):
    """Multi-scale SSIM (torchmetrics/pytorch_msssim defaults; evaluation
    metric at calculate.py:274-291). Requires spatial dims > (win_size-1)*2^4.

    With return_per_sample=True, additionally returns a (N,) array of
    per-sample MS-SSIM values (cs/ssim means over each sample's own maps) —
    the honest per-slice record the reference fakes by replicating the batch
    value (calculate.py:288); the scalar stays the batch-mean computation so
    the volume value keeps matching torchmetrics."""
    win = _gaussian_window(win_size, win_sigma)
    x, _ = _to_nhw(x)
    y, _ = _to_nhw(y)
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    levels = len(weights)
    mcs, mcs_ps = [], []
    value = value_ps = None
    for i in range(levels):
        ssim_map, cs_map = _ssim_maps(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(jnp.maximum(jnp.mean(cs_map), 0.0))
            if return_per_sample:
                mcs_ps.append(jnp.maximum(cs_map.mean(axis=(1, 2)), 0.0))
            x = _avg_pool_2x(x)
            y = _avg_pool_2x(y)
        else:
            value = jnp.maximum(jnp.mean(ssim_map), 0.0)
            if return_per_sample:
                value_ps = jnp.maximum(ssim_map.mean(axis=(1, 2)), 0.0)
    result = value ** weights[-1]
    for w, cs in zip(weights[:-1], mcs):
        result = result * cs ** w
    if not return_per_sample:
        return result
    result_ps = value_ps ** weights[-1]
    for w, cs in zip(weights[:-1], mcs_ps):
        result_ps = result_ps * cs ** w
    return result, result_ps
