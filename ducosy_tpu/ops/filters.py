"""Jittable image/volume filters used by losses, synthesis and postprocess.

These replace the reference's torch.nn.functional / scipy.ndimage calls with
XLA-friendly separable convolutions on NHWC tensors:
  - box_blur: AvgPool2d(k, stride=1, pad=k//2) used by ContrastAttentionLoss
    (modules/trainer.py:60)
  - avg_pool: AvgPool2d(k, stride=k) used by ContrastRegionLoss (:102)
  - sobel_edges: Sobel magnitude used by ContrastEdgeLoss (:144-155)
  - gaussian_filter_1d/3d: scipy.ndimage.gaussian_filter(1d) equivalents used
    by synthesis volume postprocess (generate.py:254-263,
    modules/postprocess.py:53-60), matching scipy's kernel radius/truncation.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _depthwise_conv_nhwc(x, kernel_hw, pad_h, pad_w, stride=1,
                         pad_mode="constant"):
    """Depthwise 2-D conv of NHWC x with a single 2-D kernel shared across
    channels. Padding applied explicitly so reflect/replicate modes work."""
    n, h, w, c = x.shape
    kh, kw = kernel_hw.shape
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)),
                    mode=pad_mode)
    kernel = jnp.broadcast_to(kernel_hw[:, :, None, None], (kh, kw, 1, c))
    return lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision="highest",
    )


def box_blur(x, kernel_size: int):
    """AvgPool2d(kernel_size, stride=1, padding=k//2) on NHWC.

    Matches torch's count-include-pad average pooling (the default), which is
    what ContrastAttentionLoss's blur uses (modules/trainer.py:60)."""
    k = kernel_size
    kern = jnp.full((k, k), 1.0 / (k * k), dtype=jnp.float32)
    return _depthwise_conv_nhwc(x, kern, k // 2, k // 2)


def avg_pool(x, kernel_size: int):
    """AvgPool2d(kernel_size, stride=kernel_size) on NHWC
    (ContrastRegionLoss, modules/trainer.py:102)."""
    k = kernel_size
    kern = jnp.full((k, k), 1.0 / (k * k), dtype=jnp.float32)
    return _depthwise_conv_nhwc(x, kern, 0, 0, stride=k)


SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)
SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=np.float32)


def sobel_edges(x, eps: float = 1e-6):
    """Sobel edge magnitude sqrt(gx^2 + gy^2 + eps) on NHWC with zero pad 1
    (ContrastEdgeLoss.get_edges, modules/trainer.py:150-155)."""
    gx = _depthwise_conv_nhwc(x, jnp.asarray(SOBEL_X), 1, 1)
    gy = _depthwise_conv_nhwc(x, jnp.asarray(SOBEL_Y), 1, 1)
    return jnp.sqrt(gx * gx + gy * gy + eps)


def _gaussian_kernel_1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage-compatible 1-D gaussian kernel (radius = truncate*sigma,
    normalized). sigma == 0 -> identity kernel."""
    if sigma <= 0:
        return np.ones((1,), dtype=np.float32)
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _pad_axis_symmetric(x, axis, r):
    """scipy.ndimage 'reflect' boundary (= numpy 'symmetric': edge value
    duplicated), applied iteratively so pads wider than the axis tile the
    reflection like scipy does."""
    while r > 0:
        step = min(r, x.shape[axis])
        pad = [(0, 0)] * x.ndim
        pad[axis] = (step, step)
        x = jnp.pad(x, pad, mode="symmetric")
        r -= step
    return x


def _conv_along_axis(vol, kernel_1d, axis, pad_mode="symmetric"):
    """Correlate a (Z,H,W) volume with a 1-D kernel along `axis`, using
    scipy.ndimage's default 'reflect' boundary mode (numpy 'symmetric')."""
    k = kernel_1d.shape[0]
    if k == 1:
        return vol * kernel_1d[0]
    r = k // 2
    x = _pad_axis_symmetric(vol, axis, r)
    # Move target axis last, flatten the rest to a batch, 1-D conv, restore.
    x = jnp.moveaxis(x, axis, -1)
    lead = x.shape[:-1]
    x = x.reshape((-1, 1, x.shape[-1]))  # NCW
    kern = kernel_1d.reshape((1, 1, k)).astype(x.dtype)  # OIW
    y = lax.conv_general_dilated(
        x, kern, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"), precision="highest")
    y = y.reshape(lead + (y.shape[-1],))
    return jnp.moveaxis(y, -1, axis)


from functools import lru_cache


@lru_cache(maxsize=64)
def _gaussian_matrix(n: int, sigma: float, truncate: float = 4.0):
    """Dense (n, n) operator equal to scipy gaussian_filter1d with 'reflect'
    boundary: column j is the filter response to a unit impulse at j, so
    M @ x == gaussian_filter1d(x). Folding the kernel AND the boundary
    reflection into one matrix turns the filter into a single MXU matmul —
    the TPU-native shape for small separable filters (a 1-channel NCW conv
    would run on the VPU gather path instead and crawl)."""
    kern = _gaussian_kernel_1d(sigma, truncate).astype(np.float64)
    r = len(kern) // 2
    eye = np.eye(n, dtype=np.float64)
    # symmetric (scipy 'reflect') padding applied iteratively for r > n
    pad = eye
    rem = r
    while rem > 0:
        step = min(rem, pad.shape[0])
        pad = np.pad(pad, ((step, step), (0, 0)), mode="symmetric")
        rem -= step
    # valid correlation of each column with the kernel. Cached as NUMPY —
    # a jnp constant created inside one jit trace must not leak into others.
    m = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        m[i] = kern @ pad[i:i + len(kern)]
    return m.astype(np.float32)


def _apply_axis_matrix(vol, m, axis):
    """out[... i ...] = sum_j m[i, j] vol[... j ...] via dot_general."""
    vol32 = vol.astype(jnp.float32)
    out = jnp.tensordot(jnp.asarray(m), jnp.moveaxis(vol32, axis, 0),
                        axes=([1], [0]), precision="highest")
    return jnp.moveaxis(out, 0, axis).astype(vol.dtype)


def gaussian_filter_1d(vol, sigma: float, axis: int = 0,
                       truncate: float = 4.0):
    """scipy.ndimage.gaussian_filter1d equivalent (reflect boundary), as an
    MXU matmul with the boundary folded into the operator."""
    if sigma <= 0:
        return vol
    m = _gaussian_matrix(int(vol.shape[axis]), float(sigma), truncate)
    return _apply_axis_matrix(vol, m, axis)


def gaussian_filter_3d(vol, sigmas, truncate: float = 4.0):
    """scipy.ndimage.gaussian_filter equivalent on a (Z,H,W) volume with
    per-axis sigmas, applied separably as three matmuls."""
    out = vol
    for axis, sigma in enumerate(sigmas):
        if sigma and sigma > 0:
            m = _gaussian_matrix(int(vol.shape[axis]), float(sigma), truncate)
            out = _apply_axis_matrix(out, m, axis)
    return out


def gaussian_blur_hw(x_nhwc, sigma: float, truncate: float = 4.0):
    """Gaussian blur over H and W of an NHWC tensor (used by SSIM & unsharp)."""
    kern = jnp.asarray(_gaussian_kernel_1d(sigma, truncate))
    out = _conv_along_axis(x_nhwc, kern, 1)
    out = _conv_along_axis(out, kern, 2)
    return out
