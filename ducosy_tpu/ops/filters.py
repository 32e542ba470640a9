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

import jax.numpy as jnp
import numpy as np
from jax import lax


# ---------------------------------------------------------------------------
# TPU-native small-filter machinery.
#
# The loss suite filters 1-channel images. Lowering those as NHWC depthwise
# convs is pathological on TPU: XLA tiles the size-1 channel dim onto the
# 128-wide lane axis, padding every (N, 512, 512, 1) fp32 tensor 128x (8 MB
# -> 1 GB — observed in the 512^2 train-step HBM OOM). Instead every small
# separable filter is expressed as a banded Toeplitz MATMUL applied along H
# and W of SQUEEZED (N, H, W) tensors: W rides the lane dimension at full
# width and the filter runs on the MXU.
# ---------------------------------------------------------------------------
from functools import lru_cache


@lru_cache(maxsize=128)
def _toeplitz_zero(n: int, kernel: tuple, stride: int = 1) -> np.ndarray:
    """(n_out, n) correlation operator with ZERO boundary padding of k//2
    (torch conv2d / AvgPool2d count_include_pad semantics)."""
    kern = np.asarray(kernel, np.float64)
    r = len(kern) // 2
    n_out = n // stride if stride > 1 else n
    m = np.zeros((n_out, n), np.float64)
    for i in range(n_out):
        base = i * stride
        for t, kv in enumerate(kern):
            j = base - r + t
            if 0 <= j < n:
                m[i, j] += kv
    return m.astype(np.float32)


@lru_cache(maxsize=128)
def _toeplitz_valid(n: int, kernel: tuple) -> np.ndarray:
    """(n - k + 1, n) VALID correlation operator (pytorch_msssim SSIM)."""
    kern = np.asarray(kernel, np.float64)
    k = len(kern)
    m = np.zeros((n - k + 1, n), np.float64)
    for i in range(n - k + 1):
        m[i, i:i + k] = kern
    return m.astype(np.float32)


def apply_h(x_nhw, m) -> jnp.ndarray:
    """out[n, i, w] = sum_j m[i, j] x[n, j, w]."""
    return jnp.einsum("ij,njw->niw", jnp.asarray(m), x_nhw,
                      precision="highest")


def apply_w(x_nhw, m) -> jnp.ndarray:
    """out[n, h, i] = sum_j m[i, j] x[n, h, j]."""
    return jnp.einsum("ij,nhj->nhi", jnp.asarray(m), x_nhw,
                      precision="highest")


def _squeeze_c(x):
    """NHWC with C==1 -> (N, H, W) + a restore fn; NHW passes through."""
    if x.ndim == 4:
        assert x.shape[-1] == 1, "loss filters expect single-channel input"
        return x[..., 0], lambda y: y[..., None]
    return x, lambda y: y


def box_blur(x, kernel_size: int):
    """AvgPool2d(kernel_size, stride=1, padding=k//2), count-include-pad —
    ContrastAttentionLoss's blur (modules/trainer.py:60). Accepts NHWC (C=1)
    or NHW."""
    k = kernel_size
    x3, restore = _squeeze_c(x)
    kern = tuple(np.full(k, 1.0 / k))
    mh = _toeplitz_zero(x3.shape[1], kern)
    mw = _toeplitz_zero(x3.shape[2], kern)
    return restore(apply_w(apply_h(x3.astype(jnp.float32), mh), mw))


def avg_pool(x, kernel_size: int):
    """AvgPool2d(kernel_size, stride=kernel_size)
    (ContrastRegionLoss, modules/trainer.py:102)."""
    k = kernel_size
    x3, restore = _squeeze_c(x)
    n, h, w = x3.shape
    mh = np.zeros((h // k, h), np.float32)
    for i in range(h // k):
        mh[i, i * k:(i + 1) * k] = 1.0 / k
    mw = np.zeros((w // k, w), np.float32)
    for i in range(w // k):
        mw[i, i * k:(i + 1) * k] = 1.0 / k
    return restore(apply_w(apply_h(x3.astype(jnp.float32), mh), mw))


SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)
SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=np.float32)


def sobel_edges(x, eps: float = 1e-6):
    """Sobel edge magnitude sqrt(gx^2 + gy^2 + eps) with zero pad 1
    (ContrastEdgeLoss.get_edges, modules/trainer.py:150-155), as separable
    banded matmuls: gx = smooth_H x diff_W, gy = diff_H x smooth_W."""
    x3, restore = _squeeze_c(x)
    x3 = x3.astype(jnp.float32)
    h, w = x3.shape[1], x3.shape[2]
    smooth = (1.0, 2.0, 1.0)
    diff = (-1.0, 0.0, 1.0)
    gx = apply_w(apply_h(x3, _toeplitz_zero(h, smooth)),
                 _toeplitz_zero(w, diff))
    gy = apply_w(apply_h(x3, _toeplitz_zero(h, diff)),
                 _toeplitz_zero(w, smooth))
    return restore(jnp.sqrt(gx * gx + gy * gy + eps))


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
