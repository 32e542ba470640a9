"""3-D CT volume postprocessing (z-continuity smoothing + sharpening).

Jittable rebuild of modules/postprocess.py:6-300. The synthesis path uses
  gaussian_filter1d(z, 0.8)  ->  postprocess_ct_volume('gaussian3d',
  sigma_z=0.7, sigma_xy=0.05, sharpen 1.7/1.2)
(generate.py:254-263). All methods:
  gaussian      z-axis 1-D gaussian (sigma)
  gaussian3d    separable 3-D gaussian (sigma_z, sigma_xy)
  adaptive      strong z smoothing + light xy smoothing (base/max sigma)
  median        z-axis median filter (kernel_size)
  interpolation cubic-spline z resample (host-side scipy; not jittable)
  kalman        1-D kalman filter along z (lax.scan)
Every method preserves voxels >= hu_threshold (bone) from the original and
casts to int16 (postprocess.py:105-109). Unsharp masking blends original
high-frequency content back in (postprocess.py:114-160).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ducosy_tpu.ops.filters import gaussian_filter_1d, gaussian_filter_3d


def unsharp_mask(smoothed, original, *, amount=0.5, radius=1.0):
    """XY-plane unsharp masking mixing smoothed + original high frequencies
    (modules/postprocess.py:114-160); clips to the original's range."""
    smoothed = smoothed.astype(jnp.float32)
    original = original.astype(jnp.float32)
    blurred = gaussian_filter_3d(smoothed, (0.0, radius, radius))
    high = smoothed - blurred
    orig_blurred = gaussian_filter_3d(original, (0.0, radius, radius))
    orig_high = original - orig_blurred
    combined = (1.0 - amount) * high + amount * orig_high
    sharpened = smoothed + combined * amount
    return jnp.clip(sharpened, jnp.min(original), jnp.max(original))


def adaptive_smooth(volume, base_sigma=1.5, max_sigma=3.0):
    """z-gaussian(base_sigma) then (max_sigma, 0.3, 0.3) 3-D gaussian
    (modules/postprocess.py:163-201)."""
    out = gaussian_filter_1d(volume.astype(jnp.float32), base_sigma, axis=0)
    return gaussian_filter_3d(out, (max_sigma, 0.3, 0.3))


def median_filter_z(volume, kernel_size=3):
    """Median along z with edge replication (scipy 'reflect'-nearest
    equivalent for the (k,1,1) footprint, modules/postprocess.py:69)."""
    k = kernel_size
    r = k // 2
    pad = jnp.pad(volume, ((r, r), (0, 0), (0, 0)), mode="symmetric")
    stacked = jnp.stack([pad[i:i + volume.shape[0]] for i in range(k)])
    return jnp.median(stacked, axis=0)


def kalman_filter_z(volume, process_variance=1e-5, measurement_variance=1e-2):
    """Per-voxel 1-D kalman filter along z (modules/postprocess.py:204-272)
    expressed as one lax.scan over slices — O(Z) scans of HxW planes instead
    of the reference's Python loop over every pixel."""
    vol = volume.astype(jnp.float32)

    def step(carry, measurement):
        x_est, p_est = carry
        p_pred = p_est + process_variance
        gain = p_pred / (p_pred + measurement_variance)
        x_new = x_est + gain * (measurement - x_est)
        p_new = (1.0 - gain) * p_pred
        return (x_new, p_new), x_new

    init = (vol[0], jnp.ones_like(vol[0]))
    _, out = jax.lax.scan(step, init, vol)
    return out


def _interpolation_resample_host(volume: np.ndarray) -> np.ndarray:
    """Cubic z-spline resample (modules/postprocess.py:71-88) — host-side
    scipy, vectorized over all pixels at once instead of a per-pixel loop."""
    from scipy.interpolate import CubicSpline
    n = volume.shape[0]
    orig = np.arange(n)
    fine = np.linspace(0, n - 1, n * 2)
    flat = volume.reshape(n, -1).astype(np.float64)
    cs = CubicSpline(orig, flat, axis=0, extrapolate=True)
    out = cs(fine)[::2]
    return out.reshape(volume.shape)


def _postprocess_impl(volume, *, method, enhance_sharpness, hu_threshold,
                      sigma, sigma_z, sigma_xy, base_sigma, max_sigma,
                      kernel_size, process_variance, measurement_variance,
                      sharpen_amount, sharpen_radius):
    original = volume.astype(jnp.float32)
    if method == "gaussian":
        out = gaussian_filter_1d(original, sigma, axis=0)
    elif method == "gaussian3d":
        out = gaussian_filter_3d(original, (sigma_z, sigma_xy, sigma_xy))
    elif method == "adaptive":
        out = adaptive_smooth(original, base_sigma, max_sigma)
    elif method == "median":
        out = median_filter_z(original, kernel_size)
    elif method == "kalman":
        out = kalman_filter_z(original, process_variance,
                              measurement_variance)
    else:  # pragma: no cover — guarded by the wrapper
        raise ValueError(method)
    if enhance_sharpness:
        out = unsharp_mask(out, original, amount=sharpen_amount,
                           radius=sharpen_radius)
    out = jnp.where(original >= hu_threshold, original, out)
    return out.astype(jnp.int16)


# All scalar knobs are static: gaussian kernel *sizes* derive from the sigmas
# (radius = trunc(4*sigma+0.5)), so they must be Python values at trace time.
_postprocess_jit = partial(jax.jit, static_argnames=(
    "method", "enhance_sharpness", "hu_threshold", "sigma", "sigma_z",
    "sigma_xy", "base_sigma", "max_sigma", "kernel_size", "process_variance",
    "measurement_variance", "sharpen_amount", "sharpen_radius"))(
        _postprocess_impl)


def postprocess_ct_volume(volume, method: str = "gaussian3d",
                          enhance_sharpness: bool = True,
                          hu_threshold: float = 750.0, **kwargs):
    """Drop-in equivalent of postprocess_ct_volume
    (modules/postprocess.py:6-111). Accepts numpy or jax (Z,H,W) volumes,
    returns int16 numpy."""
    valid = {"gaussian", "gaussian3d", "adaptive", "median", "interpolation",
             "kalman"}
    if method not in valid:
        raise ValueError(
            f"Unknown method: {method}. Choose from {sorted(valid)}")
    vol = np.asarray(volume, dtype=np.float32)
    if method == "interpolation":
        original = vol
        out = _interpolation_resample_host(vol)
        if enhance_sharpness:
            out = np.asarray(unsharp_mask(
                jnp.asarray(out), jnp.asarray(original),
                amount=kwargs.get("sharpen_amount", 0.5),
                radius=kwargs.get("sharpen_radius", 1.0)))
        out = np.where(original >= hu_threshold, original, out)
        return out.astype(np.int16)

    out = _postprocess_jit(
        jnp.asarray(vol),
        method=method,
        enhance_sharpness=enhance_sharpness,
        hu_threshold=hu_threshold,
        sigma=kwargs.get("sigma", 1.0),
        sigma_z=kwargs.get("sigma_z", 2.0),
        sigma_xy=kwargs.get("sigma_xy", 0.5),
        base_sigma=kwargs.get("base_sigma", 1.5),
        max_sigma=kwargs.get("max_sigma", 3.0),
        kernel_size=int(kwargs.get("kernel_size", 3)),
        process_variance=kwargs.get("process_variance", 1e-5),
        measurement_variance=kwargs.get("measurement_variance", 1e-2),
        sharpen_amount=kwargs.get("sharpen_amount", 0.5),
        sharpen_radius=kwargs.get("sharpen_radius", 1.0),
    )
    return np.asarray(out)


def apply_diffmap(volume, diff_volume, threshold: float = 8.0):
    """Add a thresholded HU difference map (modules/postprocess.py:275-300,
    used by the dormant nmodel path).

    The uint8 cast is deliberate reference parity (postprocess.py:297):
    deltas above 255 HU wrap around and fractions truncate toward zero.
    The nmodel recipe's diff maps are small enhancement deltas, but be
    aware the cast is a wrap, not a clip, if repurposing this."""
    volume = np.asarray(volume)
    diff = np.asarray(diff_volume).copy()
    diff[diff < threshold] = 0
    return volume + diff.astype(np.uint8)
