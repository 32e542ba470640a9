"""Contrast-enhancement-focused losses.

These three losses drive the NCCT->CECT direction and are designed for
temporally-misaligned pairs (statistics/patch-based instead of pixelwise):
  - contrast_attention_loss: ContrastAttentionLoss (modules/trainer.py:43-86)
  - contrast_region_loss:    ContrastRegionLoss    (modules/trainer.py:89-130)
  - contrast_edge_loss:      ContrastEdgeLoss      (modules/trainer.py:133-184)

Instantiated in training with sigma=0.15, weights [1,3], blur 7 / thr=0.15,
weight 1.5 / defaults (trainer.py:356-358). All inputs NHWC fp32 in [-1,1].
"""
from __future__ import annotations

import jax.numpy as jnp

from ducosy_tpu.losses.basic import wmean, wstd_bessel
from ducosy_tpu.ops.filters import avg_pool, box_blur, sobel_edges


def contrast_attention_loss(pred, target, source, *, sigma=0.15,
                            min_weight=1.0, max_weight=3.0, blur_kernel=7,
                            sample_weight=None):
    """Weighted L1 on blurred images, upweighting regions where contrast
    (|blur(B) - blur(A)|) is large."""
    target_b = box_blur(target, blur_kernel)
    source_b = box_blur(source, blur_kernel)
    diff = jnp.abs(target_b - source_b)
    weight = min_weight + (max_weight - min_weight) * (
        1.0 - jnp.exp(-diff / sigma))
    pred_b = box_blur(pred, blur_kernel)
    return wmean(weight * jnp.abs(pred_b - target_b), sample_weight)


def contrast_region_loss(pred, target, source, *, threshold=0.15, weight=1.5,
                         pool=8, sample_weight=None):
    """8x8-patch masked L1 over enhancement regions plus a mean/std
    distribution-matching term, scaled by `weight`."""
    pred_p = avg_pool(pred, pool)
    target_p = avg_pool(target, pool)
    source_p = avg_pool(source, pool)
    enhancement = target_p - source_p
    mask = 1.0 / (1.0 + jnp.exp(-5.0 * (enhancement - threshold)))
    region = wmean(mask * jnp.abs(pred_p - target_p), sample_weight)
    # global brightness-distribution similarity (torch .std() is the
    # Bessel-corrected sample std); batch statistics, so padded samples are
    # excluded by the weighted mean/std rather than per-sample averaging
    dist = (jnp.abs(wmean(pred, sample_weight) - wmean(target, sample_weight))
            + jnp.abs(wstd_bessel(pred, sample_weight)
                      - wstd_bessel(target, sample_weight)))
    return weight * (region + 0.5 * dist)


def _topk_mean(x_flat, k: int):
    """Mean of the top k values.

    Exact form sorts the flattened array (XLA sort, fine for <=4M elements).
    Equivalent to torch.topk(...).values.mean() up to tie ordering
    (trainer.py:179-181)."""
    top = jnp.sort(x_flat)[-k:]
    return jnp.mean(top)


def contrast_edge_loss(pred, target, source=None, *, topk_frac=0.1,
                       sample_weight=None, n_real=None):
    """Positionless edge-sharpness matching: |Δmean| + |Δstd| of Sobel edge
    magnitudes plus |Δ top-10% edge mean|.

    With `sample_weight`, `n_real` (the static count of real samples) is
    required: padded samples' edge magnitudes are pushed to -inf so the
    top-k set — whose size is k = topk_frac * n_real * H * W — is exactly
    the ragged batch's."""
    pred_e = sobel_edges(pred)
    target_e = sobel_edges(target)

    stats = (jnp.abs(wmean(pred_e, sample_weight)
                     - wmean(target_e, sample_weight))
             + jnp.abs(wstd_bessel(pred_e, sample_weight)
                       - wstd_bessel(target_e, sample_weight)))
    per_sample = pred_e.size // pred_e.shape[0]
    if sample_weight is None:
        k = max(int(pred_e.size * topk_frac), 1)
        pred_flat, target_flat = pred_e.ravel(), target_e.ravel()
    else:
        if n_real is None:
            raise ValueError("sample_weight requires a static n_real for "
                             "the top-k edge term")
        k = max(int(n_real * per_sample * topk_frac), 1)
        w = sample_weight.reshape((-1,) + (1,) * (pred_e.ndim - 1))
        neg = jnp.asarray(-jnp.inf, pred_e.dtype)
        pred_flat = jnp.where(w > 0, pred_e, neg).ravel()
        target_flat = jnp.where(w > 0, target_e, neg).ravel()
    topk = jnp.abs(_topk_mean(pred_flat, k) - _topk_mean(target_flat, k))
    return stats + topk
