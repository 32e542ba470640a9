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

from ducosy_tpu.ops.filters import avg_pool, box_blur, sobel_edges


def contrast_attention_loss(pred, target, source, *, sigma=0.15,
                            min_weight=1.0, max_weight=3.0, blur_kernel=7):
    """Weighted L1 on blurred images, upweighting regions where contrast
    (|blur(B) - blur(A)|) is large."""
    target_b = box_blur(target, blur_kernel)
    source_b = box_blur(source, blur_kernel)
    diff = jnp.abs(target_b - source_b)
    weight = min_weight + (max_weight - min_weight) * (
        1.0 - jnp.exp(-diff / sigma))
    pred_b = box_blur(pred, blur_kernel)
    return jnp.mean(weight * jnp.abs(pred_b - target_b))


def contrast_region_loss(pred, target, source, *, threshold=0.15, weight=1.5,
                         pool=8):
    """8x8-patch masked L1 over enhancement regions plus a mean/std
    distribution-matching term, scaled by `weight`."""
    pred_p = avg_pool(pred, pool)
    target_p = avg_pool(target, pool)
    source_p = avg_pool(source, pool)
    enhancement = target_p - source_p
    mask = 1.0 / (1.0 + jnp.exp(-5.0 * (enhancement - threshold)))
    region = jnp.mean(mask * jnp.abs(pred_p - target_p))
    # global brightness-distribution similarity (torch .std() is the
    # Bessel-corrected sample std)
    def _std(x):
        n = x.size
        return jnp.sqrt(jnp.sum(jnp.square(x - jnp.mean(x))) / (n - 1))
    dist = (jnp.abs(jnp.mean(pred) - jnp.mean(target))
            + jnp.abs(_std(pred) - _std(target)))
    return weight * (region + 0.5 * dist)


def _topk_mean(x_flat, frac: float):
    """Mean of the top `frac` fraction of values.

    Exact form sorts the flattened array (XLA sort, fine for <=4M elements).
    Equivalent to torch.topk(...).values.mean() up to tie ordering
    (trainer.py:179-181)."""
    k = max(int(x_flat.size * frac), 1)
    top = jnp.sort(x_flat)[-k:]
    return jnp.mean(top)


def contrast_edge_loss(pred, target, source=None, *, topk_frac=0.1):
    """Positionless edge-sharpness matching: |Δmean| + |Δstd| of Sobel edge
    magnitudes plus |Δ top-10% edge mean|."""
    pred_e = sobel_edges(pred)
    target_e = sobel_edges(target)

    def _std(x):
        n = x.size
        return jnp.sqrt(jnp.sum(jnp.square(x - jnp.mean(x))) / (n - 1))

    stats = (jnp.abs(jnp.mean(pred_e) - jnp.mean(target_e))
             + jnp.abs(_std(pred_e) - _std(target_e)))
    topk = jnp.abs(_topk_mean(pred_e.ravel(), topk_frac)
                   - _topk_mean(target_e.ravel(), topk_frac))
    return stats + topk
