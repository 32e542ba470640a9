"""Elementary losses: MSE (LSGAN), L1, and the finite-difference gradient
loss (reference modules/trainer.py:22-40, 347-349).

All functions take NHWC fp32 tensors and return scalars; they are pure and
jittable. The adversarial loss is least-squares GAN — MSE against constant
1/0 patch-label maps (trainer.py:459-460, 470, 518, 523).

Every loss accepts an optional per-sample `sample_weight` (N,) of 1/0
entries. With weights, means are taken over the weighted samples only, so a
batch padded with duplicates (HostLoader's static-shape wrap padding) yields
EXACTLY the loss and gradients of the corresponding ragged batch — matching
the reference's final partial DataLoader batch."""
from __future__ import annotations

import jax.numpy as jnp


def _expand(w, x):
    """(N,) sample weights broadcast to x's rank."""
    return w.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)


def wmean(x, sample_weight=None):
    """Mean of x; with (N,) weights, the mean over the weighted samples'
    elements only (all samples have equal element counts)."""
    if sample_weight is None:
        return jnp.mean(x)
    w = _expand(sample_weight, x)
    per_sample = x.size // x.shape[0]
    return jnp.sum(x * w) / (jnp.sum(sample_weight) * per_sample)


def wstd_bessel(x, sample_weight=None):
    """Bessel-corrected sample std over x's (weighted) elements — the torch
    .std() semantics used by the contrast losses."""
    if sample_weight is None:
        n = x.size
        return jnp.sqrt(jnp.sum(jnp.square(x - jnp.mean(x))) / (n - 1))
    w = _expand(sample_weight, x)
    per_sample = x.size // x.shape[0]
    n = jnp.sum(sample_weight) * per_sample
    mean = jnp.sum(x * w) / n
    return jnp.sqrt(jnp.sum(jnp.square((x - mean)) * w) / (n - 1))


def mse(pred, target, sample_weight=None):
    return wmean(jnp.square(pred - target), sample_weight)


def l1(pred, target, sample_weight=None):
    return wmean(jnp.abs(pred - target), sample_weight)


def lsgan_real(logits, sample_weight=None):
    """MSE against an all-ones label map."""
    return wmean(jnp.square(logits - 1.0), sample_weight)


def lsgan_fake(logits, sample_weight=None):
    """MSE against an all-zeros label map."""
    return wmean(jnp.square(logits), sample_weight)


def gradient_loss(pred, target, sample_weight=None):
    """L1 between finite-difference gradients of pred vs target, summed over
    both spatial axes (GradientLoss, modules/trainer.py:29-40). Axes 1 and 2
    are H and W for both NHW and NHWC inputs."""
    dy_p = jnp.abs(jnp.diff(pred, axis=1))
    dy_t = jnp.abs(jnp.diff(target, axis=1))
    dx_p = jnp.abs(jnp.diff(pred, axis=2))
    dx_t = jnp.abs(jnp.diff(target, axis=2))
    return (wmean(jnp.abs(dx_p - dx_t), sample_weight)
            + wmean(jnp.abs(dy_p - dy_t), sample_weight))
