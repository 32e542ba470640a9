"""Elementary losses: MSE (LSGAN), L1, and the finite-difference gradient
loss (reference modules/trainer.py:22-40, 347-349).

All functions take NHWC fp32 tensors and return scalars; they are pure and
jittable. The adversarial loss is least-squares GAN — MSE against constant
1/0 patch-label maps (trainer.py:459-460, 470, 518, 523)."""
from __future__ import annotations

import jax.numpy as jnp


def mse(pred, target):
    return jnp.mean(jnp.square(pred - target))


def l1(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def lsgan_real(logits):
    """MSE against an all-ones label map."""
    return jnp.mean(jnp.square(logits - 1.0))


def lsgan_fake(logits):
    """MSE against an all-zeros label map."""
    return jnp.mean(jnp.square(logits))


def gradient_loss(pred, target):
    """L1 between finite-difference gradients of pred vs target, summed over
    both spatial axes (GradientLoss, modules/trainer.py:29-40). Axes 1 and 2
    are H and W for both NHW and NHWC inputs."""
    dy_p = jnp.abs(jnp.diff(pred, axis=1))
    dy_t = jnp.abs(jnp.diff(target, axis=1))
    dx_p = jnp.abs(jnp.diff(pred, axis=2))
    dx_t = jnp.abs(jnp.diff(target, axis=2))
    return jnp.mean(jnp.abs(dx_p - dx_t)) + jnp.mean(jnp.abs(dy_p - dy_t))
