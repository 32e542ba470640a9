"""The full CycleGAN loss suite, composed exactly as the reference G/D steps
(modules/trainer.py:462-525).

generator_loss computes the 9-term objective:
  GAN + lambda_cyc*cycle + lambda_id*identity + lambda_grad*grad_cycle
  + lambda_grad_id*grad_id + lambda_ssim*(1-SSIM)
  + lambda_ca*contrast_attention + lambda_cr*contrast_region
  + lambda_ce*contrast_edge
where the contrast terms look only at the NCCT->CECT direction
(fake_B vs real_B vs real_A, trainer.py:487-491).

discriminator_loss is the LSGAN real/fake average (trainer.py:518, 523).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ducosy_tpu.config import LossConfig, TrainConfig
from ducosy_tpu.losses import basic, contrast, ssim as ssim_mod


class LossTerms(NamedTuple):
    total: jnp.ndarray
    gan: jnp.ndarray
    cycle: jnp.ndarray
    identity: jnp.ndarray
    grad_cycle: jnp.ndarray
    grad_id: jnp.ndarray
    ssim: jnp.ndarray
    contrast_attention: jnp.ndarray
    contrast_region: jnp.ndarray
    contrast_edge: jnp.ndarray


def _squeeze(x):
    """NHW1 -> NHW. Single-channel NHWC tensors force a 128x-padded lane
    layout on TPU (the channel dim lands on the lane axis); every loss here
    therefore computes on squeezed (N, H, W)."""
    return x[..., 0] if x.ndim == 4 and x.shape[-1] == 1 else x


def generator_loss(
    *,
    real_a, real_b,            # NHWC image channels only (no masks)
    fake_a, fake_b,            # G_B2A(real_b), G_A2B(real_a)
    rec_a, rec_b,              # G_B2A(fake_b), G_A2B(fake_a)
    id_a, id_b,                # G_B2A(real_a), G_A2B(real_b)
    d_a_fake_logits, d_b_fake_logits,  # D_A(fake_a), D_B(fake_b)
    cfg: TrainConfig,
    loss_cfg: LossConfig = LossConfig(),
    sample_weight=None,        # (N,) 1/0; exact ragged-batch semantics
    n_real: int | None = None,  # static real-sample count (edge top-k)
) -> LossTerms:
    sw = sample_weight
    real_a, real_b = _squeeze(real_a), _squeeze(real_b)
    fake_a, fake_b = _squeeze(fake_a), _squeeze(fake_b)
    rec_a, rec_b = _squeeze(rec_a), _squeeze(rec_b)
    id_a, id_b = _squeeze(id_a), _squeeze(id_b)
    loss_id = (basic.l1(id_a, real_a, sw) + basic.l1(id_b, real_b, sw)) / 2
    loss_gan = (basic.lsgan_real(d_b_fake_logits, sw)
                + basic.lsgan_real(d_a_fake_logits, sw)) / 2
    loss_cycle = (basic.l1(rec_a, real_a, sw)
                  + basic.l1(rec_b, real_b, sw)) / 2
    loss_grad_cycle = (basic.gradient_loss(rec_a, real_a, sw)
                       + basic.gradient_loss(rec_b, real_b, sw)) / 2
    loss_grad_id = (basic.gradient_loss(id_a, real_a, sw)
                    + basic.gradient_loss(id_b, real_b, sw)) / 2
    loss_ssim = 1.0 - (ssim_mod.ssim(rec_a, real_a,
                                     win_size=loss_cfg.ssim_win_size,
                                     win_sigma=loss_cfg.ssim_win_sigma,
                                     sample_weight=sw)
                       + ssim_mod.ssim(rec_b, real_b,
                                       win_size=loss_cfg.ssim_win_size,
                                       win_sigma=loss_cfg.ssim_win_sigma,
                                       sample_weight=sw)) / 2
    loss_ca = contrast.contrast_attention_loss(
        fake_b, real_b, real_a,
        sigma=loss_cfg.contrast_attention_sigma,
        min_weight=loss_cfg.contrast_attention_min_weight,
        max_weight=loss_cfg.contrast_attention_max_weight,
        blur_kernel=loss_cfg.contrast_attention_blur_kernel,
        sample_weight=sw)
    loss_cr = contrast.contrast_region_loss(
        fake_b, real_b, real_a,
        threshold=loss_cfg.contrast_region_threshold,
        weight=loss_cfg.contrast_region_weight,
        pool=loss_cfg.contrast_region_pool,
        sample_weight=sw)
    loss_ce = contrast.contrast_edge_loss(
        fake_b, real_b, topk_frac=loss_cfg.edge_topk_frac,
        sample_weight=sw, n_real=n_real)

    total = (loss_gan
             + cfg.lambda_cyc * loss_cycle
             + cfg.lambda_id * loss_id
             + cfg.lambda_grad * loss_grad_cycle
             + cfg.lambda_grad_id * loss_grad_id
             + cfg.lambda_ssim * loss_ssim
             + cfg.lambda_contrast_attention * loss_ca
             + cfg.lambda_contrast_region * loss_cr
             + cfg.lambda_contrast_edge * loss_ce)
    return LossTerms(total, loss_gan, loss_cycle, loss_id, loss_grad_cycle,
                     loss_grad_id, loss_ssim, loss_ca, loss_cr, loss_ce)


def discriminator_loss(real_logits, fake_logits, sample_weight=None):
    """(MSE(D(real), 1) + MSE(D(fake.detach()), 0)) / 2
    (trainer.py:518, 523). Detaching is the caller's job (lax.stop_gradient
    or simply not differentiating w.r.t. generator params)."""
    return (basic.lsgan_real(real_logits, sample_weight)
            + basic.lsgan_fake(fake_logits, sample_weight)) / 2


def validation_generator_loss(*, real_a, real_b, fake_a, fake_b, rec_a, rec_b,
                              id_a, id_b, d_a_fake_logits, d_b_fake_logits,
                              cfg: TrainConfig, sample_weight=None):
    """Validation objective: GAN + lambda_cyc*cycle + lambda_id*identity only
    (validate_and_save_images, trainer.py:243-247)."""
    sw = sample_weight
    real_a, real_b = _squeeze(real_a), _squeeze(real_b)
    rec_a, rec_b = _squeeze(rec_a), _squeeze(rec_b)
    id_a, id_b = _squeeze(id_a), _squeeze(id_b)
    loss_id = (basic.l1(id_a, real_a, sw) + basic.l1(id_b, real_b, sw)) / 2
    loss_gan = (basic.lsgan_real(d_b_fake_logits, sw)
                + basic.lsgan_real(d_a_fake_logits, sw)) / 2
    loss_cycle = (basic.l1(rec_a, real_a, sw)
                  + basic.l1(rec_b, real_b, sw)) / 2
    return loss_gan + cfg.lambda_cyc * loss_cycle + cfg.lambda_id * loss_id
