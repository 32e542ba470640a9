"""Jitted CycleGAN G/D update steps.

Replicates the per-batch ordering of the reference hot loop
(modules/trainer.py:447-525) inside ONE compiled step:
  1. forward fakes/identities/reconstructions from the CURRENT generators
  2. generator update from the 9-term loss (D params held constant)
  3. D_A and D_B updates against stop_gradient'ed fakes — the same fakes the
     G step saw (the reference computes them before optimizer_G.step()).

The whole step is a single jit so XLA fuses the 6 generator forwards + 2
discriminator forwards + 3 backward passes, keeps everything HBM-resident,
and inserts ICI all-reduces for the data-parallel gradient mean when batch
inputs are sharded over the mesh.

Design note — masks: generators consume [image | masks] channel concat
(trainer.py:451-457); identity and cycle losses compare image channels only;
discriminators see single-channel images (trainer.py:470,518,523).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax

from ducosy_tpu.config import LossConfig, TrainConfig
from ducosy_tpu.losses.suite import (
    discriminator_loss,
    generator_loss,
    validation_generator_loss,
)
from ducosy_tpu.train.state import CycleGANState, make_optimizer

Batch = Dict[str, jnp.ndarray]  # {"a": NHW1, "b": NHW1, "masks": NHWM?}


def _with_masks(img: jnp.ndarray, batch: Batch) -> jnp.ndarray:
    masks = batch.get("masks")
    if masks is None:
        return img
    return jnp.concatenate([img, masks], axis=-1)


def _forward_all(gen_apply, params_a2b, params_b2a, batch: Batch, *,
                 batched: bool = False):
    """The six generator forwards of one step (trainer.py:464-480).

    batched=True folds the six into FOUR by concatenating the two inputs
    that share weights along the batch axis (fake+identity per direction;
    the two reconstructions depend on the fakes and stay separate). Exact:
    InstanceNorm statistics and CBAM gates are per-sample, so a 2N-batch
    forward computes the identical function — only the dispatch count and
    MXU tile occupancy change. Default is decided by hardware A/B
    (scripts/ab_batched_step.py)."""
    real_a, real_b = batch["a"], batch["b"]
    in_a = _with_masks(real_a, batch)
    in_b = _with_masks(real_b, batch)
    if batched:
        n = in_a.shape[0]
        out_ab = gen_apply(params_a2b, jnp.concatenate([in_a, in_b], axis=0))
        fake_b, id_b = out_ab[:n], out_ab[n:]
        out_ba = gen_apply(params_b2a, jnp.concatenate([in_b, in_a], axis=0))
        fake_a, id_a = out_ba[:n], out_ba[n:]
    else:
        fake_b = gen_apply(params_a2b, in_a)
        fake_a = gen_apply(params_b2a, in_b)
        id_a = gen_apply(params_b2a, in_a)
        id_b = gen_apply(params_a2b, in_b)
    rec_a = gen_apply(params_b2a, _with_masks(fake_b, batch))
    rec_b = gen_apply(params_a2b, _with_masks(fake_a, batch))
    return fake_a, fake_b, id_a, id_b, rec_a, rec_b


def make_train_step(gen, disc, cfg: TrainConfig,
                    loss_cfg: LossConfig = LossConfig(), *,
                    donate: bool = True, remat: bool = True,
                    n_real: int | None = None,
                    gen_forward: str = "module",
                    batched_forwards: bool = False):
    """Build the jitted (state, batch) -> (state, metrics) step.

    When the batch carries a per-sample "weight" vector (a wrap-padded
    final batch from HostLoader), pass the static count of real samples as
    `n_real` and build a dedicated step for that batch shape: losses then
    reproduce the ragged batch's values and gradients exactly (the padded
    duplicates contribute nothing).

    remat wraps each generator forward in jax.checkpoint so the G step's six
    512^2 forwards keep only their boundary activations live and recompute
    internals in the backward pass — without it the step needs ~18 GB of
    activation HBM at batch 8 and OOMs a 16 GB chip."""
    tx = make_optimizer(cfg)
    if gen_forward == "packed":
        # the space-to-depth forward (models/fused.py) — same params, same
        # function, MXU-shaped convs; gradients are exact (tested)
        from ducosy_tpu.models.fused import generator_apply_packed
        # encoder_fused=False: the inference-only encoder-norm fusion OOMs
        # HBM under grad at batch 8 x 512^2 (models/fused.py docstring)
        gen_apply = lambda p, x: generator_apply_packed(
            p, x, num_residual_blocks=gen.num_residual_blocks,
            use_cbam=gen.use_cbam, dtype=gen.dtype, encoder_fused=False)
    else:
        gen_apply = lambda p, x: gen.apply({"params": p}, x)
    disc_apply = lambda p, x: disc.apply({"params": p}, x)
    if remat:
        # whole-forward checkpoint bounds the cross-forward peak (six
        # generator forwards per step); saved residuals are the forward
        # inputs — store them in the compute dtype (the generator casts
        # internally anyway), halving the boundary footprint
        _ck = jax.checkpoint(gen_apply)
        _dt = getattr(gen, "dtype", jnp.bfloat16)
        gen_apply = lambda p, x: _ck(p, x.astype(_dt))

    def _loss_terms(real_a, real_b, fake_a, fake_b, rec_a, rec_b, id_a,
                    id_b, d_a_logits, d_b_logits, sample_weight):
        return generator_loss(
            real_a=real_a, real_b=real_b, fake_a=fake_a, fake_b=fake_b,
            rec_a=rec_a, rec_b=rec_b, id_a=id_a, id_b=id_b,
            d_a_fake_logits=d_a_logits, d_b_fake_logits=d_b_logits,
            cfg=cfg, loss_cfg=loss_cfg,
            sample_weight=sample_weight, n_real=n_real)

    loss_terms = _loss_terms
    if remat:
        # Also checkpoint the 9-term loss graph: its ~30 full-resolution
        # fp32 intermediates (blur/sobel/ssim maps) otherwise stay live
        # across the whole backward. Granularity lessons (measured): the
        # whole-forward checkpoint above is the right unit — nesting a
        # per-block remat inside it multiplies recomputation (8.6 s/step
        # vs ~1.2), and block-remat alone leaves the six forwards'
        # encoder/decoder activations live simultaneously (39 GB).
        loss_terms = jax.checkpoint(_loss_terms)

    def g_loss_fn(g_params, state: CycleGANState, batch: Batch):
        fake_a, fake_b, id_a, id_b, rec_a, rec_b = _forward_all(
            gen_apply, g_params["a2b"], g_params["b2a"], batch,
            batched=batched_forwards)
        terms = loss_terms(
            batch["a"], batch["b"], fake_a, fake_b, rec_a, rec_b,
            id_a, id_b,
            disc_apply(state.params_d_a, fake_a),
            disc_apply(state.params_d_b, fake_b),
            batch.get("weight"))
        return terms.total, (terms, fake_a, fake_b)

    def d_loss_fn(d_params, real, fake, sample_weight):
        fake = jax.lax.stop_gradient(fake)
        if batched_forwards:
            # one 2N-batch PatchGAN forward (IN stats are per-sample: exact)
            n = real.shape[0]
            logits = disc_apply(d_params, jnp.concatenate([real, fake],
                                                          axis=0))
            return discriminator_loss(logits[:n], logits[n:], sample_weight)
        return discriminator_loss(
            disc_apply(d_params, real),
            disc_apply(d_params, fake),
            sample_weight)

    def step(state: CycleGANState, batch: Batch):
        # --- generator update (trainer.py:462-514) ---
        g_params = {"a2b": state.params_g_a2b, "b2a": state.params_g_b2a}
        (_, (terms, fake_a, fake_b)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_params, state, batch)
        g_updates, opt_g = tx.update(g_grads, state.opt_g, g_params)
        g_params = optax.apply_updates(g_params, g_updates)

        # --- discriminator updates (trainer.py:516-525) ---
        d_a_loss, d_a_grads = jax.value_and_grad(d_loss_fn)(
            state.params_d_a, batch["a"], fake_a, batch.get("weight"))
        d_a_updates, opt_d_a = tx.update(d_a_grads, state.opt_d_a,
                                         state.params_d_a)
        params_d_a = optax.apply_updates(state.params_d_a, d_a_updates)

        d_b_loss, d_b_grads = jax.value_and_grad(d_loss_fn)(
            state.params_d_b, batch["b"], fake_b, batch.get("weight"))
        d_b_updates, opt_d_b = tx.update(d_b_grads, state.opt_d_b,
                                         state.params_d_b)
        params_d_b = optax.apply_updates(state.params_d_b, d_b_updates)

        new_state = state.replace(
            params_g_a2b=g_params["a2b"], params_g_b2a=g_params["b2a"],
            params_d_a=params_d_a, params_d_b=params_d_b,
            opt_g=opt_g, opt_d_a=opt_d_a, opt_d_b=opt_d_b)
        metrics = {
            "loss_G": terms.total,
            "loss_D": d_a_loss + d_b_loss,
            "loss_GAN": terms.gan,
            "loss_cycle": terms.cycle,
            "loss_id": terms.identity,
            "loss_ssim": terms.ssim,
            "contrast": (terms.contrast_attention + terms.contrast_region
                         + terms.contrast_edge),
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_val_step(gen, disc, cfg: TrainConfig):
    """Validation loss: GAN + cycle + identity only (trainer.py:209-255)."""
    gen_apply = lambda p, x: gen.apply({"params": p}, x)
    disc_apply = lambda p, x: disc.apply({"params": p}, x)

    def step(state: CycleGANState, batch: Batch):
        fake_a, fake_b, id_a, id_b, rec_a, rec_b = _forward_all(
            gen_apply, state.params_g_a2b, state.params_g_b2a, batch)
        loss = validation_generator_loss(
            real_a=batch["a"], real_b=batch["b"],
            fake_a=fake_a, fake_b=fake_b,
            rec_a=rec_a, rec_b=rec_b, id_a=id_a, id_b=id_b,
            d_a_fake_logits=disc_apply(state.params_d_a, fake_a),
            d_b_fake_logits=disc_apply(state.params_d_b, fake_b),
            cfg=cfg, sample_weight=batch.get("weight"))
        return loss, fake_b

    return jax.jit(step)
