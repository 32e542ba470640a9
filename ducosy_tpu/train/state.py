"""Train state: 4 networks, 3 optimizers, schedule bookkeeping.

Mirrors the reference's optimizer topology (modules/trainer.py:360-367): one
Adam over BOTH generators jointly (lr 2e-4, betas (0.5, 0.999)) and one Adam
per discriminator, each with the per-epoch linear-decay LambdaLR. The learning
rate is an injected hyperparameter so the loop can set it once per epoch
(exact LambdaLR semantics) without rebuilding optimizer state.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ducosy_tpu.config import ModelConfig, RangeConfig, TrainConfig
from ducosy_tpu.models import Discriminator, Generator

Params = Dict[str, Any]


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=cfg.lr, b1=cfg.adam_b1, b2=cfg.adam_b2)


class CycleGANState(struct.PyTreeNode):
    """All mutable training state as one pytree (orbax-checkpointable)."""

    params_g_a2b: Params
    params_g_b2a: Params
    params_d_a: Params
    params_d_b: Params
    opt_g: optax.OptState
    opt_d_a: optax.OptState
    opt_d_b: optax.OptState
    epoch: jnp.ndarray          # scalar int32
    best_val_loss: jnp.ndarray  # scalar float32
    best_epoch: jnp.ndarray     # scalar int32

    def set_learning_rate(self, lr: float) -> "CycleGANState":
        """Per-epoch LambdaLR step (trainer.py:534-536)."""
        def _set(opt_state):
            return optax.tree_utils.tree_set(opt_state, learning_rate=lr)
        return self.replace(opt_g=_set(self.opt_g),
                            opt_d_a=_set(self.opt_d_a),
                            opt_d_b=_set(self.opt_d_b))


def build_models(range_cfg: RangeConfig, model_cfg: ModelConfig = ModelConfig(),
                 dtype=jnp.float32):
    """The four networks for one HU range (trainer.py:319-330). Generators
    take image+mask channels; discriminators see the 1-channel image only."""
    gen = Generator(
        input_channels=range_cfg.input_channels,
        num_residual_blocks=model_cfg.num_residual_blocks,
        base_channels=model_cfg.base_channels,
        use_cbam=range_cfg.use_cbam,
        dtype=dtype,
        fused_norm=model_cfg.fused_norm,
    )
    disc = Discriminator(
        input_channels=1,
        base_channels=model_cfg.disc_base_channels,
        dtype=dtype,
    )
    return gen, disc


def create_state(rng: jax.Array, cfg: TrainConfig, range_cfg: RangeConfig,
                 model_cfg: ModelConfig = ModelConfig(),
                 img_size: int | None = None, dtype=None
                 ) -> tuple[CycleGANState, Generator, Discriminator]:
    if dtype is None:  # follow the config (bf16 compute by default on TPU)
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
            else jnp.float32
    img = img_size or cfg.img_size
    gen, disc = build_models(range_cfg, model_cfg, dtype=dtype)
    kg1, kg2, kd1, kd2 = jax.random.split(rng, 4)
    xg = jnp.zeros((1, img, img, range_cfg.input_channels), jnp.float32)
    xd = jnp.zeros((1, img, img, 1), jnp.float32)
    p_g_a2b = gen.init(kg1, xg)["params"]
    p_g_b2a = gen.init(kg2, xg)["params"]
    p_d_a = disc.init(kd1, xd)["params"]
    p_d_b = disc.init(kd2, xd)["params"]

    tx = make_optimizer(cfg)
    state = CycleGANState(
        params_g_a2b=p_g_a2b,
        params_g_b2a=p_g_b2a,
        params_d_a=p_d_a,
        params_d_b=p_d_b,
        opt_g=tx.init({"a2b": p_g_a2b, "b2a": p_g_b2a}),
        opt_d_a=tx.init(p_d_a),
        opt_d_b=tx.init(p_d_b),
        epoch=jnp.asarray(0, jnp.int32),
        best_val_loss=jnp.asarray(jnp.inf, jnp.float32),
        best_epoch=jnp.asarray(-1, jnp.int32),
    )
    return state, gen, disc
