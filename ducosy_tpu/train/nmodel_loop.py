"""nmodel (3-D U-Net difference-map) training loop.

The reference ships the nmodel config/dataset/inference but no committed
trainer (the config documents its recipe: L1 loss, Adam 5e-5, gradient
accumulation 8, clip 1.0, mixed precision — modules/nmodel/config.py:26-38).
This implements that recipe TPU-natively: one jitted step carrying an
accumulation buffer, bf16 compute with fp32 BatchNorm statistics, optax
clipping, latest/best checkpoints (config.py:43-47 scheme).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ducosy_tpu.models.nmodel_data import CTDiffDataset, NModelConfig
from ducosy_tpu.models.unet3d import UNet3D, UNet3DLight
from ducosy_tpu.train import checkpoint as ckpt
from ducosy_tpu.utils.logging import MetricsLogger


def build_nmodel(cfg: NModelConfig, dtype=jnp.float32):
    cls = UNet3D if cfg.model_type == "standard" else UNet3DLight
    return cls(n_channels=cfg.in_channels, n_classes=cfg.out_channels,
               base_channels=cfg.base_channels, dtype=dtype)


def make_nmodel_step(model, cfg: NModelConfig):
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_value),
        optax.adam(cfg.learning_rate),
    )

    def loss_fn(params, batch_stats, batch):
        pred, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["vue"], train=True, mutable=["batch_stats"])
        loss = cfg.l1_weight * jnp.mean(jnp.abs(pred - batch["diff"]))
        return loss, mutated["batch_stats"]

    @jax.jit
    def step(params, batch_stats, opt_state, batch):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    @jax.jit
    def eval_step(params, batch_stats, batch):
        pred = model.apply({"params": params, "batch_stats": batch_stats},
                           batch["vue"], train=False)
        return jnp.mean(jnp.abs(pred - batch["diff"]))

    return tx, step, eval_step


def train_nmodel(cfg: NModelConfig, *, max_epochs: Optional[int] = None,
                 max_steps: Optional[int] = None,
                 dtype=jnp.float32) -> Dict[str, float]:
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    cfg.save(os.path.join(cfg.output_dir, "nmodel_config.json"))

    model = build_nmodel(cfg, dtype=dtype)
    pd, ph, pw = cfg.patch_size
    x0 = jnp.zeros((1, pd, ph, pw, cfg.in_channels), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx, step, eval_step = make_nmodel_step(model, cfg)
    opt_state = tx.init(params)

    train_ds = CTDiffDataset(cfg.data_dir, "train", val_size=cfg.val_size,
                             use_patches=cfg.use_patches,
                             patch_size=cfg.patch_size,
                             patches_per_volume=cfg.patches_per_volume)
    val_ds = CTDiffDataset(cfg.data_dir, "val", val_size=cfg.val_size,
                           use_patches=cfg.use_patches,
                           patch_size=cfg.patch_size,
                           patches_per_volume=cfg.patches_per_volume)

    logger = MetricsLogger(os.path.join(cfg.output_dir, "nmodel_metrics.jsonl"))
    best_val = float("inf")
    epochs = min(cfg.num_epochs, max_epochs or cfg.num_epochs)
    val_loss = float("nan")
    for epoch in range(epochs):
        order = np.random.default_rng(epoch).permutation(len(train_ds))
        losses = []
        for i in range(0, len(order), cfg.batch_size):
            if max_steps and len(losses) >= max_steps:
                break
            idx = order[i:i + cfg.batch_size]
            if len(idx) < cfg.batch_size:
                break
            samples = [train_ds[int(j)] for j in idx]
            batch = {k: jnp.asarray(np.stack([s[k] for s in samples]))
                     for k in samples[0]}
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, batch)
            losses.append(float(loss))

        vals = []
        for j in range(min(len(val_ds), max_steps or len(val_ds))):
            s = val_ds[j]
            batch = {k: jnp.asarray(v[None]) for k, v in s.items()}
            vals.append(float(eval_step(params, batch_stats, batch)))
        val_loss = float(np.mean(vals)) if vals else float("nan")
        logger.log({"epoch": epoch + 1,
                    "train_l1": float(np.mean(losses)) if losses else None,
                    "val_l1": val_loss}, force_print=True)

        ckpt.save_params_npz(
            os.path.join(cfg.checkpoint_dir, "nmodel_latest.npz"),
            {"params": params, "batch_stats": batch_stats})
        if np.isfinite(val_loss) and val_loss < best_val:
            best_val = val_loss
            ckpt.save_params_npz(
                os.path.join(cfg.checkpoint_dir, "nmodel_best.npz"),
                {"params": params, "batch_stats": batch_stats})
    logger.close()
    return {"val_l1": val_loss, "best_val_l1": best_val,
            "epochs_run": epochs}
