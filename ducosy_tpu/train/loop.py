"""The full training loop for one HU-range CycleGAN.

TPU-native rebuild of train_cycle_gan (modules/trainer.py:297-597):
  - models/optimizers/losses identical in topology and hyperparameters,
  - checkpoint resume (Orbax full-state) with best/last/epoch snapshots,
  - patient-level seeded 80/20 split (trainer.py:422-427),
  - async host loader feeding mesh-sharded device batches,
  - per-epoch LambdaLR-equivalent lr injection (trainer.py:534-536),
  - per-epoch validation (GAN+cycle+identity objective, single pass) and
    [A | fake_B | B] windowed image grid (trainer.py:543-547),
  - JSONL metrics stream (step + epoch records).

Differences by design: data parallelism is jit-with-shardings over a 1-D
mesh (ICI all-reduce) instead of nn.DataParallel; batches are padded to
static shapes; bf16 compute with fp32 params by default.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ducosy_tpu.config import (
    LossConfig,
    ModelConfig,
    RANGES,
    RangeConfig,
    TrainConfig,
)
from ducosy_tpu.data import HostLoader, SlicePairDataset, list_patient_dirs, train_val_split
from ducosy_tpu.ops import hu as hu_ops
from ducosy_tpu.parallel import (
    data_mesh,
    global_shard_batch,
    mesh_process_count,
    process_row_slice,
    replicate,
)
from ducosy_tpu.train import checkpoint as ckpt
from ducosy_tpu.train.schedule import lr_for_epoch
from ducosy_tpu.train.state import create_state
from ducosy_tpu.train.step import make_train_step, make_val_step
from ducosy_tpu.utils.imaging import save_comparison_grid
from ducosy_tpu.utils.logging import MetricsLogger, StepTimer


def _is_oom_error(e: BaseException) -> bool:
    """HBM exhaustion classifier for the remat="auto" fallback. XLA has no
    typed OOM exception — it surfaces as a runtime error whose status text
    carries RESOURCE_EXHAUSTED — so require BOTH the runtime-error type
    (when the running jaxlib exposes one) and the status text, keeping an
    unrelated error that merely mentions memory from triggering a silent
    retry."""
    types: tuple = ()
    try:
        from jax.errors import JaxRuntimeError
        types += (JaxRuntimeError,)
    except ImportError:  # pragma: no cover - older jax
        pass
    try:
        from jaxlib.xla_extension import XlaRuntimeError
        types += (XlaRuntimeError,)
    except ImportError:  # pragma: no cover - jaxlib layout changed
        pass
    msg = str(e)
    texty = "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower()
    return texty and (not types or isinstance(e, types))


def _to_device_batch(mesh, batch: Dict[str, np.ndarray]):
    # single-process: device_put with batch sharding; multi-host: assemble
    # the global array from this process's rows (the per-host input feed)
    return global_shard_batch(mesh, batch)


def _local_rows(arr) -> np.ndarray:
    """Host-local rows of a (possibly globally sharded) batch array."""
    if hasattr(arr, "addressable_shards"):
        shards = sorted(arr.addressable_shards, key=lambda s: s.index[0].start
                        if s.index and s.index[0].start else 0)
        return np.concatenate([np.asarray(s.data) for s in shards])
    return np.asarray(arr)


def train_cycle_gan(cfg: TrainConfig, target_range: str,
                    model_cfg: ModelConfig = ModelConfig(),
                    loss_cfg: LossConfig = LossConfig(), *,
                    range_cfg: Optional[RangeConfig] = None,
                    mesh=None,
                    max_epochs: Optional[int] = None,
                    max_steps_per_epoch: Optional[int] = None,
                    num_devices: Optional[int] = None) -> Dict[str, float]:
    """Train one HU-range CycleGAN; returns summary stats (for tests/CLI)."""
    if target_range not in RANGES and range_cfg is None:
        raise ValueError(
            "target_range must be either 'soft_tissue' or 'lung'")
    range_cfg = range_cfg or RANGES[target_range]

    training_dir = os.path.join(cfg.training_dir, target_range)
    images_dir = os.path.join(training_dir, "images")
    saved_models_dir = os.path.join(training_dir, "saved_models")
    os.makedirs(images_dir, exist_ok=True)
    os.makedirs(saved_models_dir, exist_ok=True)

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    state, gen, disc = create_state(
        jax.random.PRNGKey(cfg.init_seed), cfg, range_cfg, model_cfg,
        dtype=dtype)

    start_epoch = 0
    best = ckpt.BestTracker(saved_models_dir)
    if cfg.resume:
        # a reference torch checkpoint (checkpoint.pth.tar, the all-in-one
        # dict of trainer.py:580-596) migrates a mid-run training onto TPU
        # with optimizer/scheduler/best state intact; an Orbax directory
        # resumes one of OUR runs. Both accept a bare name under
        # saved_models/ or a full path.
        cand = cfg.resume if os.path.isabs(cfg.resume) or os.sep in \
            cfg.resume else os.path.join(saved_models_dir, cfg.resume)
        if not os.path.exists(cand) and not os.path.isabs(cfg.resume):
            # relative names containing a separator (e.g. run1/epoch_5)
            # resolve against CWD first; fall back to saved_models_dir so
            # an existing checkpoint there isn't silently skipped
            alt = os.path.join(saved_models_dir, cfg.resume)
            if os.path.exists(alt):
                cand = alt
        restored = None
        if os.path.isfile(cand):
            from ducosy_tpu.train.torch_resume import import_torch_checkpoint
            restored = import_torch_checkpoint(
                cand, state,
                num_residual_blocks=model_cfg.num_residual_blocks)
            print(f"=> imported torch training checkpoint {cand}")
        else:
            restored = ckpt.restore_checkpoint(cand, state)
        if restored is not None:
            state = restored
            start_epoch = int(state.epoch) + 1
            best.best_val = float(state.best_val_loss)
            best.best_epoch = int(state.best_epoch)
            print(f"=> resumed from epoch {start_epoch}")
        else:
            print(f"=> no checkpoint at {cand}, training from scratch")

    # ---- data (trainer.py:419-436)
    patients = list_patient_dirs(cfg.data_root, cfg.dataset_names)
    train_dirs, val_dirs = train_val_split(patients, cfg.val_split,
                                           cfg.split_seed)
    train_ds = SlicePairDataset(train_dirs, range_cfg, img_size=cfg.img_size,
                                ncct_folder=cfg.ncct_folder,
                                cect_folder=cfg.cect_folder)
    val_ds = SlicePairDataset(val_dirs, range_cfg, img_size=cfg.img_size,
                              ncct_folder=cfg.ncct_folder,
                              cect_folder=cfg.cect_folder)
    if len(train_ds) == 0:
        raise RuntimeError(
            f"no training slice pairs under {cfg.data_root}/{cfg.dataset_names}")
    mesh = mesh or data_mesh(num_devices)
    n_proc = mesh_process_count(mesh)
    is_primary = jax.process_index() == 0
    # multi-host DP: every process derives the same epoch order from the
    # shared seed and decodes only its own rows of each global batch. The
    # row block comes from the mesh's actual device order (validated
    # contiguous by process_row_slice) — not from process_index, which only
    # matches for the standard jax.devices() mesh construction.
    shard = None
    if n_proc > 1:
        rows = process_row_slice(mesh, cfg.batch_size)
        local = cfg.batch_size // n_proc
        if rows.stop - rows.start != local:
            raise ValueError(
                f"process owns {rows.stop - rows.start} of {cfg.batch_size} "
                f"batch rows; expected {local} (uneven device distribution)")
        shard = (rows.start // local, n_proc)
    loader = HostLoader(train_ds, cfg.batch_size, shuffle=True,
                        seed=cfg.split_seed, num_workers=cfg.num_workers,
                        shard=shard)
    val_loader = HostLoader(val_ds, cfg.batch_size * 2, shuffle=False,
                            num_workers=cfg.num_workers, shard=shard) \
        if len(val_ds) else None
    fixed_val_batch = next(iter(val_loader)) if val_loader else None
    print(f"Train/Val split: {len(train_ds)} / {len(val_ds)} slices")

    state = replicate(mesh, state)
    gen_forward = cfg.gen_forward
    if gen_forward == "auto":
        from ducosy_tpu.ops.pallas import pallas_available
        gen_forward = "packed" if (pallas_available()
                                   and cfg.img_size % 4 == 0) else "module"
    train_step = make_train_step(gen, disc, cfg, loss_cfg,
                                 remat=(cfg.remat == "on"),
                                 gen_forward=gen_forward)
    val_step = make_val_step(gen, disc, cfg)
    remat_active = cfg.remat == "on"
    # wrap-padded final batches carry a "weight" vector and need a step
    # built with the static real-sample count (exact ragged semantics for
    # the edge top-k term); one per n_real, compiled lazily and cached
    final_steps: Dict[int, object] = {}
    # step fns that have executed once without OOM (remat="auto" keeps a
    # donation-safe state copy only while a step is unproven)
    proven_steps: set = set()

    def step_for(host_batch):
        if "weight" not in host_batch:
            return train_step
        n_real = loader.final_n_real  # GLOBAL real count, same on all hosts
        if n_real not in final_steps:
            final_steps[n_real] = make_train_step(
                gen, disc, cfg, loss_cfg, remat=remat_active,
                n_real=n_real, gen_forward=gen_forward)
        return final_steps[n_real]

    logger = MetricsLogger(os.path.join(training_dir, "metrics.jsonl")
                           if is_primary else None)
    epochs = min(cfg.epochs, start_epoch + max_epochs) if max_epochs \
        else cfg.epochs
    last_metrics: Dict[str, float] = {}

    for epoch in range(start_epoch, epochs):
        lr = lr_for_epoch(cfg.lr, epoch, cfg.epochs, cfg.decay_epoch)
        state = state.set_learning_rate(lr)
        timer = StepTimer()

        for step_idx, host_batch in enumerate(loader):
            if max_steps_per_epoch and step_idx >= max_steps_per_epoch:
                break
            # optional profiler window (first epoch only)
            if cfg.profile_dir and epoch == start_epoch:
                if step_idx == cfg.profile_start:
                    jax.profiler.start_trace(cfg.profile_dir)
                elif step_idx == cfg.profile_stop:
                    jax.profiler.stop_trace()
                    print(f"profiler trace written to {cfg.profile_dir}")
            batch = _to_device_batch(mesh, host_batch)
            # the jitted step donates `state`, and donation invalidates the
            # buffers even when execution fails — while the auto-remat
            # fallback may still fire, keep a live copy so the retry isn't
            # handed deleted arrays (state is ~0.4 GB vs the ~18 GB of
            # activations the fallback exists for). OOM of a fixed
            # executable with static shapes is deterministic, so once a
            # compiled step has executed once the copy is dead weight
            # (extra HBM held during the activation peak) — copy only
            # until each step fn proves itself.
            step_fn = step_for(host_batch)
            unproven = (cfg.remat == "auto" and not remat_active
                        and id(step_fn) not in proven_steps)
            retry_state = jax.tree.map(jnp.copy, state) if unproven else None
            try:
                state, metrics = step_fn(state, batch)
                if unproven:
                    proven_steps.add(id(step_fn))
            except Exception as e:
                # remat="auto": fall back to rematerialized generator
                # forwards when the un-remat'd step exhausts HBM
                if not (cfg.remat == "auto" and not remat_active
                        and _is_oom_error(e)):
                    raise
                print("train step exceeded HBM; retrying with remat'd "
                      "generator forwards")
                train_step = make_train_step(gen, disc, cfg, loss_cfg,
                                             remat=True,
                                             gen_forward=gen_forward)
                remat_active = True
                final_steps.clear()
                proven_steps.clear()
                state, metrics = step_for(host_batch)(retry_state, batch)
            finally:
                retry_state = None
            timer.tick()
            if step_idx % cfg.log_every == 0:
                last_metrics = {k: float(v) for k, v in metrics.items()}
                # failure detection: a non-finite loss means the run is
                # diverging — save an emergency checkpoint and stop loudly
                # instead of silently corrupting the parameters.
                if not all(np.isfinite(v) for v in last_metrics.values()):
                    ckpt.save_checkpoint(
                        os.path.join(saved_models_dir, "checkpoint_nan"),
                        state)
                    logger.log({"epoch": epoch + 1, "step": step_idx,
                                "event": "non_finite_loss", **last_metrics},
                               force_print=True)
                    raise FloatingPointError(
                        f"non-finite loss at epoch {epoch + 1} step "
                        f"{step_idx}: {last_metrics} (state saved to "
                        "checkpoint_nan)")
                logger.log({"epoch": epoch + 1, "step": step_idx, "lr": lr,
                            "steps_per_s": timer.rate(), **last_metrics})

        # ---- validation + image grid (trainer.py:543-547)
        val_loss = float("nan")
        if val_loader is not None:
            total, n_batches = 0.0, 0
            for vb_idx, host_batch in enumerate(val_loader):
                if max_steps_per_epoch and vb_idx >= max_steps_per_epoch:
                    break
                loss, _ = val_step(state, _to_device_batch(mesh, host_batch))
                total += float(loss)
                n_batches += 1
            val_loss = total / max(n_batches, 1)

            _, fake_b = val_step(state,
                                 _to_device_batch(mesh, fixed_val_batch))
            if is_primary:
                win = lambda x: np.asarray(hu_ops.apply_windowing(
                    jnp.asarray(x), range_cfg.hu_min, range_cfg.hu_max,
                    range_cfg.window_center, range_cfg.window_width))
                save_comparison_grid(
                    os.path.join(images_dir, f"epoch_{epoch + 1}.jpg"),
                    win(fixed_val_batch["a"]), win(_local_rows(fake_b)),
                    win(fixed_val_batch["b"]))

        # ---- snapshots + full checkpoint (trainer.py:549-597)
        params_a2b = jax.device_get(state.params_g_a2b)
        params_b2a = jax.device_get(state.params_g_b2a)
        if val_loader is not None and np.isfinite(val_loss):
            if best.update(epoch + 1, val_loss, params_a2b, params_b2a,
                           num_residual_blocks=model_cfg.num_residual_blocks,
                           write=is_primary):
                print(f"new best epoch {epoch + 1}: val={val_loss:.4f}")
        if is_primary:  # params are replicated; one host persists them
            ckpt.save_epoch_snapshots(saved_models_dir, epoch + 1,
                                      params_a2b, params_b2a,
                                      keep=cfg.checkpoint_keep)
        state = state.replace(
            epoch=jnp.asarray(epoch, jnp.int32),
            best_val_loss=jnp.asarray(best.best_val, jnp.float32),
            best_epoch=jnp.asarray(best.best_epoch, jnp.int32))
        if is_primary:
            ckpt.save_checkpoint(os.path.join(saved_models_dir,
                                              "checkpoint"), state)
        logger.log({"epoch": epoch + 1, "val_loss": val_loss, "lr": lr,
                    **{f"train_{k}": v for k, v in last_metrics.items()}},
                   force_print=True)

    logger.close()
    return {"val_loss": val_loss if val_loader else float("nan"),
            "best_val_loss": best.best_val, "best_epoch": best.best_epoch,
            "epochs_run": epochs - start_epoch, **last_metrics}
