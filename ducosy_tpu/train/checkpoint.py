"""Checkpoint / resume.

Reproduces the reference's checkpoint semantics (modules/trainer.py:549-597)
on top of Orbax + portable numpy archives:

  - full train state (4 models, 3 optimizer states, epoch, best-val
    bookkeeping) saved each epoch under `<training_dir>/saved_models/
    checkpoint/` — the `checkpoint.pth.tar` equivalent, resumable mid-run
    (trainer.py:374-417);
  - per-epoch and `last` generator weight snapshots (`G_A2B_epoch_{N}`,
    `G_*_last`) as .npz PyTree archives (trainer.py:572-577);
  - best-on-val generator snapshots with previous-best deletion
    (trainer.py:555-569);
  - optional torch .pth export via models/torch_import for drop-in
    compatibility with the reference's inference tooling.
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np

from ducosy_tpu.train.state import CycleGANState


# ------------------------------------------------------------- npz pytrees
def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_params_npz(path: str, params: Dict[str, Any]):
    np.savez(path, **_flatten(jax.device_get(params)))


def load_params_npz(path: str) -> Dict[str, Any]:
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


def export_params_pth(path: str, params: Dict[str, Any],
                      num_residual_blocks: int = 9):
    """Write a reference-compatible torch state dict (needs baked-in torch)."""
    import torch

    from ducosy_tpu.models.torch_import import generator_params_to_torch
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          generator_params_to_torch(jax.device_get(params),
                                    num_residual_blocks).items()}
    torch.save(sd, path)


# ------------------------------------------------------------ orbax state
def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(directory: str, state: CycleGANState):
    """Atomic full-state save (the checkpoint.pth.tar equivalent)."""
    ocp = _ocp()
    path = os.path.abspath(directory)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp, jax.device_get(state))
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def restore_checkpoint(directory: str,
                       template: CycleGANState) -> Optional[CycleGANState]:
    """Restore into the template's structure; None when absent
    (trainer.py:407-408 prints and falls back to fresh init)."""
    path = os.path.abspath(directory)
    if not os.path.isdir(path):
        return None
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
            jax.device_get(template))
        try:
            return ckptr.restore(path, abstract)
        except Exception as e:  # shape/structure mismatch -> actionable error
            raise RuntimeError(
                f"checkpoint at {path} is incompatible with the current "
                "model configuration (did mask channels / architecture "
                f"change?): {e}") from e


class BestTracker:
    """Best-val generator snapshot management with previous-best deletion
    (trainer.py:555-569)."""

    def __init__(self, saved_models_dir: str):
        self.dir = saved_models_dir
        self.best_val = float("inf")
        self.best_epoch = -1

    def update(self, epoch1: int, val_loss: float, params_a2b, params_b2a,
               *, export_pth: bool = False, num_residual_blocks: int = 9,
               write: bool = True) -> bool:
        """Track the best epoch; `write=False` (non-primary hosts in a
        multi-host run) updates the bookkeeping without touching disk."""
        if val_loss >= self.best_val:
            return False
        if not write:
            self.best_val = val_loss
            self.best_epoch = epoch1
            return True
        if self.best_epoch != -1:
            for stem in ("G_A2B", "G_B2A"):
                for ext in (".npz", ".pth"):
                    old = os.path.join(
                        self.dir, f"{stem}_best_epoch_{self.best_epoch}{ext}")
                    if os.path.exists(old):
                        os.remove(old)
        self.best_val = val_loss
        self.best_epoch = epoch1
        for stem, params in (("G_A2B", params_a2b), ("G_B2A", params_b2a)):
            save_params_npz(
                os.path.join(self.dir, f"{stem}_best_epoch_{epoch1}.npz"),
                params)
            if export_pth:
                export_params_pth(
                    os.path.join(self.dir, f"{stem}_best_epoch_{epoch1}.pth"),
                    params, num_residual_blocks)
        return True


def save_epoch_snapshots(saved_models_dir: str, epoch1: int, params_a2b,
                         params_b2a, *, keep: int = 0):
    """Per-epoch + last generator snapshots (trainer.py:572-577).

    `keep` > 0 bounds disk growth: only the newest `keep` per-epoch
    snapshots are retained (~44 MB each; the reference accumulates one per
    epoch for 10k epochs). Best-tracker snapshots (`_best_epoch_`), `last`,
    and the full-state checkpoint are never pruned."""
    import re

    for stem, params in (("G_A2B", params_a2b), ("G_B2A", params_b2a)):
        save_params_npz(
            os.path.join(saved_models_dir, f"{stem}_epoch_{epoch1}.npz"),
            params)
        save_params_npz(
            os.path.join(saved_models_dir, f"{stem}_last.npz"), params)
    if keep > 0:
        pat = re.compile(r"^G_(A2B|B2A)_epoch_(\d+)\.npz$")
        epochs = sorted({int(m.group(2))
                         for f in os.listdir(saved_models_dir)
                         if (m := pat.match(f))}, reverse=True)
        for old_epoch in epochs[keep:]:
            for stem in ("G_A2B", "G_B2A"):
                p = os.path.join(saved_models_dir,
                                 f"{stem}_epoch_{old_epoch}.npz")
                if os.path.exists(p):
                    os.remove(p)
