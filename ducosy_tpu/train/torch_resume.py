"""Full `checkpoint.pth.tar` training-resume import (torch -> TPU).

The reference resumes a training run from an all-in-one torch checkpoint:
epoch, 4 model state_dicts, 3 Adam optimizer states, 3 LambdaLR scheduler
states and the best-val bookkeeping (save: modules/trainer.py:580-596,
restore: :374-417).  This module maps that file onto a `CycleGANState` so
a reference run mid-way through its 10k epochs can continue on TPU
without losing optimizer momentum, step counts or best-model tracking.

Mapping notes
-------------
* Model weights reuse models/torch_import (the same transposes apply to
  Adam moments, which are parameter-shaped).
* torch `Adam.state_dict()` keys its per-parameter state by the integer
  position of the parameter in the optimizer's parameter list.  For
  these models `Module.parameters()` order equals `state_dict()` key
  order (nn.InstanceNorm2d carries no params/buffers at the reference's
  defaults), so index -> tensor-name is `list(model_sd)` — and for the
  joint generator optimizer (`Adam(list(G_A2B.parameters()) +
  list(G_B2A.parameters()))`, trainer.py:361) the A2B names come first.
* torch Adam and `optax.adam` share the update rule exactly
  (m-hat / (sqrt(v-hat) + eps), bias correction by step count, eps
  applied outside the sqrt), so exp_avg/exp_avg_sq/step map 1:1 onto
  ScaleByAdamState.mu/.nu/.count.
* Schedulers are not state beyond `last_epoch`: the reference recreates
  the LambdaLR factor from the epoch (trainer.py:364-367), and our loop
  recomputes lr_for_epoch(state.epoch + 1) each epoch — so restoring
  `epoch` restores the schedule.  The hyperparams learning_rate is still
  primed from the checkpoint's param_groups for anything that reads the
  state before the loop's first per-epoch set_learning_rate.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ducosy_tpu.models.torch_import import (
    _strip_module_prefix,
    _to_np,
    discriminator_params_from_torch,
    generator_params_from_torch,
)
from ducosy_tpu.train.state import CycleGANState


def _moment_state_dicts(opt_sd: Dict[str, Any], names: List[str]
                        ) -> tuple[Dict[str, Any], Dict[str, Any], int]:
    """torch optimizer state -> ({name: exp_avg}, {name: exp_avg_sq}, step).

    Parameters the optimizer has not touched yet (no grads received — a
    checkpoint saved before the first step) fall back to zero moments, the
    same state a fresh optax init would give them.
    """
    state = opt_sd.get("state", {})
    mu_sd: Dict[str, Any] = {}
    nu_sd: Dict[str, Any] = {}
    step = 0
    for i, name in enumerate(names):
        s = state.get(i, state.get(str(i)))
        if s is None:
            mu_sd[name] = None  # filled with zeros by the caller
            nu_sd[name] = None
            continue
        mu_sd[name] = s["exp_avg"]
        nu_sd[name] = s["exp_avg_sq"]
        step = max(step, int(_to_np(s["step"]).item()))
    return mu_sd, nu_sd, step


def _fill_missing(moment_sd: Dict[str, Any],
                  model_sd: Dict[str, Any]) -> Dict[str, Any]:
    import torch

    return {
        k: (torch.zeros_like(model_sd[k]) if v is None else v)
        for k, v in moment_sd.items()
    }


def _like(tree: Any, template: Any) -> Any:
    """Cast/shape-check an imported tree against the optax template."""
    def one(a, b):
        a = np.asarray(a)
        b = np.asarray(b)
        if a.shape != b.shape:
            raise ValueError(
                f"moment shape {a.shape} != optimizer slot {b.shape}")
        return jnp.asarray(a, b.dtype)
    return jax.tree_util.tree_map(one, tree, template)


def _set_adam(opt_state, mu, nu, count: int, lr: float | None):
    """Surgery on InjectStatefulHyperparamsState(inner=(ScaleByAdam, ...))."""
    adam = opt_state.inner_state[0]
    if not isinstance(adam, optax.ScaleByAdamState):  # pragma: no cover
        raise TypeError(f"unexpected optimizer state layout: {type(adam)}")
    new_adam = adam._replace(
        count=jnp.asarray(count, adam.count.dtype),
        mu=_like(mu, adam.mu),
        nu=_like(nu, adam.nu),
    )
    hyper = dict(opt_state.hyperparams)
    if lr is not None:
        hyper["learning_rate"] = jnp.asarray(
            lr, opt_state.hyperparams["learning_rate"].dtype)
    return opt_state._replace(
        hyperparams=hyper,
        inner_state=(new_adam,) + tuple(opt_state.inner_state[1:]))


def import_torch_checkpoint(path: str, template: CycleGANState,
                            num_residual_blocks: int = 9) -> CycleGANState:
    """Load a reference-format `checkpoint.pth.tar` into a CycleGANState.

    `template` supplies the target structure (from create_state); the
    returned state carries the checkpoint's weights, Adam moments + step
    counts, epoch and best-val bookkeeping.  Raises KeyError/ValueError
    when the checkpoint does not match the model configuration.
    """
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # the reference format embeds an argparse Namespace under 'args'
        # (trainer.py:580-596), which the safe loader rejects. Falling back
        # to a full unpickle executes arbitrary code from the file — only
        # resume from checkpoints you trust.
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    required = ("G_A2B_state_dict", "G_B2A_state_dict",
                "D_A_state_dict", "D_B_state_dict")
    missing = [k for k in required if k not in ckpt]
    if missing:
        raise KeyError(
            f"{path} is not a full training checkpoint (missing {missing}); "
            "for generator-only .pth weights use models/torch_import")

    sds = {k: _strip_module_prefix(ckpt[k]) for k in required}
    r = num_residual_blocks
    p_g_a2b = generator_params_from_torch(sds["G_A2B_state_dict"], r)
    p_g_b2a = generator_params_from_torch(sds["G_B2A_state_dict"], r)
    p_d_a = discriminator_params_from_torch(sds["D_A_state_dict"])
    p_d_b = discriminator_params_from_torch(sds["D_B_state_dict"])

    def params_like(tree, tmpl):
        return jax.tree_util.tree_map(
            lambda a, b: jnp.asarray(np.asarray(a), np.asarray(b).dtype),
            tree, tmpl)

    state = template.replace(
        params_g_a2b=params_like(p_g_a2b, template.params_g_a2b),
        params_g_b2a=params_like(p_g_b2a, template.params_g_b2a),
        params_d_a=params_like(p_d_a, template.params_d_a),
        params_d_b=params_like(p_d_b, template.params_d_b),
    )

    # ---- optimizer moments
    def lr_of(opt_key):
        groups = ckpt[opt_key].get("param_groups", [])
        return float(groups[0]["lr"]) if groups else None

    names_a2b = list(sds["G_A2B_state_dict"])
    names_b2a = list(sds["G_B2A_state_dict"])
    if "optimizer_G_state_dict" in ckpt:
        # joint optimizer: A2B parameter indices precede B2A's
        joint = names_a2b + [f"B2A::{k}" for k in names_b2a]
        mu_sd, nu_sd, step = _moment_state_dicts(
            ckpt["optimizer_G_state_dict"], joint)

        def split(moment_sd, which_prefix):
            if which_prefix:
                picked = {k[len("B2A::"):]: v for k, v in moment_sd.items()
                          if k.startswith("B2A::")}
                model_sd = sds["G_B2A_state_dict"]
            else:
                picked = {k: v for k, v in moment_sd.items()
                          if not k.startswith("B2A::")}
                model_sd = sds["G_A2B_state_dict"]
            return generator_params_from_torch(
                _fill_missing(picked, model_sd), r)

        mu = {"a2b": split(mu_sd, False), "b2a": split(mu_sd, True)}
        nu = {"a2b": split(nu_sd, False), "b2a": split(nu_sd, True)}
        state = state.replace(opt_g=_set_adam(
            template.opt_g, mu, nu, step, lr_of("optimizer_G_state_dict")))

    for opt_key, model_key, slot in (
            ("optimizer_D_A_state_dict", "D_A_state_dict", "opt_d_a"),
            ("optimizer_D_B_state_dict", "D_B_state_dict", "opt_d_b")):
        if opt_key not in ckpt:
            continue
        names = list(sds[model_key])
        mu_sd, nu_sd, step = _moment_state_dicts(ckpt[opt_key], names)
        mu = discriminator_params_from_torch(
            _fill_missing(mu_sd, sds[model_key]))
        nu = discriminator_params_from_torch(
            _fill_missing(nu_sd, sds[model_key]))
        state = state.replace(**{slot: _set_adam(
            getattr(template, slot), mu, nu, step, lr_of(opt_key))})

    # ---- bookkeeping (trainer.py:409-411 semantics: epoch is the last
    # finished 0-based epoch; our loop resumes at state.epoch + 1)
    return state.replace(
        epoch=jnp.asarray(int(ckpt.get("epoch", -1)), jnp.int32),
        best_val_loss=jnp.asarray(
            float(ckpt.get("best_val_loss", np.inf)), jnp.float32),
        best_epoch=jnp.asarray(int(ckpt.get("best_epoch", -1)), jnp.int32),
    )
