"""Stage-split timing of the CycleGAN train step (batch 8 x 512^2).

Times, as separate jitted programs on the real chip:
  full      — the production step (remat=False, packed forward)
  g_fwd     — the six generator forwards only (no grad)
  g_vag     — generator value_and_grad (6 fwd + loss + backward), no D,
              no optimizer
  d_step    — both discriminator value_and_grad + updates on fixed fakes
  loss_only — the 9-term generator loss graph on precomputed tensors
  opt_only  — the three optax updates on fixed grads

The groups overlap (g_vag contains g_fwd and loss_only), so the numbers
are a decomposition guide, not a partition. Reference hot loop being
out-scaled: /root/reference/modules/trainer.py:447-531.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/ducosy_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ducosy_tpu.config import ModelConfig, SOFT_TISSUE, TrainConfig, replace
from ducosy_tpu.losses.suite import discriminator_loss, generator_loss
from ducosy_tpu.models.fused import generator_apply_packed
from ducosy_tpu.train import create_state, make_train_step
from ducosy_tpu.train.state import make_optimizer


def timeit(fn, *args, n=4, r=2, sync=None, name=""):
    t0 = time.perf_counter()
    out = fn(*args)
    (sync or jax.block_until_ready)(out)
    print(f"[{name}] compiled in {time.perf_counter() - t0:.0f}s",
          flush=True)
    best = None
    for _ in range(r):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        (sync or jax.block_until_ready)(o)
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    print(f"[{name}] {best * 1e3:.1f} ms", flush=True)
    return best


def main():
    cfg = replace(TrainConfig(), img_size=512, batch_size=8)
    state, gen, disc = create_state(jax.random.PRNGKey(0), cfg, SOFT_TISSUE,
                                    ModelConfig(), img_size=512)
    rng = np.random.default_rng(0)
    batch = {
        "a": jnp.asarray(rng.uniform(-1, 1, (8, 512, 512, 1)), jnp.float32),
        "b": jnp.asarray(rng.uniform(-1, 1, (8, 512, 512, 1)), jnp.float32),
        "masks": jnp.asarray(rng.integers(0, 2, (8, 512, 512, 2)),
                             jnp.float32),
    }
    res = {}

    # --- full production step (no donation so state survives reuse) ---
    step = make_train_step(gen, disc, cfg, remat=False, gen_forward="packed",
                           donate=False)
    res["full"] = timeit(
        lambda s, b: step(s, b)[1]["loss_G"], state, batch,
        sync=lambda x: float(x), name="full")

    gen_apply = lambda p, x: generator_apply_packed(
        p, x, num_residual_blocks=gen.num_residual_blocks,
        use_cbam=gen.use_cbam, dtype=gen.dtype, encoder_fused=False)
    disc_apply = lambda p, x: disc.apply({"params": p}, x)
    in_a = jnp.concatenate([batch["a"], batch["masks"]], axis=-1)
    in_b = jnp.concatenate([batch["b"], batch["masks"]], axis=-1)

    @jax.jit
    def g_fwd(ga, gb, a, b, masks):
        ia = jnp.concatenate([a, masks], axis=-1)
        ib = jnp.concatenate([b, masks], axis=-1)
        fake_b = gen_apply(ga, ia)
        fake_a = gen_apply(gb, ib)
        id_a = gen_apply(gb, ia)
        id_b = gen_apply(ga, ib)
        rec_a = gen_apply(gb, jnp.concatenate([fake_b, masks], axis=-1))
        rec_b = gen_apply(ga, jnp.concatenate([fake_a, masks], axis=-1))
        return fake_a, fake_b, id_a, id_b, rec_a, rec_b

    res["g_fwd_x6"] = timeit(g_fwd, state.params_g_a2b, state.params_g_b2a,
                             batch["a"], batch["b"], batch["masks"],
                             name="g_fwd_x6")

    # one forward for scale
    one = jax.jit(lambda p, x: gen_apply(p, x))
    res["g_fwd_x1"] = timeit(one, state.params_g_a2b, in_a, name="g_fwd_x1")

    def g_loss(g_params, pda, pdb, a, b, masks):
        fa, fb, ida, idb, ra, rb = g_fwd.__wrapped__(
            g_params["a2b"], g_params["b2a"], a, b, masks)
        terms = generator_loss(
            real_a=a, real_b=b, fake_a=fa, fake_b=fb, rec_a=ra, rec_b=rb,
            id_a=ida, id_b=idb,
            d_a_fake_logits=disc_apply(pda, fa),
            d_b_fake_logits=disc_apply(pdb, fb),
            cfg=cfg, sample_weight=None)
        return terms.total, (fa, fb)

    # the grads MUST be returned (not just the loss value): returning only
    # loss lets XLA dead-code-eliminate the entire backward pass — the
    # round-4 first run measured 253 ms here (= forwards + loss) until the
    # full-step subtraction exposed it
    def _vag(gp_, pda, pdb, a, b, m):
        (loss, _aux), grads = jax.value_and_grad(g_loss, has_aux=True)(
            gp_, pda, pdb, a, b, m)
        return loss, grads

    g_vag = jax.jit(_vag)
    gp = {"a2b": state.params_g_a2b, "b2a": state.params_g_b2a}

    def _sync_vag(out):
        loss, grads = out
        float(loss)
        return float(jnp.sum(jax.tree_util.tree_leaves(
            grads)[0].ravel()[:1]))

    res["g_vag"] = timeit(
        g_vag, gp, state.params_d_a, state.params_d_b,
        batch["a"], batch["b"], batch["masks"], sync=_sync_vag,
        name="g_vag")

    # discriminator step on fixed fakes
    fa, fb, *_ = jax.jit(g_fwd.__wrapped__)(
        state.params_g_a2b, state.params_g_b2a, batch["a"], batch["b"],
        batch["masks"])
    tx = make_optimizer(cfg)

    @jax.jit
    def d_step(pda, pdb, oa, ob, a, b, fa, fb):
        def dl(p, real, fake):
            return discriminator_loss(disc_apply(p, real),
                                      disc_apply(p, fake), None)
        la, ga_ = jax.value_and_grad(dl)(pda, a, fa)
        ua, oa = tx.update(ga_, oa, pda)
        pda = optax.apply_updates(pda, ua)
        lb, gb_ = jax.value_and_grad(dl)(pdb, b, fb)
        ub, ob = tx.update(gb_, ob, pdb)
        pdb = optax.apply_updates(pdb, ub)
        return la + lb

    res["d_step_x2"] = timeit(
        d_step, state.params_d_a, state.params_d_b, state.opt_d_a,
        state.opt_d_b, batch["a"], batch["b"], fa, fb,
        sync=lambda x: float(x), name="d_step_x2")

    # loss graph alone (forward only) on precomputed tensors
    outs = jax.jit(g_fwd.__wrapped__)(
        state.params_g_a2b, state.params_g_b2a, batch["a"], batch["b"],
        batch["masks"])

    @jax.jit
    def loss_only(a, b, fa, fb, ida, idb, ra, rb, pda, pdb):
        return generator_loss(
            real_a=a, real_b=b, fake_a=fa, fake_b=fb, rec_a=ra, rec_b=rb,
            id_a=ida, id_b=idb,
            d_a_fake_logits=disc_apply(pda, fa),
            d_b_fake_logits=disc_apply(pdb, fb),
            cfg=cfg, sample_weight=None).total

    res["loss_fwd"] = timeit(
        loss_only, batch["a"], batch["b"], *outs,
        state.params_d_a, state.params_d_b, sync=lambda x: float(x),
        name="loss_fwd")

    # optimizer-only: three updates on grads == params (shape proxy)
    @jax.jit
    def opt_only(gp, pda, pdb, og, oa, ob):
        gu, og = tx.update(gp, og, gp)
        gpn = optax.apply_updates(gp, gu)
        ua, oa = tx.update(pda, oa, pda)
        pa = optax.apply_updates(pda, ua)
        ub, ob = tx.update(pdb, ob, pdb)
        pb = optax.apply_updates(pdb, ub)
        return gpn, pa, pb

    res["opt_x3"] = timeit(opt_only, gp, state.params_d_a, state.params_d_b,
                           state.opt_g, state.opt_d_a, state.opt_d_b, name="opt_x3")

    for k, v in res.items():
        print(f"{k:12s} {v * 1e3:9.1f} ms")
    print(f"\nfull = {res['full']:.3f} s/step = "
          f"{8 / res['full']:.2f} samples/s")


if __name__ == "__main__":
    main()
