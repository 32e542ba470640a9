"""Backward-pass decomposition of the CycleGAN train step.

profile_train_split.py showed fwd 240 ms / D 13 / loss-fwd 19 / opt 16 of
the 879 ms step — the G backward is ~590 ms (67%). This script isolates
where the backward goes, with SLOPE timing (t(n=10) - t(n=2)) / 8 and a
scalar fetch as the sync point: on this axon tunnel block_until_ready
returns early and a host fetch costs a large constant RTT, so only the
slope is trustworthy (docs/PERF.md round-1 lesson).

  g_vag       — 6 fwd + loss + FULL backward (grads materialized)
  one_vag     — single generator forward + trivial loss, fwd+bwd
  trunk_fwd   — the 9-block Pallas trunk alone (8, 130, 130, 256)
  trunk_vag_x — trunk fwd+bwd, grad wrt the activation only
  trunk_vag_pw— trunk fwd+bwd, grads wrt params AND activation
  encdec_*    — the packed forward with 0 residual blocks
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/ducosy_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

from ducosy_tpu.config import ModelConfig, SOFT_TISSUE, TrainConfig, replace
from ducosy_tpu.losses.suite import generator_loss
from ducosy_tpu.models.fused import generator_apply_packed
from ducosy_tpu.ops.pallas.cbam_block import block_tail_fused
from ducosy_tpu.ops.pallas.instance_norm import EPS, instance_norm_fused
from ducosy_tpu.train import create_state


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.ravel()[:1].astype(jnp.float32)))


def timeit(fn, *args, name="", lo=2, hi=10, r=2):
    t0 = time.perf_counter()
    _sync(fn(*args))
    print(f"[{name}] compiled in {time.perf_counter() - t0:.0f}s",
          flush=True)

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        _sync(o)
        return time.perf_counter() - t0

    best = None
    for _ in range(r):
        dt = (run(hi) - run(lo)) / (hi - lo)
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
    gen_apply = lambda p, x: generator_apply_packed(
        p, x, num_residual_blocks=gen.num_residual_blocks,
        use_cbam=gen.use_cbam, dtype=gen.dtype, encoder_fused=False)
    disc_apply = lambda p, x: disc.apply({"params": p}, x)

    def g_loss(g_params, pda, pdb, a, b, masks):
        ia = jnp.concatenate([a, masks], axis=-1)
        ib = jnp.concatenate([b, masks], axis=-1)
        fb = gen_apply(g_params["a2b"], ia)
        fa = gen_apply(g_params["b2a"], ib)
        ida = gen_apply(g_params["b2a"], ia)
        idb = gen_apply(g_params["a2b"], ib)
        ra = gen_apply(g_params["b2a"], jnp.concatenate([fb, masks], -1))
        rb = gen_apply(g_params["a2b"], jnp.concatenate([fa, masks], -1))
        return generator_loss(
            real_a=a, real_b=b, fake_a=fa, fake_b=fb, rec_a=ra, rec_b=rb,
            id_a=ida, id_b=idb,
            d_a_fake_logits=disc_apply(pda, fa),
            d_b_fake_logits=disc_apply(pdb, fb),
            cfg=cfg, sample_weight=None).total

    gp = {"a2b": state.params_g_a2b, "b2a": state.params_g_b2a}

    @jax.jit
    def g_vag(gp, pda, pdb, a, b, m):
        return jax.value_and_grad(g_loss)(gp, pda, pdb, a, b, m)[1]

    timeit(g_vag, gp, state.params_d_a, state.params_d_b,
           batch["a"], batch["b"], batch["masks"], name="g_vag")

    ia = jnp.concatenate([batch["a"], batch["masks"]], axis=-1)

    @jax.jit
    def g_fwd6(ga, gb, a, b, masks):
        iaa = jnp.concatenate([a, masks], axis=-1)
        ibb = jnp.concatenate([b, masks], axis=-1)
        fb = gen_apply(ga, iaa)
        fa = gen_apply(gb, ibb)
        ida = gen_apply(gb, iaa)
        idb = gen_apply(ga, ibb)
        ra = gen_apply(gb, jnp.concatenate([fb, masks], -1))
        rb = gen_apply(ga, jnp.concatenate([fa, masks], -1))
        return fa, fb, ida, idb, ra, rb

    timeit(g_fwd6, state.params_g_a2b, state.params_g_b2a,
           batch["a"], batch["b"], batch["masks"], name="g_fwd_x6")

    @jax.jit
    def one_fwd(p, x):
        return gen_apply(p, x)

    timeit(one_fwd, state.params_g_a2b, ia, name="one_fwd")

    @jax.jit
    def one_vag(p, x):
        def f(p):
            return jnp.sum(gen_apply(p, x).astype(jnp.float32))
        return jax.grad(f)(p)

    timeit(one_vag, state.params_g_a2b, ia, name="one_vag")

    # trunk only: 9 blocks at the padded carry shape
    p = state.params_g_a2b
    hp = jnp.asarray(rng.standard_normal((8, 130, 130, 256)), jnp.bfloat16)

    def trunk(p, hp):
        eps = EPS
        for i in range(gen.num_residual_blocks):
            bp = p[f"block{i}"]
            t = jax.lax.conv_general_dilated(
                hp, bp["conv1"]["kernel"].astype(hp.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            t = instance_norm_fused(t, True, eps, 1)
            t = jax.lax.conv_general_dilated(
                t, bp["conv2"]["kernel"].astype(t.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            last = i == gen.num_residual_blocks - 1
            hp = block_tail_fused(t, hp, bp["ca"]["fc1"]["kernel"],
                                  bp["ca"]["fc2"]["kernel"],
                                  bp["sa"]["conv"]["kernel"], eps,
                                  0 if last else 1, 1)
        return hp

    @jax.jit
    def trunk_fwd(p, hp):
        return trunk(p, hp)

    timeit(trunk_fwd, p, hp, name="trunk_fwd")

    @jax.jit
    def trunk_vag_x(p, hp):
        def f(hp):
            return jnp.sum(trunk(p, hp).astype(jnp.float32))
        return jax.grad(f)(hp)

    timeit(trunk_vag_x, p, hp, name="trunk_vag_x")

    @jax.jit
    def trunk_vag_pw(p, hp):
        def f(p, hp):
            return jnp.sum(trunk(p, hp).astype(jnp.float32))
        return jax.grad(f, argnums=(0, 1))(p, hp)

    timeit(trunk_vag_pw, p, hp, name="trunk_vag_pw")

    # encoder+decoder alone (0 residual blocks, same params otherwise)
    encdec_apply = lambda p, x: generator_apply_packed(
        p, x, num_residual_blocks=0, use_cbam=gen.use_cbam,
        dtype=gen.dtype, encoder_fused=False)

    @jax.jit
    def encdec_fwd(p, x):
        return encdec_apply(p, x)

    timeit(encdec_fwd, state.params_g_a2b, ia, name="encdec_fwd")

    @jax.jit
    def encdec_vag(p, x):
        def f(p):
            return jnp.sum(encdec_apply(p, x).astype(jnp.float32))
        return jax.grad(f)(p)

    timeit(encdec_vag, state.params_g_a2b, ia, name="encdec_vag")


if __name__ == "__main__":
    main()
