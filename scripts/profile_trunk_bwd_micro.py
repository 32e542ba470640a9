"""Micro-decomposition of the trunk backward at (8, 128, 128, 256) bf16.

Slope-timed (see profile_train_bwd.py). Pieces, each as its own jit:
  conv_fwd   — one 3x3 VALID 256->256 conv (reference point, ~0.90 ms)
  conv_dx    — XLA gradient of the conv wrt its input
  conv_dw    — XLA gradient of the conv wrt the kernel
  conv_dxdw  — both together (what the step actually runs per conv)
  in_bwd     — Pallas instance_norm backward (relu+pad fold)
  tail_bwd   — XLA autodiff of block_tail_fused (per block)
  tail_fwd   — block tail forward (reference point)
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/ducosy_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

from ducosy_tpu.config import ModelConfig
from ducosy_tpu.models import Generator
from ducosy_tpu.ops.pallas.cbam_block import block_tail_fused
from ducosy_tpu.ops.pallas.instance_norm import (EPS, instance_norm_fused,
                                                 instance_norm_bwd_pallas)


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.ravel()[:1].astype(jnp.float32)))


def timeit(fn, *args, name="", lo=2, hi=12, r=3):
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
    print(f"[{name}] {best * 1e3:.3f} ms", flush=True)
    return best


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.default_rng(0)
    hp = jnp.asarray(rng.standard_normal((8, 130, 130, 256)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((8, 128, 128, 256)), jnp.bfloat16)
    gp = jnp.asarray(rng.standard_normal((8, 130, 130, 256)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 256, 256)) * 0.02,
                    jnp.bfloat16)
    acc = jnp.asarray(rng.standard_normal((8, 128, 128, 256)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((256, 16)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((16, 256)) * 0.1, jnp.float32)
    wsa = jnp.asarray(rng.standard_normal((7, 7, 2, 1)) * 0.1, jnp.float32)

    timeit(jax.jit(conv), hp, w, name="conv_fwd")

    @jax.jit
    def conv_dx(hp, w, g):
        return jax.vjp(lambda x: conv(x, w), hp)[1](g)[0]

    timeit(conv_dx, hp, w, g, name="conv_dx")

    @jax.jit
    def conv_dw(hp, w, g):
        return jax.vjp(lambda w_: conv(hp, w_), w)[1](g)[0]

    timeit(conv_dw, hp, w, g, name="conv_dw")

    @jax.jit
    def conv_dxdw(hp, w, g):
        return jax.vjp(conv, hp, w)[1](g)

    timeit(conv_dxdw, hp, w, g, name="conv_dxdw")

    @jax.jit
    def in_bwd(acc, gp):
        return instance_norm_bwd_pallas(acc, gp, relu=True, pad=1)

    timeit(in_bwd, acc, gp, name="in_bwd_pallas")

    @jax.jit
    def in_fwd(acc):
        return instance_norm_fused(acc, True, EPS, 1)

    timeit(in_fwd, acc, name="in_fwd_pallas")

    @jax.jit
    def tail_fwd(acc, hp, w1, w2, wsa):
        return block_tail_fused(acc, hp, w1, w2, wsa, EPS, 1, 1)

    timeit(tail_fwd, acc, hp, w1, w2, wsa, name="tail_fwd")

    @jax.jit
    def tail_bwd(acc, hp, w1, w2, wsa, gp):
        out, vjp = jax.vjp(
            lambda a, h, a1, a2, a3: block_tail_fused(a, h, a1, a2, a3,
                                                      EPS, 1, 1),
            acc, hp, w1, w2, wsa)
        return vjp(gp)

    timeit(tail_bwd, acc, hp, w1, w2, wsa, gp, name="tail_bwd")

    # the whole per-block backward as the step composes it today
    @jax.jit
    def block_vag(hp, w, wb, w1, w2, wsa, gp):
        def block(hp, w, wb, w1, w2, wsa):
            t = conv(hp, w)
            t = instance_norm_fused(t, True, EPS, 1)
            t = conv(t, wb)
            return block_tail_fused(t, hp, w1, w2, wsa, EPS, 1, 1)
        out, vjp = jax.vjp(block, hp, w, wb, w1, w2, wsa)
        return vjp(gp)

    timeit(block_vag, hp, w, w, w1, w2, wsa, gp, name="block_fwd_bwd")


if __name__ == "__main__":
    main()
