"""Slope-timed split of the packed mega forward: trunk (9 residual
blocks) vs encoder+decoder, by timing num_residual_blocks=0 vs 9 on the
same params. Decides where the next kernel work goes (docs/PERF.md
measurement rules: chained-application slopes, RTT-free)."""
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

from ducosy_tpu.config import ModelConfig
from ducosy_tpu.models import Generator
from ducosy_tpu.models.fused import generator_apply_packed


def slope_time(fn, x, iters_list=(2, 6), reps=5):
    times = {}
    for it in iters_list:
        @jax.jit
        def chain(x0):
            def body(h, _):
                return fn(h), None
            y, _ = jax.lax.scan(body, x0, None, length=it)
            return y
        y = chain(x)
        jax.block_until_ready(y)
        float(jnp.sum(y[0, 0, 0, :1]).astype(jnp.float32))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            y = chain(x)
            float(jnp.sum(y[0, 0, 0, :1]).astype(jnp.float32))
            best = min(best, time.perf_counter() - t0)
        times[it] = best
    i0, i1 = iters_list
    return (times[i1] - times[i0]) / (i1 - i0)


def main():
    model_cfg = ModelConfig()
    gen = Generator(input_channels=1,
                    num_residual_blocks=model_cfg.num_residual_blocks)
    x0 = jnp.zeros((1, 512, 512, 1), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), x0)["params"]
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.uniform(-1, 1, (32, 512, 512, 1)), jnp.bfloat16)

    def fwd(nblocks):
        # crop to the input shape: with 0 blocks the unconsumed trunk
        # priming pad leaks into the output size, which breaks the scan
        # carry (and the head crop costs nothing)
        trunk = os.environ.get("SPLIT_TRUNK", "mono")
        return lambda h: generator_apply_packed(
            params, h.astype(jnp.bfloat16), num_residual_blocks=nblocks,
            dtype=jnp.bfloat16, trunk=trunk
        )[:, :h.shape[1], :h.shape[2], :].astype(jnp.bfloat16)

    t9 = slope_time(fwd(9), x32)
    t0 = slope_time(fwd(0), x32)
    per_block = (t9 - t0) / 9
    print(f"full fwd (9 blocks): {t9 * 1e3:.1f} ms", flush=True)
    print(f"enc+dec  (0 blocks): {t0 * 1e3:.1f} ms "
          f"({t0 / t9 * 100:.0f}%)", flush=True)
    print(f"trunk: {(t9 - t0) * 1e3:.1f} ms ({(t9 - t0) / t9 * 100:.0f}%), "
          f"{per_block * 1e3:.2f} ms/block", flush=True)
    # FLOP bound per block: 2 convs x 32 x 128^2 x (9*256*256) MACs
    flops = 2 * 2 * 32 * 128 * 128 * 9 * 256 * 256
    print(f"per-block MXU: {flops / per_block / 1e12:.0f} TF/s "
          f"(v5e bf16 peak ~197)")


if __name__ == "__main__":
    main()
