"""Slope-timed stage breakdown of the production engine at chunk 32 with
the mega trunk: packed generator forward (single model), the dual-model
chunk step, and the full patient program — the difference isolates
pre/postprocess + synthesis overhead. All timings are chained-application
slopes (RTT-free; docs/PERF.md measurement rules)."""
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

    for trunk in ("pallas", "mega"):
        fwd = lambda h: generator_apply_packed(
            params, h.astype(jnp.bfloat16),
            num_residual_blocks=model_cfg.num_residual_blocks,
            dtype=jnp.bfloat16, trunk=trunk).astype(jnp.bfloat16)
        t = slope_time(fwd, x32)
        print(f"packed fwd batch32 trunk={trunk}: {t * 1e3:.1f} ms "
              f"({32 / t:.0f} slices/s single-model)", flush=True)

    # stage budget at the 110.8 slices/s headline: a 64-slice patient is
    # 577 ms; dual-model = 2 forwards x 2 chunks
    t_mega = slope_time(lambda h: generator_apply_packed(
        params, h.astype(jnp.bfloat16),
        num_residual_blocks=model_cfg.num_residual_blocks,
        dtype=jnp.bfloat16, trunk="mega").astype(jnp.bfloat16), x32)
    fwd_total = 4 * t_mega
    patient = 64 / 110.83
    print(f"\n64-slice patient budget: {patient * 1e3:.0f} ms total, "
          f"{fwd_total * 1e3:.0f} ms in the 4 forwards "
          f"({fwd_total / patient * 100:.0f}%), "
          f"{(patient - fwd_total) * 1e3:.0f} ms pre/post/synthesis "
          f"({(1 - fwd_total / patient) * 100:.0f}%)")


if __name__ == "__main__":
    main()
