"""Step-time A/B of the block-tail backward implementation on hardware.

The trunk's custom VJP (`ops.pallas.cbam_block._BWD_IMPL`) has three
implementations: "analytic" (hand-written adjoint chain, the default),
"autodiff" (jax.vjp of the XLA composition, round-2 default) and
"pallas" (two-pass kernel, loses on this toolchain). This script times
the FULL production train step (batch 8 x 512^2, packed forward, bf16)
under each, median of rounds — the number that decides the default
(VERDICT r3 item 1: re-A/B after the gradient-parity recalibration).

Run on the TPU: python scripts/ab_bwd_impl.py [impl ...]
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

from ducosy_tpu.config import ModelConfig, SOFT_TISSUE, TrainConfig, replace
from ducosy_tpu.train import create_state, make_train_step
import ducosy_tpu.ops.pallas.cbam_block as cbam_block


def measure(impl: str, n: int = 4, n_rounds: int = 3):
    cbam_block._BWD_IMPL = impl
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
    step = make_train_step(gen, disc, cfg, remat=False, gen_forward="packed")
    t0 = time.perf_counter()
    try:
        state, m = step(state, batch)
        float(m["loss_G"])
    except Exception:  # HBM OOM without remat -> remat'd step
        state, gen, disc = create_state(jax.random.PRNGKey(0), cfg,
                                        SOFT_TISSUE, ModelConfig(),
                                        img_size=512)
        step = make_train_step(gen, disc, cfg, remat=True,
                               gen_forward="packed")
        state, m = step(state, batch)
        float(m["loss_G"])
    print(f"[{impl}] compile+warm {time.perf_counter() - t0:.0f}s "
          f"loss_G={float(m['loss_G']):.4f}", flush=True)
    rounds = []
    for _ in range(n_rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, batch)
        float(m["loss_G"])
        rounds.append((time.perf_counter() - t0) / n)
    med = sorted(rounds)[len(rounds) // 2]
    print(f"[{impl}] {med:.3f} s/step median "
          f"(rounds {[round(r, 3) for r in rounds]})", flush=True)
    return med


if __name__ == "__main__":
    impls = sys.argv[1:] or ["analytic", "autodiff"]
    results = {}
    for impl in impls:
        results[impl] = measure(impl)
    base = results[impls[0]]
    for impl, med in results.items():
        print(f"{impl}: {med:.3f} s/step ({(base - med) / base * 100:+.1f}% "
              f"vs {impls[0]})")
