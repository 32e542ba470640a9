"""Training-step roofline: exact FLOPs/step from XLA's cost analysis,
measured step time, and the resulting MFU against the chip's bf16 peak.

Complements the inference speed-of-light accounting in docs/PERF.md
(VERDICT r3 item 3: training had no roofline). The FLOP count comes from
the compiled executable's own cost analysis — not hand arithmetic — so it
includes every conv/matmul/elementwise op the 9-term loss graph and the
three Adam updates actually run, including any remat recompute.

Run on the TPU: python scripts/roofline_train.py
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

# bf16 peak of one TPU v5e (v5 lite) chip
V5E_BF16_PEAK_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


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
    remat = False
    step = make_train_step(gen, disc, cfg, remat=remat,
                           gen_forward="packed", donate=False)
    t0 = time.perf_counter()
    try:
        lowered = step.lower(state, batch)
        compiled = lowered.compile()
    except Exception as e:
        print(f"no-remat compile failed ({type(e).__name__}); remat=True")
        remat = True
        step = make_train_step(gen, disc, cfg, remat=True,
                               gen_forward="packed", donate=False)
        compiled = step.lower(state, batch).compile()
    print(f"compiled in {time.perf_counter() - t0:.0f}s (remat={remat})")

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    bytes_acc = float(ca.get("bytes accessed", float("nan")))
    mem = compiled.memory_analysis()

    new_state, m = compiled(state, batch)
    float(m["loss_G"])
    rounds = []
    for _ in range(3):
        t0 = time.perf_counter()
        s, mm = state, None
        for _ in range(4):
            s, mm = compiled(s, batch)
        float(mm["loss_G"])
        rounds.append((time.perf_counter() - t0) / 4)
    dt = sorted(rounds)[1]

    tf_step = flops / 1e12
    mfu = tf_step / dt / V5E_BF16_PEAK_TFLOPS
    hbm = bytes_acc / 1e9 / dt / V5E_HBM_GBPS
    print(f"FLOPs/step (XLA cost analysis): {tf_step:.1f} TF "
          f"({tf_step / 8:.2f} TF/sample)")
    print(f"bytes accessed/step: {bytes_acc / 1e9:.1f} GB")
    if mem is not None:
        try:
            print(f"peak HBM: {mem.temp_size_in_bytes / 2**30:.2f} GiB temp "
                  f"+ {mem.argument_size_in_bytes / 2**30:.2f} GiB args")
        except AttributeError:
            pass
    print(f"step time: {dt * 1e3:.0f} ms median (rounds "
          f"{[round(r, 3) for r in rounds]})")
    print(f"MFU: {mfu * 100:.1f}% of {V5E_BF16_PEAK_TFLOPS:.0f} TF/s bf16 "
          f"peak; HBM util {hbm * 100:.1f}% of {V5E_HBM_GBPS:.0f} GB/s")


if __name__ == "__main__":
    main()
