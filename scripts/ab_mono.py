"""Engine-level A/B of the mono-block trunk (ops/pallas/conv_in.py
residual_block_pallas — the WHOLE residual block in one kernel, the
intermediate never leaves VMEM) vs the two-kernel mega trunk, bf16 and
quantized. Per docs/PERF.md rules, only this full-pipeline number decides
whether engine auto moves to mono."""
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
from ducosy_tpu.infer.engine import DualGeneratorEngine
from ducosy_tpu.models import Generator


def rate(trunk, quant=None, reps=8, n_slices=64, chunk=32):
    model_cfg = ModelConfig()
    gen = Generator(input_channels=1,
                    num_residual_blocks=model_cfg.num_residual_blocks)
    x0 = jnp.zeros((1, 512, 512, 1), jnp.float32)
    engine = DualGeneratorEngine(
        gen.init(jax.random.PRNGKey(0), x0)["params"],
        gen.init(jax.random.PRNGKey(1), x0)["params"],
        model_cfg=model_cfg, img_size=512, compute_dtype=jnp.bfloat16,
        trunk=trunk, quant=quant, forward="packed")
    rng = np.random.default_rng(0)
    warm = rng.integers(0, 3000, (n_slices, 512, 512)).astype(np.int16)
    dv = jnp.asarray(warm)
    dv.block_until_ready()
    kw = dict(chunk=chunk, n_slices=n_slices, pre_z_sigma=0.8, sigma_z=0.7,
              sigma_xy=0.05, sharpen_amount=1.7, sharpen_radius=1.2)
    slope, inter = jnp.float32(1.0), jnp.float32(-1024.0)
    t0 = time.perf_counter()
    out = np.asarray(engine._run_patient_jit(engine.params, dv, slope,
                                             inter, None, **kw)[:1])
    print(f"  compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [engine._run_patient_jit(engine.params, dv, slope, inter,
                                        None, **kw) for _ in range(reps)]
        for o in outs:
            np.asarray(o[:1])
        r = n_slices * reps / (time.perf_counter() - t0)
        best = max(best, r)
    return best, out


if __name__ == "__main__":
    arms = [("mega", None), ("mono", None), ("chain3", None),
            ("chain9", None)]
    if len(sys.argv) > 1 and sys.argv[1] == "quant":
        arms = [("mega", "trunk"), ("mono", "trunk"), ("chain3", "trunk"),
                ("mega", "full"), ("chain3", "full")]
    base = None
    for trunk, quant in arms:
        try:
            r, o = rate(trunk, quant)
        except Exception as e:  # noqa: BLE001 — OOM/VMEM reporting
            print(f"trunk={trunk} quant={quant}: FAILED "
                  f"({type(e).__name__}: {str(e)[:160]})", flush=True)
            continue
        if base is None:
            base, obase = r, o
            print(f"trunk={trunk} quant={quant}: {r:.1f} slices/s "
                  f"(control)", flush=True)
        else:
            d = np.abs(obase.astype(np.float32) - o.astype(np.float32))
            print(f"trunk={trunk} quant={quant}: {r:.1f} slices/s "
                  f"({(r - base) / base * 100:+.1f}%) "
                  f"dHU max {d.max():.1f} mean {d.mean():.3f}", flush=True)
