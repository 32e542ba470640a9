"""Engine-level A/B of the QUANTIZED mega trunk (ops/pallas/conv_in.py
int8 taps): compute-only patient-pipeline rate + HU fidelity for
  bf16 mega (control — the engine default)
  quant="trunk" + mega   (int8 taps inside the mega kernels)
  quant="full"  + mega   (encoder/decoder int8 too)
  quant="trunk" non-mega (the previous quantized path, for reference)
Only this full-pipeline A/B decides whether engine auto extends mega to
the quant modes (docs/PERF.md round-2 rules)."""
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


def build(quant, trunk):
    model_cfg = ModelConfig()
    gen = Generator(input_channels=1,
                    num_residual_blocks=model_cfg.num_residual_blocks)
    x0 = jnp.zeros((1, 512, 512, 1), jnp.float32)
    return DualGeneratorEngine(
        gen.init(jax.random.PRNGKey(0), x0)["params"],
        gen.init(jax.random.PRNGKey(1), x0)["params"],
        model_cfg=model_cfg, img_size=512, compute_dtype=jnp.bfloat16,
        quant=quant, trunk=trunk)


def run(engine, vol, reps=8, n_slices=64, chunk=32):
    dv = jnp.asarray(vol)
    dv.block_until_ready()
    kw = dict(chunk=chunk, n_slices=n_slices, pre_z_sigma=0.8, sigma_z=0.7,
              sigma_xy=0.05, sharpen_amount=1.7, sharpen_radius=1.2)
    slope, inter = jnp.float32(1.0), jnp.float32(-1024.0)
    t0 = time.perf_counter()
    out = np.asarray(engine._run_patient_jit(engine.params, dv, slope,
                                             inter, None, **kw))
    print(f"  compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [engine._run_patient_jit(engine.params, dv, slope, inter,
                                        None, **kw) for _ in range(reps)]
        for o in outs:
            np.asarray(o[:1])
        best = max(best, n_slices * reps / (time.perf_counter() - t0))
    return best, out


def main():
    rng = np.random.default_rng(0)
    vol = rng.integers(0, 3000, (64, 512, 512)).astype(np.int16)

    r_ctrl, out_ctrl = run(build(None, "mega"), vol)
    print(f"bf16 mega (default):  {r_ctrl:.1f} slices/s", flush=True)
    for quant, trunk in (("trunk", "mega"), ("full", "mega"),
                         ("trunk", "auto")):
        r_q, out_q = run(build(quant, trunk), vol)
        d = out_q.astype(np.float32) - out_ctrl.astype(np.float32)
        print(f"quant={quant!r:8s} trunk={trunk!r:6s}: {r_q:.1f} slices/s "
              f"({(r_q / r_ctrl - 1) * 100:+.1f}%)  "
              f"mean|dHU|={np.abs(d).mean():.2f} "
              f"p99={np.percentile(np.abs(d), 99):.0f} "
              f"max={np.abs(d).max():.0f}", flush=True)


if __name__ == "__main__":
    main()
