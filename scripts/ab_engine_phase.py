"""Engine-level A/B of the phase-grouped IN: compute-only patient-pipeline
rate with _PHASE_FUSE_CAP=0 (control) vs 16MB (up1 phase-fused)."""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/ducosy_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

import ducosy_tpu.models.fused as fused
from ducosy_tpu.config import ModelConfig
from ducosy_tpu.infer.engine import DualGeneratorEngine
from ducosy_tpu.models import Generator


def rate(cap, reps=8, n_slices=64, chunk=32):
    fused._PHASE_FUSE_CAP = cap
    model_cfg = ModelConfig()
    gen = Generator(input_channels=1,
                    num_residual_blocks=model_cfg.num_residual_blocks)
    x0 = jnp.zeros((1, 512, 512, 1), jnp.float32)
    engine = DualGeneratorEngine(
        gen.init(jax.random.PRNGKey(0), x0)["params"],
        gen.init(jax.random.PRNGKey(1), x0)["params"],
        model_cfg=model_cfg, img_size=512, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    warm = rng.integers(0, 3000, (n_slices, 512, 512)).astype(np.int16)
    dv = jnp.asarray(warm)
    dv.block_until_ready()
    kw = dict(chunk=chunk, n_slices=n_slices, pre_z_sigma=0.8, sigma_z=0.7,
              sigma_xy=0.05, sharpen_amount=1.7, sharpen_radius=1.2)
    slope, inter = jnp.float32(1.0), jnp.float32(-1024.0)
    t0 = time.perf_counter()
    np.asarray(engine._run_patient_jit(engine.params, dv, slope, inter,
                                       None, **kw)[:1])
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
    return best


if __name__ == "__main__":
    r0 = rate(0)
    print(f"control (cap=0):  {r0:.1f} slices/s", flush=True)
    r1 = rate(16 * 2 ** 20)
    print(f"test (cap=16MB):  {r1:.1f} slices/s")
    print(f"delta: {(r1 - r0) / r0 * 100:+.1f}%")
