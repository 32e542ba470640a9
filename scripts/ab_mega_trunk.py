"""Engine-level A/B of the mega-fused trunk (ops/pallas/conv_in.py):
compute-only patient-pipeline rate with trunk="pallas" (control, conv
outside the kernels) vs trunk="mega" (convs folded in).

Block-level slope timings (scripts/proto_conv_in.py) had mega at 1.195x
for batch 32 — but only full-pipeline A/Bs count (docs/PERF.md)."""
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


def rate(trunk, reps=8, n_slices=64, chunk=32):
    model_cfg = ModelConfig()
    gen = Generator(input_channels=1,
                    num_residual_blocks=model_cfg.num_residual_blocks)
    x0 = jnp.zeros((1, 512, 512, 1), jnp.float32)
    engine = DualGeneratorEngine(
        gen.init(jax.random.PRNGKey(0), x0)["params"],
        gen.init(jax.random.PRNGKey(1), x0)["params"],
        model_cfg=model_cfg, img_size=512, compute_dtype=jnp.bfloat16,
        trunk=trunk)
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
    if len(sys.argv) > 1 and sys.argv[1] == "chunks":
        # chunk re-tune for the mega trunk (the faster trunk shifts the
        # compute/HBM balance; 64 OOM'd with the round-1 trunk)
        for chunk in (32, 48, 64):
            try:
                # keep total slices comparable and n_slices % chunk == 0
                r, _ = rate("mega", chunk=chunk, n_slices=2 * chunk,
                            reps=512 // (2 * chunk))
                print(f"mega chunk={chunk}: {r:.1f} slices/s", flush=True)
            except Exception as e:  # noqa: BLE001 — OOM reporting
                print(f"mega chunk={chunk}: FAILED "
                      f"({type(e).__name__}: {str(e)[:120]})", flush=True)
        sys.exit(0)
    r0, o0 = rate("pallas")
    print(f"control (trunk=pallas): {r0:.1f} slices/s", flush=True)
    r1, o1 = rate("mega")
    print(f"test   (trunk=mega)  : {r1:.1f} slices/s")
    print(f"delta: {(r1 - r0) / r0 * 100:+.1f}%")
    d = np.abs(o0.astype(np.float32) - o1.astype(np.float32))
    print(f"output HU deviation: max {d.max():.2f}, mean {d.mean():.4f}")
