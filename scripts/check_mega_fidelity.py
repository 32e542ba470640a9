"""Fidelity attribution for the mega trunk: deviation of each bf16 trunk
(pallas = conv outside the kernels, mega = conv folded in) from the fp32
engine output on the same params/volume. If both deviate comparably, the
pallas-vs-mega difference is bf16 rounding chaos, not a quality loss —
mega computes IN statistics off the fp32 conv accumulator, so it should
be at least as close to fp32 truth."""
import os
import sys

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


def run(trunk, dtype, params, vol, forward="packed"):
    model_cfg = ModelConfig()
    engine = DualGeneratorEngine(params[0], params[1], model_cfg=model_cfg,
                                 img_size=512, compute_dtype=dtype,
                                 forward=forward, trunk=trunk)
    return engine.run_patient(vol, 1.0, -1024.0, chunk=16)


if __name__ == "__main__":
    model_cfg = ModelConfig()
    gen = Generator(input_channels=1,
                    num_residual_blocks=model_cfg.num_residual_blocks)
    x0 = jnp.zeros((1, 512, 512, 1), jnp.float32)
    params = (gen.init(jax.random.PRNGKey(0), x0)["params"],
              gen.init(jax.random.PRNGKey(1), x0)["params"])
    rng = np.random.default_rng(0)
    vol = rng.integers(0, 3000, (16, 512, 512)).astype(np.int16)

    gold = run("xla", jnp.float32, params, vol).astype(np.float32)
    for name, trunk in (("pallas", "pallas"), ("mega", "mega")):
        out = run(trunk, jnp.bfloat16, params, vol).astype(np.float32)
        d = np.abs(out - gold)
        print(f"{name:6s} vs fp32: mean|dHU|={d.mean():.3f} "
              f"p99={np.percentile(d, 99):.1f} max={d.max():.0f} "
              f">50HU: {(d > 50).mean() * 100:.4f}%")
