"""Hardware parity for the phase-grouped Pallas IN: packed forward with
the phase kernel ON vs the identical packed forward with it OFF, bf16, on
the real TPU. Catches Mosaic miscompiles the CPU interpret-mode tests
cannot.

The control is the same packed pipeline (cap=0), NOT the canonical Flax
module: end-to-end bf16 accumulation-order differences between the packed
and unpacked graphs already reach max|diff| ~0.067 on tanh outputs
(measured 2026-08-17, both cap settings — the spread is the baseline's,
not the kernel's), so only the ON-vs-OFF delta isolates the kernel under
test. The Flax-module distance is printed for context.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/ducosy_tpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np

import ducosy_tpu.models.fused as fused
from ducosy_tpu.models import Generator

gen = Generator(input_channels=1, num_residual_blocks=9, use_cbam=True,
                dtype=jnp.bfloat16)
x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 512, 512, 1)),
                jnp.float32)
params = gen.init(jax.random.PRNGKey(0), x)["params"]

ref = np.asarray(gen.apply({"params": params}, x), np.float32)


def packed(cap):
    fused._PHASE_FUSE_CAP = cap
    return np.asarray(fused.generator_apply_packed(
        params, x, trunk="pallas", encoder_fused=True, dtype=jnp.bfloat16),
        np.float32)


control = packed(0)
phase = packed(16 * 2 ** 20)  # up1's norm routes through the phase kernel

kernel_delta = np.abs(phase - control)
print(f"phase-on vs phase-off: max|diff|={kernel_delta.max():.5f} "
      f"mean|diff|={kernel_delta.mean():.6f}")
print(f"context — packed vs Flax module: "
      f"max|diff|={np.abs(control - ref).max():.5f} ref_std={ref.std():.4f}")
# one norm's stats computed in a different (still fp32) order: the delta
# must be far inside the packed-vs-unpacked bf16 spread
assert kernel_delta.max() < 2e-2, kernel_delta.max()
print("PHASE PARITY ON TPU: OK")
