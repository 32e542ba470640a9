"""A/B: phase-grouped Pallas IN on the packed up1 norm (inference forward).

Control: _PHASE_FUSE_CAP=0 (f9f778e behavior — packed norms on XLA).
Test:    _PHASE_FUSE_CAP=16MB (up1's 16 MB window through the phase kernel).

Slope method: time K chained forwards minus (K-1) chained to cancel
dispatch/RTT. Run on the real TPU (axon).
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/ducosy_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

import ducosy_tpu.models.fused as fused
from ducosy_tpu.models import Generator


def timed_forward(params, cap, n=8, reps=5):
    fused._PHASE_FUSE_CAP = cap

    @jax.jit
    def chain_k(x):
        for _ in range(4):
            x = fused.generator_apply_packed(
                params, x, trunk="pallas", encoder_fused=True,
                dtype=jnp.bfloat16)
        return x

    @jax.jit
    def chain_k1(x):
        for _ in range(3):
            x = fused.generator_apply_packed(
                params, x, trunk="pallas", encoder_fused=True,
                dtype=jnp.bfloat16)
        return x

    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (n, 512, 512, 1)),
                    jnp.float32)
    t_compile = time.perf_counter()
    np.asarray(chain_k(x)[:1])
    np.asarray(chain_k1(x)[:1])
    print(f"  compile+warm: {time.perf_counter() - t_compile:.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chain_k(x)[:1])
        t_k = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(chain_k1(x)[:1])
        t_k1 = time.perf_counter() - t0
        best = min(best, t_k - t_k1)
    return best


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    gen = Generator(input_channels=1, num_residual_blocks=9)
    x0 = jnp.zeros((1, 512, 512, 1), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), x0)["params"]

    print("control (cap=0, packed norms on XLA):", flush=True)
    t_ctrl = timed_forward(params, 0)
    print(f"  forward: {t_ctrl * 1000:.1f} ms")

    print("test (cap=16MB, up1 phase-fused):", flush=True)
    t_test = timed_forward(params, 16 * 2 ** 20)
    print(f"  forward: {t_test * 1000:.1f} ms")
    print(f"delta: {(t_ctrl - t_test) / t_ctrl * 100:+.1f}% "
          f"({'test wins' if t_test < t_ctrl else 'control wins'})")
