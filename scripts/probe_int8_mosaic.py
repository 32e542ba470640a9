"""Probe: does Mosaic legalize int8 x int8 -> int32 jnp.dot on this
toolchain, and at what rate vs bf16? Gate for the int8 mega-trunk kernels
(ops/pallas/conv_in.py)."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/ducosy_tpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, b_ref, o_ref, *, taps):
    a = a_ref[...]
    b = b_ref[...]
    acc = jnp.zeros((a.shape[0], b.shape[1]), jnp.int32)
    for _ in range(taps):
        acc = acc + jnp.dot(a, b, preferred_element_type=jnp.int32)
    o_ref[...] = acc


def _kernel_bf16(a_ref, b_ref, o_ref, *, taps):
    a = a_ref[...]
    b = b_ref[...]
    acc = jnp.zeros((a.shape[0], b.shape[1]), jnp.float32)
    for _ in range(taps):
        acc = acc + jnp.dot(a, b, preferred_element_type=jnp.float32)
    o_ref[...] = acc


def run(m, k, n, taps, dtype):
    kern = _kernel if dtype == jnp.int8 else _kernel_bf16
    out_t = jnp.int32 if dtype == jnp.int8 else jnp.float32
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        a = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    else:
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    f = pl.pallas_call(
        functools.partial(kern, taps=taps),
        out_shape=jax.ShapeDtypeStruct((m, n), out_t),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )
    y = jax.jit(f)(a, b)
    jax.block_until_ready(y)
    # correctness vs XLA
    ref = jnp.dot(a, b, preferred_element_type=out_t) * taps
    ok = bool(jnp.all(y == ref)) if dtype == jnp.int8 else \
        bool(jnp.allclose(y.astype(jnp.float32), ref.astype(jnp.float32),
                          rtol=1e-2))
    best = 1e9
    for _ in range(10):
        t0 = time.perf_counter()
        y = jax.jit(f)(a, b)
        jax.block_until_ready(y)
        best = min(best, time.perf_counter() - t0)
    fl = 2 * m * k * n * taps
    print(f"{dtype.__name__} ({m},{k})x({k},{n}) x{taps}: exact={ok} "
          f"{best * 1e3:.2f} ms = {fl / best / 1e12:.0f} TOP/s", flush=True)


if __name__ == "__main__":
    # trunk tap shape: (128*128, 256) x (256, 256), 9 taps
    run(16384, 256, 256, 9, jnp.int8)
    run(16384, 256, 256, 9, jnp.bfloat16)
    run(16384, 256, 256, 36, jnp.int8)
    run(16384, 256, 256, 36, jnp.bfloat16)
