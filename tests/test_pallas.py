"""Pallas fused InstanceNorm kernel tests.

Runs the kernel in interpret mode on CPU (numerics only; the compiled TPU
path is exercised by bench.py and the TPU probes). The custom-VJP wrapper's
backward is checked against jax.grad of the unfused reference."""
import numpy as np
import jax
import jax.numpy as jnp

from ducosy_tpu.models.layers import instance_norm
from ducosy_tpu.ops.pallas.instance_norm import (
    instance_norm_fused,
    instance_norm_pallas,
)


def test_interpret_matches_reference(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 256)), jnp.float32)
    y_ref = instance_norm(x)
    y_pal = instance_norm_pallas(x, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)


def test_interpret_relu_fusion(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128)), jnp.float32)
    y = instance_norm_pallas(x, relu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(y),
                               np.maximum(np.asarray(instance_norm(x)), 0),
                               rtol=2e-4, atol=2e-5)
    assert np.asarray(y).min() >= 0.0


def test_degenerate_channel_count(rng):
    # C=96 not divisible by 128 -> single block over all channels
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 96)), jnp.float32)
    y = instance_norm_pallas(x, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(instance_norm(x)),
                               rtol=2e-4, atol=2e-5)


def test_fused_backward_matches_autodiff(rng):
    """The analytic VJP must equal jax.grad through the unfused fp32 IN."""
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    tangent = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)

    for relu in (False, True):
        def ref_loss(v):
            y = instance_norm(v)
            if relu:
                y = jnp.maximum(y, 0.0)
            return jnp.sum(y * tangent)

        def fused_loss(v):
            return jnp.sum(instance_norm_fused(v, relu) * tangent)

        g_ref = jax.grad(ref_loss)(x)
        g_fused = jax.grad(fused_loss)(x)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=2e-3, atol=1e-5)


def test_fused_forward_cpu_fallback(rng):
    # on CPU pallas_available() is False -> XLA path
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    y = instance_norm_fused(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(instance_norm(x)),
                               rtol=1e-5, atol=1e-6)
