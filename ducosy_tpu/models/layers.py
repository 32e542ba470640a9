"""Shared NHWC building blocks for the model zoo.

Design notes (TPU-first):
  - NHWC layout throughout: TPU convolutions tile the channel axis onto the
    128-wide lane dimension, so channels-last keeps the MXU fed.
  - InstanceNorm (torch nn.InstanceNorm2d default: affine=False, eps=1e-5,
    biased variance — reference modules/model.py:61,75) carries no parameters;
    statistics are always accumulated in fp32 even under bf16 compute.
  - Reflection padding is explicit jnp.pad(mode='reflect') + VALID conv,
    matching nn.ReflectionPad2d + Conv2d.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

EPS_INSTANCE_NORM = 1e-5


def instance_norm(x: jnp.ndarray, eps: float = EPS_INSTANCE_NORM) -> jnp.ndarray:
    """Parameter-free instance normalization over H, W of an NHWC tensor.

    fp32 statistics regardless of compute dtype; output cast back to input
    dtype. Biased variance to match torch.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    y = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    return y.astype(x.dtype)


def reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """nn.ReflectionPad2d(pad) on NHWC."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


class Conv(nn.Conv):
    """nn.Conv with torch-style default init left to the caller; alias kept
    for clarity at use sites."""


# weights_init_normal (reference modules/model.py:134-140): conv weights
# drawn from N(0, 0.02). Biases start at zero (the reference leaves torch's
# default uniform bias init in place; zeros are equivalent in expectation).
INIT_STD = 0.02


def prec_for(dtype) -> str | None:
    """Matmul/conv precision matching the compute dtype's intent.

    JAX's DEFAULT precision truncates fp32 conv inputs to bf16 passes; with
    an explicit fp32 compute dtype (weight-parity inference, eval) we want
    true fp32 math, while bf16 compute should keep the fast MXU path.
    """
    return None if dtype == jnp.bfloat16 else "highest"


def conv(features: int, kernel: int, *, stride: int = 1, padding="SAME",
         use_bias: bool = True, name: str | None = None,
         dtype=None) -> nn.Conv:
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        use_bias=use_bias,
        name=name,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.normal(stddev=INIT_STD),
        precision=prec_for(dtype),
    )


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """nn.Upsample(scale_factor=2, mode='nearest') on NHWC, written as
    reshape/broadcast (cheaper than gather-based resize under XLA)."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)


NormFn = Callable[[jnp.ndarray], jnp.ndarray]
