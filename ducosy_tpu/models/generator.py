"""ResNet-9 generator with CBAM attention, NHWC Flax rebuild.

Architecture parity with the reference Generator (modules/model.py:90-115):
  encoder: ReflectionPad(3) + 7x7 conv -> 64ch + IN + ReLU, then two stride-2
  3x3 convs (zero pad 1) 64->128->256 each + IN + ReLU; 9 residual blocks at
  256ch with optional CBAM (modules/model.py:68-87, :42-52); decoder: two
  (nearest-upsample x2 + 3x3 conv) 256->128->64 each + IN + ReLU; head
  ReflectionPad(3) + 7x7 conv -> 1ch + Tanh.

TPU-first deviations from the torch code (behavior-identical):
  - NHWC layout, fp32 params with configurable compute dtype (bf16 default in
    training config); InstanceNorm statistics always fp32.
  - CBAM channel MLP is expressed as two dense layers on pooled (N,C) vectors
    instead of 1x1 convs on (N,C,1,1) — same math, MXU-shaped.
  - Optional fused Pallas instance-norm kernel on the residual trunk
    (ducosy_tpu.ops.pallas), toggled by `use_pallas`.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ducosy_tpu.models.layers import (
    conv,
    instance_norm,
    reflect_pad,
    upsample_nearest_2x,
)


def _norm(x, *, relu: bool, fused: bool):
    """InstanceNorm optionally fused with the following ReLU. fused=True
    routes through the Pallas TPU kernel (ops/pallas) with an analytic VJP;
    the default XLA path keeps fp32 statistics (models/layers.py)."""
    if fused:
        from ducosy_tpu.ops.pallas.instance_norm import instance_norm_fused
        return instance_norm_fused(x, relu)
    y = instance_norm(x)
    return nn.relu(y) if relu else y


class ChannelAttention(nn.Module):
    """CBAM channel gate (modules/model.py:6-24): shared bottleneck MLP over
    global average- and max-pooled descriptors, sigmoid, channel scale."""

    channels: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = self.channels // self.reduction
        init = nn.initializers.normal(stddev=0.02)
        from ducosy_tpu.models.layers import prec_for
        fc1 = nn.Dense(hidden, use_bias=False, name="fc1", dtype=self.dtype,
                       param_dtype=jnp.float32, kernel_init=init,
                       precision=prec_for(self.dtype))
        fc2 = nn.Dense(self.channels, use_bias=False, name="fc2",
                       dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=init, precision=prec_for(self.dtype))
        avg = jnp.mean(x, axis=(1, 2))          # (N, C)
        mx = jnp.max(x, axis=(1, 2))            # (N, C)
        gate = fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx)))
        gate = nn.sigmoid(gate.astype(jnp.float32)).astype(x.dtype)
        return x * gate[:, None, None, :]


class SpatialAttention(nn.Module):
    """CBAM spatial gate (modules/model.py:27-39): channelwise mean+max maps,
    7x7 conv, sigmoid, spatial scale."""

    kernel_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        stat = jnp.concatenate([avg, mx], axis=-1)
        gate = conv(1, self.kernel_size, use_bias=False, name="conv",
                    dtype=self.dtype)(stat)
        gate = nn.sigmoid(gate.astype(jnp.float32)).astype(x.dtype)
        return x * gate


class ResidualBlock(nn.Module):
    """Residual block: [reflect-pad conv3x3 + IN + ReLU] x2 with skip; CBAM
    applied to the branch output before the add when enabled
    (modules/model.py:56-87)."""

    channels: int
    use_cbam: bool = True
    dtype: jnp.dtype = jnp.float32
    fused_norm: bool = False

    @nn.compact
    def __call__(self, x):
        h = reflect_pad(x, 1)
        h = conv(self.channels, 3, padding="VALID", name="conv1",
                 dtype=self.dtype)(h)
        h = _norm(h, relu=True, fused=self.fused_norm)
        h = reflect_pad(h, 1)
        h = conv(self.channels, 3, padding="VALID", name="conv2",
                 dtype=self.dtype)(h)
        h = _norm(h, relu=False, fused=self.fused_norm)
        if self.use_cbam:
            h = ChannelAttention(self.channels, name="ca", dtype=self.dtype)(h)
            h = SpatialAttention(name="sa", dtype=self.dtype)(h)
        return x + h


class Generator(nn.Module):
    """NCCT->CECT (or reverse) slice translator.

    input: NHWC with C = 1 image channel + mask channels; output: NHW1 tanh.
    """

    input_channels: int = 1
    num_residual_blocks: int = 9
    base_channels: int = 64
    use_cbam: bool = True
    dtype: jnp.dtype = jnp.float32
    # Route InstanceNorm through the fused Pallas TPU kernel (inference and
    # training; analytic VJP). The trunk blocks benefit most (22 IN layers);
    # encoder/decoder norms at 512^2 spatial exceed the VMEM block budget and
    # stay on the XLA path.
    fused_norm: bool = False

    @nn.compact
    def __call__(self, x):
        ch = self.base_channels
        x = x.astype(self.dtype)

        h = reflect_pad(x, 3)
        h = conv(ch, 7, padding="VALID", name="stem", dtype=self.dtype)(h)
        h = nn.relu(instance_norm(h))

        h = conv(ch * 2, 3, stride=2, padding=((1, 1), (1, 1)), name="down1",
                 dtype=self.dtype)(h)
        h = nn.relu(instance_norm(h))
        h = conv(ch * 4, 3, stride=2, padding=((1, 1), (1, 1)), name="down2",
                 dtype=self.dtype)(h)
        h = nn.relu(instance_norm(h))

        for i in range(self.num_residual_blocks):
            h = ResidualBlock(ch * 4, use_cbam=self.use_cbam,
                              name=f"block{i}", dtype=self.dtype,
                              fused_norm=self.fused_norm)(h)

        h = upsample_nearest_2x(h)
        h = conv(ch * 2, 3, padding=((1, 1), (1, 1)), name="up1",
                 dtype=self.dtype)(h)
        h = nn.relu(instance_norm(h))
        h = upsample_nearest_2x(h)
        h = conv(ch, 3, padding=((1, 1), (1, 1)), name="up2",
                 dtype=self.dtype)(h)
        h = nn.relu(instance_norm(h))

        h = reflect_pad(h, 3)
        h = conv(1, 7, padding="VALID", name="head", dtype=self.dtype)(h)
        return jnp.tanh(h.astype(jnp.float32))
