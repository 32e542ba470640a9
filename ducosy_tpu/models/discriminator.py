"""PatchGAN discriminator, NHWC Flax rebuild.

Parity with the reference Discriminator (modules/model.py:118-131): four 4x4
stride-2 convs (zero pad 1) with channels 64->128->256->512, InstanceNorm on
all but the first, LeakyReLU(0.2); then ZeroPad2d((1,0,1,0)) and a 4x4 conv
(pad 1) to a 1-channel logit map. A 512x512 input yields a 32x32 patch map
(img_size // 16 — label tensors at trainer.py:459-460).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ducosy_tpu.models.layers import conv, instance_norm, leaky_relu


class Discriminator(nn.Module):
    input_channels: int = 1
    base_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = self.base_channels
        x = x.astype(self.dtype)

        h = conv(ch, 4, stride=2, padding=((1, 1), (1, 1)), name="conv1",
                 dtype=self.dtype)(x)
        h = leaky_relu(h)
        for i, mult in enumerate((2, 4, 8), start=2):
            h = conv(ch * mult, 4, stride=2, padding=((1, 1), (1, 1)),
                     name=f"conv{i}", dtype=self.dtype)(h)
            h = leaky_relu(instance_norm(h))

        # ZeroPad2d((left=1, right=0, top=1, bottom=0)) then 4x4 conv pad 1:
        # fold both paddings into one asymmetric padding (top/left 2,
        # bottom/right 1).
        h = conv(1, 4, padding=((2, 1), (2, 1)), name="head",
                 dtype=self.dtype)(h)
        return h.astype(jnp.float32)
