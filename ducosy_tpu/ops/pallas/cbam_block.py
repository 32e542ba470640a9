"""Fused residual-block tail: InstanceNorm + CBAM + skip-add (+reflect-pad).

The reference residual block (modules/model.py:68-87) ends with
  h = InstanceNorm(conv2(...)); out = x + SA(CA(h))
where CA is the channel gate (global avg+max pool -> shared bottleneck MLP
-> sigmoid scale, modules/model.py:6-24) and SA the spatial gate
(channel mean+max -> 7x7 conv -> sigmoid scale, :27-39).

Under XLA this tail costs ~6 extra HBM traversals of the (N,128,128,256)
trunk activation (IN reduce+normalize, CA pools, CA scale, SA stats, SA
scale, skip add). This kernel keeps one sample's full-channel block
resident in VMEM and does all of it in a single pass — plus, optionally,
the NEXT block's ReflectionPad folded into the output write.

The channel MLP (256->16->256) and the 7x7x2 spatial conv are tiny
(<2 MFLOP/sample) and run on the MXU/VPU from VMEM/SMEM-resident weights.

Gradients: custom VJP — Pallas forward, backward by XLA autodiff of the
equivalent composition (the tail is cheap to rematerialize relative to the
convs around it).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ducosy_tpu.ops.pallas.instance_norm import (
    EPS,
    pallas_available,
    reflect_pad_adjoint,
    reflect_pad_hw,
)

SA_KERNEL = 7  # reference SpatialAttention kernel_size (modules/model.py:29)


def _kernel(h_ref, x_ref, w1_ref, w2_ref, wsa_ref, o_ref, *,
            eps: float, pad: int, x_pad: int):
    h = h_ref[0]                                   # (H, W, C), io dtype
    hh, ww, c = h.shape
    count = hh * ww
    # ---- InstanceNorm, fp32 statistics
    s = jnp.sum(h, axis=(0, 1), dtype=jnp.float32)
    sq = jnp.sum(jnp.square(h), axis=(0, 1), dtype=jnp.float32)
    mean = s / count
    var = jnp.maximum(sq / count - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = (h - mean.astype(h.dtype)) * inv.astype(h.dtype)   # (H, W, C)

    # ---- channel attention: shared MLP over avg- and max-pooled vectors
    avg = jnp.sum(y, axis=(0, 1), dtype=jnp.float32) / count     # (C,)
    mx = jnp.max(y, axis=(0, 1)).astype(jnp.float32)             # (C,)
    w1 = w1_ref[...]                                             # (C, R)
    w2 = w2_ref[...]                                             # (R, C)
    hid = jnp.maximum(
        jnp.dot(jnp.stack([avg, mx]), w1,
                preferred_element_type=jnp.float32), 0.0)        # (2, R)
    gates = jnp.dot(hid, w2, preferred_element_type=jnp.float32)  # (2, C)
    gate_c = jax.nn.sigmoid(gates[0] + gates[1])                 # (C,)
    t = y * gate_c.astype(y.dtype)[None, None, :]                # (H, W, C)

    # ---- spatial attention: channel mean+max -> 7x7 conv -> sigmoid
    sa_avg = (jnp.sum(t, axis=-1, dtype=jnp.float32) / c)        # (H, W)
    sa_max = jnp.max(t, axis=-1).astype(jnp.float32)             # (H, W)
    p = SA_KERNEL // 2

    def zero_pad(a):  # torch SAME zero pad, concat-form for Mosaic
        zr = jnp.zeros((p, a.shape[1]), a.dtype)
        a = jnp.concatenate([zr, a, zr], axis=0)
        zc = jnp.zeros((a.shape[0], p), a.dtype)
        return jnp.concatenate([zc, a, zc], axis=1)

    avg_p = zero_pad(sa_avg)
    max_p = zero_pad(sa_max)
    acc = jnp.zeros((hh, ww), jnp.float32)
    for di in range(SA_KERNEL):
        for dj in range(SA_KERNEL):
            wa = wsa_ref[di * SA_KERNEL + dj]
            wm = wsa_ref[SA_KERNEL * SA_KERNEL + di * SA_KERNEL + dj]
            acc += (wa * avg_p[di:di + hh, dj:dj + ww]
                    + wm * max_p[di:di + hh, dj:dj + ww])
    # minor-dim insertion is only lowerable for 32-bit types: expand the
    # fp32 gate first, cast the (H, W, 1) result for the broadcast multiply
    gate_s = jax.nn.sigmoid(acc)[:, :, None].astype(t.dtype)     # (H, W, 1)

    x = x_ref[0]
    if x_pad:  # skip input arrives reflect-padded (the previous block's
        # folded output write); only its interior joins the residual
        x = x[x_pad:x_pad + hh, x_pad:x_pad + ww]
    out = x + t * gate_s
    if pad:
        out = reflect_pad_hw(out, pad, h_axis=0)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "pad", "x_pad", "interpret"))
def block_tail_pallas(h, x, w1, w2, wsa, *, eps: float = EPS, pad: int = 0,
                      x_pad: int = 0, interpret: bool = False):
    """h: conv2 output (N,H,W,C); x: block input (N,H,W,C) — or, with
    x_pad=p, the block input already reflect-padded by p (the previous
    block's folded output write; only the interior joins the skip add);
    w1 (C,R); w2 (R,C); wsa (7,7,2,1) torch-ordered HWIO spatial-conv
    kernel. Returns x + CBAM(IN(h)), reflect-padded by `pad`."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, hh, ww, c = h.shape
    wsa_flat = wsa.reshape(SA_KERNEL * SA_KERNEL, 2).T.reshape(-1)
    wsa_flat = wsa_flat.astype(jnp.float32)  # (2*49,): avg taps then max taps
    out_shape = (n, hh + 2 * pad, ww + 2 * pad, c)
    vspace = pltpu.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, pad=pad, x_pad=x_pad),
        out_shape=jax.ShapeDtypeStruct(out_shape, h.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hh, ww, c), lambda i: (i, 0, 0, 0),
                         memory_space=vspace),
            pl.BlockSpec((1, hh + 2 * x_pad, ww + 2 * x_pad, c),
                         lambda i: (i, 0, 0, 0),
                         memory_space=vspace),
            pl.BlockSpec((c, w1.shape[1]), lambda i: (0, 0),
                         memory_space=vspace),
            pl.BlockSpec((w2.shape[0], c), lambda i: (0, 0),
                         memory_space=vspace),
            pl.BlockSpec((2 * SA_KERNEL * SA_KERNEL,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, hh + 2 * pad, ww + 2 * pad, c),
                               lambda i: (i, 0, 0, 0), memory_space=vspace),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(h, x, w1.astype(jnp.float32), w2.astype(jnp.float32), wsa_flat)


def _xla_block_tail(h, x, w1, w2, wsa, eps, pad, x_pad=0):
    """Reference composition in plain XLA (CPU path + the VJP recompute)."""
    if x_pad:
        x = x[:, x_pad:-x_pad, x_pad:-x_pad, :]
    x32 = h.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(h.dtype)

    avg = jnp.mean(y.astype(jnp.float32), axis=(1, 2))           # (N, C)
    mx = jnp.max(y, axis=(1, 2)).astype(jnp.float32)             # (N, C)
    w1f = w1.astype(jnp.float32)
    w2f = w2.astype(jnp.float32)
    gate_c = jax.nn.sigmoid(
        jnp.maximum(avg @ w1f, 0.0) @ w2f
        + jnp.maximum(mx @ w1f, 0.0) @ w2f)                      # (N, C)
    t = y * gate_c.astype(y.dtype)[:, None, None, :]

    sa_avg = jnp.mean(t.astype(jnp.float32), axis=-1, keepdims=True)
    sa_max = jnp.max(t, axis=-1, keepdims=True).astype(jnp.float32)
    stat = jnp.concatenate([sa_avg, sa_max], axis=-1)            # (N,H,W,2)
    gate_s = jax.nn.sigmoid(jax.lax.conv_general_dilated(
        stat, wsa.astype(jnp.float32), (1, 1),
        [(SA_KERNEL // 2,) * 2] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))).astype(t.dtype)
    out = x + t * gate_s
    if pad:
        out = jnp.pad(out, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                      mode="reflect")
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def block_tail_fused(h, x, w1, w2, wsa, eps: float = EPS, pad: int = 0,
                     x_pad: int = 0):
    """x + CBAM(InstanceNorm(h)), optionally reflect-padded — Pallas on
    TPU, XLA elsewhere; differentiable (backward = XLA autodiff of the
    composition). With x_pad=p the skip input arrives reflect-padded by p
    and only its interior is used (zero gradient to the border)."""
    if pallas_available():
        return block_tail_pallas(h, x, w1, w2, wsa, eps=eps, pad=pad,
                                 x_pad=x_pad)
    return _xla_block_tail(h, x, w1, w2, wsa, eps, pad, x_pad)


def _fwd(h, x, w1, w2, wsa, eps, pad, x_pad):
    return (block_tail_fused(h, x, w1, w2, wsa, eps, pad, x_pad),
            (h, x, w1, w2, wsa))


def _bwd(eps, pad, x_pad, res, g):
    h, x, w1, w2, wsa = res
    # unpadded-tail VJP + explicit pad adjoint keeps the recompute graph
    # free of the pad output (saves HBM in the backward)
    _, vjp = jax.vjp(
        lambda *a: _xla_block_tail(*a, eps, 0, x_pad), h, x, w1, w2, wsa)
    return vjp(reflect_pad_adjoint(g, pad).astype(g.dtype))


block_tail_fused.defvjp(_fwd, _bwd)
