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

Gradients: custom VJP — Pallas forward; backward selected by _BWD_IMPL
(default "analytic": the hand-written adjoint chain _analytic_tail_bwd;
"autodiff" = jax.vjp of the XLA composition; "pallas" = two-pass Pallas
backward). The tail is cheap to rematerialize relative to the convs
around it, so every backward recomputes from h.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ducosy_tpu.ops.pallas.instance_norm import (
    EPS,
    pallas_available,
    reflect_fold_hw,
    reflect_pad_adjoint,
    reflect_pad_hw,
)

SA_KERNEL = 7  # reference SpatialAttention kernel_size (modules/model.py:29)


def _kernel(h_ref, x_ref, w1_ref, w2_ref, wsa_ref, o_ref, *,
            eps: float, pad: int, x_pad: int):
    # conv_in._tail_math is this same IN+CBAM+skip body with the conv
    # folded in — kept separate on purpose: here t arrives as a bf16 HBM
    # tensor so the normalize runs in io dtype, there it IS the fp32 conv
    # accumulator and the whole tail stays fp32. A fix to the gate/pool
    # math must land in BOTH (parity tests cover each against the module).
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
    vspace = pl.ANY if interpret else pltpu.VMEM
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


def _bwd_stats_kernel(h_ref, g_ref, w1_ref, w2_ref, stats_ref, vec_ref, *,
                      eps: float, pad: int):
    """Backward pass 1: recompute the forward chain from h and export the
    SMALL per-sample quantities the spatial-gate adjoint needs — sa_avg,
    sa_max, dgs = sum_c(g*t) as (3, H, W) f32 maps plus (avg, mx, gate_c)
    as (3, C) f32 vectors. The 7x7 convs (forward gate + transpose conv +
    weight grad) then run on these small maps in XLA between the two
    kernels: a monolithic kernel holding the tap loops next to the big
    (H, W, C) chains OOM'd VMEM with ~79 MB of register spills."""
    from ducosy_tpu.ops.pallas.instance_norm import reflect_fold_hw

    h = h_ref[0]                                  # (H, W, C), io dtype
    hh, ww, c = h.shape
    count = hh * ww
    g = g_ref[0]
    if pad:
        g = reflect_fold_hw(g, pad, h_axis=0)     # (H, W, C), io dtype

    s = jnp.sum(h, axis=(0, 1), dtype=jnp.float32)
    sq = jnp.sum(jnp.square(h), axis=(0, 1), dtype=jnp.float32)
    mean = s / count
    var = jnp.maximum(sq / count - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = (h - mean.astype(h.dtype)) * inv.astype(h.dtype)         # (H, W, C)

    avg = jnp.sum(y, axis=(0, 1), dtype=jnp.float32) / count     # (C,)
    mx = jnp.max(y, axis=(0, 1)).astype(jnp.float32)             # (C,)
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    hid = jnp.maximum(
        jnp.dot(jnp.stack([avg, mx]), w1,
                preferred_element_type=jnp.float32), 0.0)        # (2, R)
    gates = jnp.dot(hid, w2, preferred_element_type=jnp.float32)
    gate_c = jax.nn.sigmoid(gates[0] + gates[1])                 # (C,)
    t = y * gate_c.astype(y.dtype)[None, None, :]                # (H, W, C)

    sa_avg = jnp.sum(t, axis=-1, dtype=jnp.float32) / c          # (H, W)
    sa_max = jnp.max(t, axis=-1).astype(jnp.float32)             # (H, W)
    dgs = jnp.sum(g * t, axis=-1, dtype=jnp.float32)             # (H, W)
    stats_ref[0] = jnp.stack([sa_avg, sa_max, dgs]).astype(stats_ref.dtype)
    vec_ref[0] = jnp.stack([avg, mx, gate_c]).astype(vec_ref.dtype)


def _bwd_apply_kernel(h_ref, g_ref, w1_ref, w2_ref, maps_ref, vec_ref,
                      dh_ref, dw1_ref, dw2_ref, *,
                      eps: float, pad: int):
    """Backward pass 2: consume the XLA-computed spatial-gate pieces
    (gs, dm_avg, dm_max as (3, H, W) f32 maps + sa_max re-imported in
    maps_ref[3]) and finish the analytic VJP: dt, channel-gate adjoint
    (MLP + pool adjoints with JAX's equal tie split), InstanceNorm adjoint.
    No 7x7 tap loops live here. The masked pool adjoints multiply the mask
    BEFORE dividing by the tie count — the reverse order miscompiles in
    interpret mode (wrong values at argmax positions)."""
    from ducosy_tpu.ops.pallas.instance_norm import reflect_fold_hw

    h = h_ref[0]                                  # (H, W, C), io dtype
    hh, ww, c = h.shape
    count = hh * ww
    g = g_ref[0]
    if pad:
        g = reflect_fold_hw(g, pad, h_axis=0)     # (H, W, C), io dtype

    s = jnp.sum(h, axis=(0, 1), dtype=jnp.float32)
    sq = jnp.sum(jnp.square(h), axis=(0, 1), dtype=jnp.float32)
    mean = s / count
    var = jnp.maximum(sq / count - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = (h - mean.astype(h.dtype)) * inv.astype(h.dtype)         # (H, W, C)

    w1 = w1_ref[...]
    w2 = w2_ref[...]
    avg = vec_ref[0, 0]                                          # (C,) f32
    mx = vec_ref[0, 1]
    gate_c = vec_ref[0, 2]
    pre = jnp.dot(jnp.stack([avg, mx]), w1,
                  preferred_element_type=jnp.float32)            # (2, R)
    hid = jnp.maximum(pre, 0.0)
    t = y * gate_c.astype(y.dtype)[None, None, :]                # (H, W, C)

    gs = maps_ref[0, 0]                                          # (H, W) f32
    dm_avg = maps_ref[0, 1]
    dm_max = maps_ref[0, 2]
    sa_max = maps_ref[0, 3]
    io = h.dtype
    gs_io = gs[:, :, None].astype(io)

    mmask = (t.astype(jnp.float32) == sa_max[:, :, None]).astype(io)
    mcnt = jnp.sum(mmask, axis=-1, keepdims=True, dtype=jnp.float32)
    dt = (g * gs_io
          + (dm_avg[:, :, None] / c).astype(io)
          + mmask * (dm_max[:, :, None]).astype(io)
          / mcnt.astype(io))                                     # (H,W,C) io

    # ---- channel-gate adjoint
    dgc = jnp.sum(dt * y, axis=(0, 1), dtype=jnp.float32)        # (C,)
    da = dgc * gate_c * (1.0 - gate_c)                           # (C,)
    dhid = jnp.dot(jnp.stack([da, da]), w2.T,
                   preferred_element_type=jnp.float32)           # (2, R)
    dhid = dhid * (pre > 0)
    dpool = jnp.dot(dhid, w1.T, preferred_element_type=jnp.float32)  # (2, C)
    dw1_ref[0] = (jnp.outer(avg, dhid[0])
                  + jnp.outer(mx, dhid[1])).astype(dw1_ref.dtype)
    dw2_ref[0] = (jnp.outer(hid[0], da)
                  + jnp.outer(hid[1], da)).astype(dw2_ref.dtype)
    ymask = (y.astype(jnp.float32) == mx[None, None, :]).astype(io)
    ycnt = jnp.sum(ymask, axis=(0, 1), keepdims=True,
                   dtype=jnp.float32)                            # (1,1,C)
    dy = (dt * gate_c.astype(io)[None, None, :]
          + (dpool[0] / count).astype(io)[None, None, :]
          + dpool[1].astype(io)[None, None, :] * ymask
          / ycnt[0, 0].astype(io)[None, None, :])

    # ---- InstanceNorm adjoint (layernorm-style analytic expression)
    mg = jnp.sum(dy, axis=(0, 1), keepdims=True,
                 dtype=jnp.float32) / count
    mgy = jnp.sum(dy * y, axis=(0, 1), keepdims=True,
                  dtype=jnp.float32) / count
    dh = ((dy - mg.astype(io)) - y * mgy.astype(io)) \
        * inv.astype(io)[None, None, :]
    dh_ref[0] = dh.astype(dh_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "pad", "x_pad", "interpret"))
def block_tail_bwd_pallas(h, g, w1, w2, wsa, *, eps: float = EPS,
                          pad: int = 0, x_pad: int = 0,
                          interpret: bool = False):
    """VJP of block_tail_pallas as two fused passes with the 7x7 conv
    adjoints (forward gate, transpose conv, weight grad) on (H, W) maps in
    XLA between them. Returns cotangents (dh, dx, dw1, dw2, dwsa) matching
    the primal shapes/dtypes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, hh, ww, c = h.shape
    r = w1.shape[1]
    vspace = pl.ANY if interpret else pltpu.VMEM
    w1f = w1.astype(jnp.float32)
    w2f = w2.astype(jnp.float32)

    stats, vec = pl.pallas_call(
        functools.partial(_bwd_stats_kernel, eps=eps, pad=pad),
        out_shape=(
            jax.ShapeDtypeStruct((n, 3, hh, ww), jnp.float32),
            jax.ShapeDtypeStruct((n, 3, c), jnp.float32),
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hh, ww, c), lambda i: (i, 0, 0, 0),
                         memory_space=vspace),
            pl.BlockSpec((1, hh + 2 * pad, ww + 2 * pad, c),
                         lambda i: (i, 0, 0, 0), memory_space=vspace),
            pl.BlockSpec((c, r), lambda i: (0, 0), memory_space=vspace),
            pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=vspace),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=vspace),
            pl.BlockSpec((1, 3, c), lambda i: (i, 0, 0),
                         memory_space=vspace),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(h, g, w1f, w2f)

    # ---- spatial-gate adjoint on the small maps, plain XLA
    sa_avg, sa_max, dgs = stats[:, 0], stats[:, 1], stats[:, 2]
    stat = jnp.stack([sa_avg, sa_max], axis=-1)          # (N, H, W, 2)
    z, conv_vjp = jax.vjp(
        lambda s_, w_: jax.lax.conv_general_dilated(
            s_, w_, (1, 1), [(SA_KERNEL // 2,) * 2] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        stat, wsa.astype(jnp.float32))
    gs = jax.nn.sigmoid(z[..., 0])                       # (N, H, W)
    dz = dgs * gs * (1.0 - gs)
    dstat, dwsa32 = conv_vjp(dz[..., None])
    dwsa_out = dwsa32.astype(wsa.dtype)
    maps = jnp.stack([gs, dstat[..., 0], dstat[..., 1],
                      sa_max], axis=1)                   # (N, 4, H, W)

    dh, dw1, dw2 = pl.pallas_call(
        functools.partial(_bwd_apply_kernel, eps=eps, pad=pad),
        out_shape=(
            jax.ShapeDtypeStruct((n, hh, ww, c), h.dtype),
            jax.ShapeDtypeStruct((n, c, r), jnp.float32),
            jax.ShapeDtypeStruct((n, r, c), jnp.float32),
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hh, ww, c), lambda i: (i, 0, 0, 0),
                         memory_space=vspace),
            pl.BlockSpec((1, hh + 2 * pad, ww + 2 * pad, c),
                         lambda i: (i, 0, 0, 0), memory_space=vspace),
            pl.BlockSpec((c, r), lambda i: (0, 0), memory_space=vspace),
            pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=vspace),
            pl.BlockSpec((1, 4, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=vspace),
            pl.BlockSpec((1, 3, c), lambda i: (i, 0, 0),
                         memory_space=vspace),
        ],
        out_specs=(
            pl.BlockSpec((1, hh, ww, c), lambda i: (i, 0, 0, 0),
                         memory_space=vspace),
            pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                         memory_space=vspace),
            pl.BlockSpec((1, r, c), lambda i: (i, 0, 0),
                         memory_space=vspace),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024),
    )(h, g, w1f, w2f, maps, vec)
    dw1 = jnp.sum(dw1, axis=0).astype(w1.dtype)
    dw2 = jnp.sum(dw2, axis=0).astype(w2.dtype)
    # dx is just the pad-folded cotangent re-embedded (zero border when the
    # skip input arrived reflect-padded) — plain XLA, not worth a window in
    # the VMEM-tight apply kernel
    gc_ = reflect_pad_adjoint(g.astype(jnp.float32), pad).astype(h.dtype)
    dx = jnp.pad(gc_, ((0, 0), (x_pad, x_pad), (x_pad, x_pad), (0, 0))) \
        if x_pad else gc_
    return dh, dx, dw1, dw2, dwsa_out


def _analytic_tail_bwd(h, w1, w2, wsa, g, eps, pad, x_pad, x_dtype=None):
    """Hand-written analytic VJP of the tail composition (same math as
    jax.vjp(_xla_block_tail), incl. equal tie-splitting on both max-pool
    adjoints), engineered for TPU:

    - the reflect-pad fold is static slices + adds + concat
      (reflect_fold_hw) — `.at[].add` lowers to scatter-add, which is the
      single slowest op in the autodiff backward on this toolchain;
    - big (N, H, W, C) intermediates stay in the io dtype (the forward
      itself computes y/t in io dtype); every reduction accumulates fp32;
    - no recompute-graph autodiff bookkeeping: one explicit chain, which
      XLA fuses into ~a dozen traversals instead of ~40.

    Measured (scripts/profile_trunk_bwd_micro.py, batch 8 x 128^2 x 256
    bf16): autodiff-of-composition 4.94 ms/block -> see docs/PERF.md
    round-3 addendum for this path's number.
    """
    io = h.dtype
    n, hh, ww, c = h.shape
    count = hh * ww
    w1f = w1.astype(jnp.float32)
    w2f = w2.astype(jnp.float32)
    g = g.astype(io)
    if pad:
        g = reflect_fold_hw(g, pad, h_axis=1)                # (N, H, W, C)

    # ---- recompute the forward chain (stats fp32, y/t in io dtype)
    s = jnp.sum(h, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    sq = jnp.sum(jnp.square(h.astype(jnp.float32)), axis=(1, 2),
                 keepdims=True)
    mean = s / count
    var = jnp.maximum(sq / count - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)                           # (N, 1, 1, C)
    y = (h - mean.astype(io)) * inv.astype(io)               # (N, H, W, C)

    avg = jnp.sum(y, axis=(1, 2), dtype=jnp.float32) / count  # (N, C)
    mx32 = jnp.max(y, axis=(1, 2)).astype(jnp.float32)         # (N, C)
    pre = jnp.einsum("nbc,cr->nbr", jnp.stack([avg, mx32], axis=1), w1f,
                     preferred_element_type=jnp.float32)     # (N, 2, R)
    hid = jnp.maximum(pre, 0.0)
    gates = jnp.einsum("nbr,rc->nbc", hid, w2f,
                       preferred_element_type=jnp.float32)   # (N, 2, C)
    gate_c = jax.nn.sigmoid(gates[:, 0] + gates[:, 1])       # (N, C)
    t = y * gate_c.astype(io)[:, None, None, :]              # (N, H, W, C)

    sa_avg = jnp.sum(t, axis=-1, keepdims=True,
                     dtype=jnp.float32) / c                  # (N, H, W, 1)
    sa_max = jnp.max(t, axis=-1, keepdims=True).astype(jnp.float32)
    stat = jnp.concatenate([sa_avg, sa_max], axis=-1)        # (N, H, W, 2)
    z, conv_vjp = jax.vjp(
        lambda s_, w_: jax.lax.conv_general_dilated(
            s_, w_, (1, 1), [(SA_KERNEL // 2,) * 2] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        stat, wsa.astype(jnp.float32))
    gs = jax.nn.sigmoid(z)                                   # (N, H, W, 1)

    # ---- adjoint
    # spatial gate: dgs needs t; the 7x7 conv adjoint runs on (H, W) maps
    dt = g * gs.astype(io)
    dgs = jnp.sum((g * t).astype(jnp.float32), axis=-1, keepdims=True)
    dz = dgs * gs * (1.0 - gs)                               # (N, H, W, 1)
    dstat, dwsa32 = conv_vjp(dz)
    mmask = (t.astype(jnp.float32) == sa_max).astype(io)
    mcnt = jnp.sum(mmask, axis=-1, keepdims=True, dtype=jnp.float32)
    dt = (dt + (dstat[..., :1] / c).astype(io)
          + mmask * (dstat[..., 1:] / mcnt).astype(io))      # (N, H, W, C)

    # channel gate: shared bottleneck MLP, per-branch ReLU masks
    dgc = jnp.sum((dt * y).astype(jnp.float32), axis=(1, 2))  # (N, C)
    da = dgc * gate_c * (1.0 - gate_c)                        # (N, C)
    dhid = jnp.einsum("nc,rc->nr", da, w2f,
                      preferred_element_type=jnp.float32)     # (N, R)
    dhid = dhid[:, None, :] * (pre > 0)                       # (N, 2, R)
    dpool = jnp.einsum("nbr,cr->nbc", dhid, w1f,
                       preferred_element_type=jnp.float32)    # (N, 2, C)
    dw1 = (jnp.einsum("nc,nr->cr", avg, dhid[:, 0])
           + jnp.einsum("nc,nr->cr", mx32, dhid[:, 1]))
    dw2 = jnp.einsum("nr,nc->rc", hid[:, 0] + hid[:, 1], da)
    ymask = (y.astype(jnp.float32) == mx32[:, None, None, :]).astype(io)
    ycnt = jnp.sum(ymask, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    dy = (dt * gate_c.astype(io)[:, None, None, :]
          + (dpool[:, 0] / count).astype(io)[:, None, None, :]
          + ymask * (dpool[:, 1][:, None, None, :] / ycnt).astype(io))

    # InstanceNorm adjoint (layernorm-style analytic expression)
    mg = jnp.sum(dy.astype(jnp.float32), axis=(1, 2),
                 keepdims=True) / count
    mgy = jnp.sum((dy * y).astype(jnp.float32), axis=(1, 2),
                  keepdims=True) / count
    dh = ((dy - mg.astype(io)) - y * mgy.astype(io)) * inv.astype(io)

    dx = g
    if x_pad:
        dx = jnp.pad(g, ((0, 0), (x_pad, x_pad), (x_pad, x_pad), (0, 0)))
    # the cotangent for x must carry x's dtype (may differ from h's)
    dx = dx.astype(x_dtype if x_dtype is not None else h.dtype)
    return (dh.astype(h.dtype), dx, dw1.astype(w1.dtype),
            dw2.astype(w2.dtype), dwsa32.astype(wsa.dtype))


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
    TPU, XLA elsewhere; differentiable (backward per _BWD_IMPL, default
    the hand-written analytic adjoint _analytic_tail_bwd). With x_pad=p
    the skip input arrives reflect-padded by p and only its interior is
    used (zero gradient to the border)."""
    if pallas_available():
        return block_tail_pallas(h, x, w1, w2, wsa, eps=eps, pad=pad,
                                 x_pad=x_pad)
    return _xla_block_tail(h, x, w1, w2, wsa, eps, pad, x_pad)


def _fwd(h, x, w1, w2, wsa, eps, pad, x_pad):
    return (block_tail_fused(h, x, w1, w2, wsa, eps, pad, x_pad),
            (h, x, w1, w2, wsa))


# Backward implementation switch:
#   "analytic" — hand-written adjoint chain (_analytic_tail_bwd): no
#                scatter-add pad fold, io-dtype big tensors / fp32
#                reductions, no autodiff bookkeeping. Round-3 default.
#   "autodiff" — jax.vjp of the XLA composition (round-2 default; the
#                scatter-add pad fold + fp32 recompute made it the single
#                hottest op group in the train step: 4.94 ms/block vs
#                0.44 ms forward, scripts/profile_trunk_bwd_micro.py).
#   "pallas"   — two-pass Pallas backward (block_tail_bwd_pallas).
#                Measured on this toolchain it LOSES to autodiff — 0.931
#                vs 0.879 s/step on the batch-8 512^2 train step
#                (docs/PERF.md): the two passes re-read h/g and re-derive
#                y/t, and the apply kernel carries ~64 MB of register
#                spills. Kept (tested, interpret-mode parity on every
#                pad/x_pad combination) for re-A/B after toolchain changes.
_BWD_IMPL = "analytic"


def _bwd(eps, pad, x_pad, res, g):
    h, x, w1, w2, wsa = res
    if _BWD_IMPL == "pallas" and pallas_available():
        return block_tail_bwd_pallas(h, g, w1, w2, wsa, eps=eps, pad=pad,
                                     x_pad=x_pad)
    if _BWD_IMPL == "analytic":
        return _analytic_tail_bwd(h, w1, w2, wsa, g, eps, pad, x_pad,
                                  x_dtype=x.dtype)
    # unpadded-tail VJP + explicit pad adjoint keeps the recompute graph
    # free of the pad output (saves HBM in the backward)
    _, vjp = jax.vjp(
        lambda *a: _xla_block_tail(*a, eps, 0, x_pad), h, x, w1, w2, wsa)
    return vjp(reflect_pad_adjoint(g, pad).astype(g.dtype))


block_tail_fused.defvjp(_fwd, _bwd)
