"""Mega-fused residual-block kernels: 3x3 conv folded INTO the Pallas
InstanceNorm / block-tail kernels.

The reference residual block (modules/model.py:68-87) is
  t = ReLU(IN(conv1(pad(h)))); out = h + CBAM(IN(conv2(pad(t))))
The packed trunk (models/fused.py, trunk="pallas") already fuses every
op BETWEEN the convs; these kernels remove the remaining HBM boundary by
computing the conv itself inside the kernel — the padded activation is
read from HBM once, the nine shifted (HW, Cin) x (Cin, Cout) taps run on
the MXU from VMEM, and the InstanceNorm statistics are taken straight off
the fp32 accumulator without ever materializing the conv result in HBM:

  conv3x3_in_fused:   IN(conv_VALID(hp)) + ReLU, next reflect-pad folded
                      into the output write.
  conv_block_tail_fused: h + CBAM(IN(conv_VALID(tp))) — the entire second
                      half of a residual block (conv2 + IN + channel gate
                      + spatial gate + skip-add + next pad) in one pass.
  residual_block_fused: the WHOLE block as ONE kernel (the two above
                      back-to-back); the intermediate activation lives
                      only in VMEM — one HBM read and one write per block.
                      Engine A/B (scripts/ab_mono.py): 111.9 -> 115.5
                      slices/s (+3.3%) over the two-kernel path,
                      bit-identical output.

Conv biases are intentionally ABSENT from both kernels: InstanceNorm
subtracts the per-(sample, channel) mean, so a per-channel additive
constant is exactly a no-op — the .pth biases are simply not loaded into
this path (parity holds to bf16 rounding, tests/test_conv_in.py).

Per-sample VMEM at trunk shape (130, 130, 256) bf16: ~8.6 MB in + ~8.6 MB
out + 1.2 MB weights (+8.6 MB skip carry for the tail) — double-buffered
well under the 128 MB cap; the grid is (N,).

Measured (v5e, slope method, docs/PERF.md round-2 addendum): whole
residual block 11.27 ms -> 9.43 ms at batch 32 x 128^2 x 256 (1.195x),
2.67 -> 2.33 ms at batch 8 (conv1+IN only; the tail kernel wins only at
batch 32). Inference-only: no custom VJP — the training step keeps the
conv outside the kernel so XLA autodiff handles it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ducosy_tpu.ops.pallas.cbam_block import SA_KERNEL as _SA_K
from ducosy_tpu.ops.pallas.instance_norm import (
    EPS,
    INT8_GRID,
    INT8_NORM_SCALE,
    INT8_ZERO_POINT,
    pallas_available,
    quantize_weights_int8,
    reflect_pad_hw,
)


def _conv_taps(xp, w_ref, hh, ww):
    """9-tap shifted-matmul 3x3 VALID conv on the MXU; returns the fp32
    (HH*WW, Cout) accumulator — or the exact int32 accumulator when both
    operands are int8 (the v5e's int8 MXU path, ~1.6x bf16). xp:
    (HH+2, WW+2, Cin) VMEM block; w_ref holds the (9*Cin, Cout) flattened
    HWIO kernel."""
    cin = xp.shape[-1]
    w = w_ref[...]
    cout = w.shape[1]
    acc_t = jnp.int32 if xp.dtype == jnp.int8 else jnp.float32
    acc = jnp.zeros((hh * ww, cout), acc_t)
    for di in range(3):
        slab = xp[di:di + hh]                  # slice on the untiled axis
        for dj in range(3):
            s = slab[:, dj:dj + ww, :].reshape(hh * ww, cin)
            tap = w[(di * 3 + dj) * cin:(di * 3 + dj + 1) * cin]
            acc = acc + jnp.dot(s, tap, preferred_element_type=acc_t)
    return acc


def _in_stats(acc, count, eps):
    mean = jnp.sum(acc, axis=0, keepdims=True) / count
    var = jnp.maximum(
        jnp.sum(jnp.square(acc - mean), axis=0, keepdims=True) / count, 0.0)
    return (acc - mean) * jax.lax.rsqrt(var + eps)


def _conv_in_kernel(x_ref, w_ref, o_ref, *, relu, eps, pad, int8_scale):
    xp = x_ref[0]
    hp_, wp_, _ = xp.shape
    hh, ww = hp_ - 2, wp_ - 2
    acc = _conv_taps(xp, w_ref, hh, ww)
    # stats in fp32 always: an int32 accumulator would overflow _in_stats'
    # int32 sum at trunk shapes (9*256*127*128 per pixel * 128^2 positions
    # >> 2^31); IN is invariant to the int8 grid's affine map so fp32
    # stats of the int accumulator are exact (same as _tail_math).
    y = _in_stats(acc.astype(jnp.float32), hh * ww, eps)
    if relu:
        y = jnp.maximum(y, 0.0)
    y = y.reshape(hh, ww, -1)
    if int8_scale is not None:
        # quantized serving: emit SHIFTED-grid int8 at the static post-norm
        # scale so the consuming tail kernel runs its taps on the int8 MXU
        # path. y >= 0 (relu required), so trunc of y*k + 0.5 IS
        # round-half-up; the trunc happens on the non-negative value
        # BEFORE the -128 shift (instance_norm.py grid semantics).
        # Quantize BEFORE the pad: the reflect pad then copies int8 rows
        # (exact, and a quarter of the fp32 traffic).
        k = jnp.float32(INT8_GRID / int8_scale)
        q = jnp.minimum(y * k + jnp.float32(0.5), jnp.float32(INT8_GRID))
        y = (q.astype(jnp.int32) - INT8_ZERO_POINT).astype(jnp.int8)
    else:
        y = y.astype(o_ref.dtype)
    if pad:
        y = reflect_pad_hw(y, pad, h_axis=0)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "eps", "pad",
                                             "int8_scale", "interpret"))
def conv3x3_in_pallas(xp, w, *, relu=True, eps=EPS, pad=1, int8_scale=None,
                      interpret=False):
    """ReLU(IN(conv_VALID(xp, w))), reflect-padded by ``pad``.

    xp: (N, H+2, W+2, Cin) pre-padded activation; w: (3, 3, Cin, Cout)
    HWIO. No bias argument — see module docstring. ``int8_scale`` emits
    the output on the shifted int8 grid (requires relu=True) for the
    quantized mega trunk."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if int8_scale is not None:
        assert relu, "int8_scale requires relu=True (non-negative outputs)"
    n, hp_, wp_, cin = xp.shape
    hh, ww = hp_ - 2, wp_ - 2
    cout = w.shape[-1]
    if xp.dtype == jnp.int8:
        # int8 activations need pre-quantized int8 weights — astype would
        # VALUE-TRUNCATE float weights, not quantize them
        assert w.dtype == jnp.int8, "int8 input requires int8 weights"
    wf = w.reshape(9 * cin, cout).astype(xp.dtype)
    vspace = pl.ANY if interpret else pltpu.VMEM
    out_dtype = jnp.int8 if int8_scale is not None else xp.dtype
    return pl.pallas_call(
        functools.partial(_conv_in_kernel, relu=relu, eps=eps, pad=pad,
                          int8_scale=int8_scale),
        out_shape=jax.ShapeDtypeStruct(
            (n, hh + 2 * pad, ww + 2 * pad, cout), out_dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp_, wp_, cin), lambda i: (i, 0, 0, 0),
                         memory_space=vspace),
            pl.BlockSpec((9 * cin, cout), lambda i: (0, 0),
                         memory_space=vspace),
        ],
        out_specs=pl.BlockSpec((1, hh + 2 * pad, ww + 2 * pad, cout),
                               lambda i: (i, 0, 0, 0), memory_space=vspace),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(xp, wf)


def _tail_math(tp, x, w_ref, w1_ref, w2_ref, wsa_ref, io, *, eps, pad,
               x_pad, wsa_off=0):
    """x(interior) + CBAM(IN(conv_VALID(tp)))(+pad) on VMEM values — the
    shared body of the tail kernel and the mono-block kernel. tp is the
    padded conv input; x the residual carry (reflect-padded by x_pad)."""
    hp_, wp_, _ = tp.shape
    hh, ww = hp_ - 2, wp_ - 2
    count = hh * ww
    acc = _conv_taps(tp, w_ref, hh, ww)
    # int8 inputs: the exact int32 accumulator goes STRAIGHT into the IN
    # statistics — InstanceNorm is invariant to per-channel affine maps,
    # so the weight-quantization scale ws_c AND the shifted grid's
    # 128*sum(wq)_c zero-point constant are absorbed exactly by the mean
    # subtraction / rsqrt(var); no dequantization exists anywhere.
    y = _in_stats(acc.astype(jnp.float32), count, eps).astype(io)  # (HW, C)
    c = y.shape[1]

    # channel gate: shared bottleneck MLP over [avg, max] pools
    # (modules/model.py:6-24); both pools ride the same (2, C) matmul.
    avg = jnp.sum(y, axis=0, dtype=jnp.float32) / count
    mx = jnp.max(y, axis=0).astype(jnp.float32)
    hid = jnp.maximum(
        jnp.dot(jnp.stack([avg, mx]), w1_ref[...],
                preferred_element_type=jnp.float32), 0.0)
    gates = jnp.dot(hid, w2_ref[...], preferred_element_type=jnp.float32)
    gate_c = jax.nn.sigmoid(gates[0] + gates[1])             # (C,)
    t = (y * gate_c.astype(io)[None, :]).reshape(hh, ww, c)

    # spatial gate: 7x7 conv over [channel-mean, channel-max] with zero
    # ("same") padding (modules/model.py:27-39); the 98 taps are scalars
    # in SMEM driving VPU shifted adds.
    p = _SA_K // 2
    sa_avg = jnp.sum(t, axis=-1, dtype=jnp.float32) / c
    sa_max = jnp.max(t, axis=-1).astype(jnp.float32)

    def zero_pad(a):
        zr = jnp.zeros((p, a.shape[1]), a.dtype)
        a = jnp.concatenate([zr, a, zr], axis=0)
        zc = jnp.zeros((a.shape[0], p), a.dtype)
        return jnp.concatenate([zc, a, zc], axis=1)

    avg_p = zero_pad(sa_avg)
    max_p = zero_pad(sa_max)
    sacc = jnp.zeros((hh, ww), jnp.float32)
    for di in range(_SA_K):
        for dj in range(_SA_K):
            wa = wsa_ref[wsa_off + di * _SA_K + dj]
            wm = wsa_ref[wsa_off + _SA_K * _SA_K + di * _SA_K + dj]
            sacc += (wa * avg_p[di:di + hh, dj:dj + ww]
                     + wm * max_p[di:di + hh, dj:dj + ww])
    gate_s = jax.nn.sigmoid(sacc)[:, :, None].astype(io)

    if x_pad:
        x = x[x_pad:x_pad + hh, x_pad:x_pad + ww]
    out = x + t * gate_s
    if pad:
        out = reflect_pad_hw(out, pad, h_axis=0)
    return out.astype(io)


def _conv_tail_kernel(t_ref, x_ref, w_ref, w1_ref, w2_ref, wsa_ref, o_ref,
                      *, eps, pad, x_pad):
    o_ref[0] = _tail_math(t_ref[0], x_ref[0], w_ref, w1_ref, w2_ref,
                          wsa_ref, o_ref.dtype, eps=eps, pad=pad,
                          x_pad=x_pad)


@functools.partial(jax.jit, static_argnames=("eps", "pad", "x_pad",
                                             "in_int8", "interpret"))
def conv_block_tail_pallas(tp, x, w, w1, w2, wsa, *, eps=EPS, pad=1,
                           x_pad=1, in_int8=False, interpret=False):
    """x(interior) + CBAM(IN(conv_VALID(tp, w))), reflect-padded by
    ``pad``. tp: (N, H+2, W+2, Cin) pre-padded conv input; x: the
    residual carry, reflect-padded by ``x_pad`` (only its interior is
    read). w1/w2: channel-MLP (C, r)/(r, C); wsa: (7, 7, 2, 1) HWIO.

    ``in_int8``: tp is shifted-grid int8 (conv3x3_in_pallas's int8_scale
    write); the 9 conv taps then run int8 x int8 -> exact int32 on the
    MXU with symmetric per-output-channel int8 weights quantized here
    in-graph (loop-invariant under lax.map). Neither the weight scale nor
    the activation scale/zero-point enters the kernel: the conv feeds an
    InstanceNorm, which absorbs any per-channel affine map exactly."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, hp_, wp_, cin = tp.shape
    hh, ww = hp_ - 2, wp_ - 2
    c = w.shape[-1]
    if in_int8:
        assert tp.dtype == jnp.int8, tp.dtype
        wf, _ = quantize_weights_int8(w.reshape(9 * cin, c))
    else:
        wf = w.reshape(9 * cin, c).astype(tp.dtype)
    wsa_flat = wsa.reshape(_SA_K * _SA_K, 2).T.reshape(-1).astype(
        jnp.float32)
    vspace = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        functools.partial(_conv_tail_kernel, eps=eps, pad=pad, x_pad=x_pad),
        out_shape=jax.ShapeDtypeStruct(
            (n, hh + 2 * pad, ww + 2 * pad, c), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp_, wp_, cin), lambda i: (i, 0, 0, 0),
                         memory_space=vspace),
            pl.BlockSpec((1, hh + 2 * x_pad, ww + 2 * x_pad, c),
                         lambda i: (i, 0, 0, 0), memory_space=vspace),
            pl.BlockSpec((9 * cin, c), lambda i: (0, 0),
                         memory_space=vspace),
            pl.BlockSpec((c, w1.shape[1]), lambda i: (0, 0),
                         memory_space=vspace),
            pl.BlockSpec((w2.shape[0], c), lambda i: (0, 0),
                         memory_space=vspace),
            pl.BlockSpec((2 * _SA_K * _SA_K,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, hh + 2 * pad, ww + 2 * pad, c),
                               lambda i: (i, 0, 0, 0), memory_space=vspace),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(tp, x, wf, w1.astype(jnp.float32), w2.astype(jnp.float32), wsa_flat)


def _residual_block_kernel(x_ref, wa_ref, wb_ref, w1_ref, w2_ref, wsa_ref,
                           o_ref, *, eps, pad, quant):
    xp = x_ref[0]
    hp_, wp_, c = xp.shape
    hh, ww = hp_ - 2, wp_ - 2
    acc = _conv_taps(xp, wa_ref, hh, ww)
    y = jnp.maximum(_in_stats(acc.astype(jnp.float32), hh * ww, eps), 0.0)
    if quant:
        # int8 MXU taps for conv2: quantize the VMEM-resident intermediate
        # onto the shifted grid (never touches HBM; the tail's IN absorbs
        # the affine exactly — same math as the two-kernel quant path).
        k = jnp.float32(INT8_GRID / INT8_NORM_SCALE)
        q = jnp.minimum(y * k + jnp.float32(0.5), jnp.float32(INT8_GRID))
        y = (q.astype(jnp.int32) - INT8_ZERO_POINT).astype(jnp.int8)
    else:
        y = y.astype(xp.dtype)
    tp = reflect_pad_hw(y.reshape(hh, ww, c), 1, h_axis=0)
    o_ref[0] = _tail_math(tp, xp, wb_ref, w1_ref, w2_ref, wsa_ref,
                          o_ref.dtype, eps=eps, pad=pad, x_pad=1)


@functools.partial(jax.jit, static_argnames=("eps", "pad", "quant",
                                             "interpret"))
def residual_block_pallas(xp, wa, wb, w1, w2, wsa, *, eps=EPS, pad=1,
                          quant=False, interpret=False):
    """One ENTIRE residual block (modules/model.py:68-87) in a single
    Pallas kernel: conv1+IN+ReLU+pad -> conv2+IN+CBAM+skip(+pad), with the
    intermediate activation living only in VMEM — one HBM read (the padded
    carry) and one write (the padded output) per block, vs two of each for
    the two-kernel mega path.

    xp: (N, H+2, W+2, C) reflect-padded carry; wa/wb: (3, 3, C, C) HWIO;
    w1/w2/wsa: CBAM weights. ``quant``: conv2's taps run int8 x int8 on
    the MXU from an in-register shifted-grid quantization of the
    intermediate (the carry read and conv1 stay bf16)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, hp_, wp_, c = xp.shape
    hh, ww = hp_ - 2, wp_ - 2
    wfa = wa.reshape(9 * c, c).astype(xp.dtype)
    if quant:
        wfb, _ = quantize_weights_int8(wb.reshape(9 * c, c))
    else:
        wfb = wb.reshape(9 * c, c).astype(xp.dtype)
    wsa_flat = wsa.reshape(_SA_K * _SA_K, 2).T.reshape(-1).astype(
        jnp.float32)
    vspace = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        functools.partial(_residual_block_kernel, eps=eps, pad=pad,
                          quant=quant),
        out_shape=jax.ShapeDtypeStruct(
            (n, hh + 2 * pad, ww + 2 * pad, c), xp.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp_, wp_, c), lambda i: (i, 0, 0, 0),
                         memory_space=vspace),
            pl.BlockSpec((9 * c, c), lambda i: (0, 0), memory_space=vspace),
            pl.BlockSpec((9 * c, c), lambda i: (0, 0), memory_space=vspace),
            pl.BlockSpec((c, w1.shape[1]), lambda i: (0, 0),
                         memory_space=vspace),
            pl.BlockSpec((w2.shape[0], c), lambda i: (0, 0),
                         memory_space=vspace),
            pl.BlockSpec((2 * _SA_K * _SA_K,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, hh + 2 * pad, ww + 2 * pad, c),
                               lambda i: (i, 0, 0, 0), memory_space=vspace),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(xp, wfa, wfb, w1.astype(jnp.float32), w2.astype(jnp.float32),
      wsa_flat)


def residual_block_fused(xp, wa, wb, w1, w2, wsa, *, eps=EPS, pad=1,
                         quant=False):
    """Pallas on TPU, XLA composition elsewhere (CPU tests)."""
    if pallas_available():
        return residual_block_pallas(xp, wa, wb, w1, w2, wsa, eps=eps,
                                     pad=pad, quant=quant)
    scale = INT8_NORM_SCALE if quant else None
    t = _xla_conv_in(xp, wa, relu=True, eps=eps, pad=1, int8_scale=scale)
    return _xla_conv_tail(t, xp, wb, w1, w2, wsa, eps=eps, pad=pad,
                          x_pad=1, in_int8_scale=scale)


def _residual_chain_kernel(x_ref, wa_ref, wb_ref, w1_ref, w2_ref, wsa_ref,
                           o_ref, *, eps, pad, quant, nblocks):
    hp = x_ref[0]
    c = hp.shape[-1]
    io = o_ref.dtype
    for j in range(nblocks):
        hh, ww = hp.shape[0] - 2, hp.shape[1] - 2
        acc = _conv_taps(hp, wa_ref[j], hh, ww)
        y = jnp.maximum(_in_stats(acc.astype(jnp.float32), hh * ww, eps),
                        0.0)
        if quant:
            k = jnp.float32(INT8_GRID / INT8_NORM_SCALE)
            q = jnp.minimum(y * k + jnp.float32(0.5),
                            jnp.float32(INT8_GRID))
            y = (q.astype(jnp.int32) - INT8_ZERO_POINT).astype(jnp.int8)
        else:
            y = y.astype(io)
        tp = reflect_pad_hw(y.reshape(hh, ww, c), 1, h_axis=0)
        hp = _tail_math(tp, hp, wb_ref[j], w1_ref[j], w2_ref[j], wsa_ref,
                        io, eps=eps,
                        pad=pad if j == nblocks - 1 else 1, x_pad=1,
                        wsa_off=j * 2 * _SA_K * _SA_K)
    o_ref[0] = hp


@functools.partial(jax.jit, static_argnames=("eps", "pad", "quant",
                                             "interpret"))
def residual_chain_pallas(xp, was, wbs, w1s, w2s, wsas, *, eps=EPS, pad=1,
                          quant=False, interpret=False):
    """``k`` consecutive residual blocks (modules/model.py:68-87 each) in
    ONE Pallas kernel — the carry never leaves VMEM between blocks, so a
    chain of k blocks costs
    one HBM read and one write TOTAL (vs k of each for the mono kernel;
    the full 9-block trunk at k=9 reads 8.6 MB and writes 8.6 MB instead
    of ~155 MB of round trips at the (130,130,256) bf16 trunk shape).

    was/wbs: (k, 3, 3, C, C) stacked HWIO conv kernels; w1s: (k, C, R);
    w2s: (k, R, C); wsas: (k, 7, 7, 2, 1). ``pad`` applies to the LAST
    block's output write (inner blocks always re-pad by 1 for the next
    conv). ``quant`` as in residual_block_pallas (conv2 taps int8).

    VMEM scales with the weight stack (k * 2 * 0.6 MB bf16 at 256 ch) plus
    the per-block live set; compile time scales with k (fully unrolled).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, hp_, wp_, c = xp.shape
    hh, ww = hp_ - 2, wp_ - 2
    k, _, _, _, _ = was.shape
    wfa = was.reshape(k, 9 * c, c).astype(xp.dtype)
    if quant:
        wfb = jnp.stack([quantize_weights_int8(wbs[j].reshape(9 * c, c))[0]
                         for j in range(k)])
    else:
        wfb = wbs.reshape(k, 9 * c, c).astype(xp.dtype)
    # per-block flat (avg taps | max taps) rows, concatenated for SMEM
    wsa_flat = wsas.reshape(k, _SA_K * _SA_K, 2).transpose(0, 2, 1) \
        .reshape(-1).astype(jnp.float32)
    r = w1s.shape[2]
    vspace = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        functools.partial(_residual_chain_kernel, eps=eps, pad=pad,
                          quant=quant, nblocks=k),
        out_shape=jax.ShapeDtypeStruct(
            (n, hh + 2 * pad, ww + 2 * pad, c), xp.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp_, wp_, c), lambda i: (i, 0, 0, 0),
                         memory_space=vspace),
            pl.BlockSpec((k, 9 * c, c), lambda i: (0, 0, 0),
                         memory_space=vspace),
            pl.BlockSpec((k, 9 * c, c), lambda i: (0, 0, 0),
                         memory_space=vspace),
            pl.BlockSpec((k, c, r), lambda i: (0, 0, 0),
                         memory_space=vspace),
            pl.BlockSpec((k, r, c), lambda i: (0, 0, 0),
                         memory_space=vspace),
            pl.BlockSpec((k * 2 * _SA_K * _SA_K,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, hh + 2 * pad, ww + 2 * pad, c),
                               lambda i: (i, 0, 0, 0), memory_space=vspace),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(xp, wfa, wfb, w1s.astype(jnp.float32), w2s.astype(jnp.float32),
      wsa_flat)


def residual_chain_fused(xp, was, wbs, w1s, w2s, wsas, *, eps=EPS, pad=1,
                         quant=False):
    """Pallas on TPU, per-block XLA composition elsewhere (CPU tests)."""
    if pallas_available():
        return residual_chain_pallas(xp, was, wbs, w1s, w2s, wsas, eps=eps,
                                     pad=pad, quant=quant)
    k = was.shape[0]
    for j in range(k):
        xp = residual_block_fused(xp, was[j], wbs[j], w1s[j], w2s[j],
                                  wsas[j], eps=eps,
                                  pad=pad if j == k - 1 else 1, quant=quant)
    return xp


def conv3x3_in_fused(xp, w, *, relu=True, eps=EPS, pad=1, int8_scale=None):
    """Pallas on TPU, XLA composition elsewhere (CPU tests)."""
    if pallas_available():
        return conv3x3_in_pallas(xp, w, relu=relu, eps=eps, pad=pad,
                                 int8_scale=int8_scale)
    return _xla_conv_in(xp, w, relu=relu, eps=eps, pad=pad,
                        int8_scale=int8_scale)


def conv_block_tail(tp, x, w, w1, w2, wsa, *, eps=EPS, pad=1, x_pad=1,
                    in_int8_scale=None):
    """Pallas on TPU, XLA composition elsewhere (CPU tests).

    ``in_int8_scale``: tp is shifted-grid int8 produced at this static
    activation scale. The Pallas kernel never uses the scale (the IN
    absorbs every per-channel affine); only the XLA fallback needs it to
    dequantize for the plain conv."""
    if pallas_available():
        return conv_block_tail_pallas(tp, x, w, w1, w2, wsa, eps=eps,
                                      pad=pad, x_pad=x_pad,
                                      in_int8=in_int8_scale is not None)
    return _xla_conv_tail(tp, x, w, w1, w2, wsa, eps=eps, pad=pad,
                          x_pad=x_pad, in_int8_scale=in_int8_scale)


def _xla_conv_in(xp, w, *, relu, eps, pad, int8_scale=None):
    from ducosy_tpu.ops.pallas.instance_norm import (
        instance_norm_fused, instance_norm_int8)
    if int8_scale is not None:
        # fail exactly like the Pallas path (instance_norm_int8 hard-codes
        # relu=True, which would otherwise silently override relu=False)
        assert relu, "int8_scale requires relu=True (non-negative outputs)"
    y = jax.lax.conv_general_dilated(
        xp, w.astype(xp.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if int8_scale is not None:
        return instance_norm_int8(y, eps=eps, pad=pad, scale=int8_scale)
    return instance_norm_fused(y, relu, eps, pad)


def _xla_conv_tail(tp, x, w, w1, w2, wsa, *, eps, pad, x_pad,
                   in_int8_scale=None):
    from ducosy_tpu.ops.pallas.cbam_block import block_tail_fused
    if in_int8_scale is not None:
        # shifted-grid int8 conv with the dequantization as the conv
        # epilogue (fused.py _conv_int8_static semantics); the following
        # IN absorbs the affine anyway, but dequantizing keeps the bf16
        # intermediate well-scaled for block_tail_fused.
        wq, ws = quantize_weights_int8(w, reduce_axes=(0, 1, 2))
        acc = jax.lax.conv_general_dilated(
            tp, wq, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        acc = acc + INT8_ZERO_POINT * jnp.sum(wq.astype(jnp.float32),
                                              axis=(0, 1, 2))
        y = (acc * (ws * (in_int8_scale / INT8_GRID))).astype(x.dtype)
    else:
        y = jax.lax.conv_general_dilated(
            tp, w.astype(tp.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return block_tail_fused(y, x, w1, w2, wsa, eps, pad, x_pad)
