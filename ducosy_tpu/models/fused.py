"""TPU-optimized functional generator forward.

Consumes the exact parameter PyTree of models/generator.Generator (so
checkpoints, .pth imports, and the training state work unchanged) and
computes the same function with a kernel-level reorganization of every
stage that starves the TPU in the naive translation:

  stem    — the 7x7 conv from 1+masks (<8) input channels runs at ~4% MXU
            utilization (contraction dim ~= channel count). Reformulated
            as a space-to-depth conv: s2d(2) the reflect-padded input
            (C -> 4C), one 4x4 conv producing all four output phases
            (contraction 4*4*4C), depth-to-space back. Exact same math,
            ~10x faster at 512^2.
  up1/up2 — nearest-upsample x2 + 3x3 conv never materializes the 4x
            activation: the composition collapses to a 2x2 conv per output
            phase (subpixel decomposition), one conv with 4*Cout channels
            + interleave. 2.25x fewer MACs, one less HBM round-trip (-33%
            measured).
  trunk   — Pallas fused InstanceNorm+ReLU with the next ReflectionPad
            folded into the output write, and a Pallas fused block tail
            (IN + CBAM channel/spatial gates + skip add + next pad) —
            ops/pallas/{instance_norm,cbam_block}.py.
  decoder/encoder norms — XLA IN (fp32 stats); 512^2/256^2 shapes exceed
            single-block VMEM; the two-pass Pallas variant was measured
            at parity with XLA here, so XLA keeps the simpler graph.

Everything is shape-static and jit-friendly; gradients flow (the Pallas
ops carry custom VJPs), so the same forward can power training.

Reference: modules/model.py:90-115 (architecture), README.md:496-519
(the throughput baseline this path is built to beat).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ducosy_tpu.models import layers
from ducosy_tpu.models.layers import EPS_INSTANCE_NORM, prec_for, reflect_pad
from ducosy_tpu.ops.pallas.cbam_block import block_tail_fused
from ducosy_tpu.ops.pallas.conv_in import (conv3x3_in_fused,
                                           conv_block_tail,
                                           residual_block_fused,
                                           residual_chain_fused)
from ducosy_tpu.ops.pallas.instance_norm import (
    INT8_GRID,
    INT8_NORM_SCALE,
    INT8_ZERO_POINT,
    instance_norm_fused,
    instance_norm_int8,
    quantize_weights_int8,
)

# static post-IN+ReLU activation scale for the quantized trunk: post-norm
# values are unit-variance, so a 6-sigma ceiling on the ReLU'd half-normal
# clips ~nothing while using the full int8 grid (value lives with the grid
# constants in ops/pallas/instance_norm.py — the mega/mono kernels share it)
_INT8_NORM_SCALE = INT8_NORM_SCALE

# Phase-grouped Pallas IN window cap (bytes): packed norms whose full-channel
# block is at most this large route through the phase-pooling kernel when
# encoder_fused; larger windows (stem/up2 at 32 MB) exceed Mosaic's scoped
# VMEM and stay on XLA regardless. A/B knob — 0 disables phase fusion.
# DEFAULT 0: at 16 MB the up1 norm fuses and wins +3.9% on the standalone
# batch-8 forward, but LOSES -2.3% on the production engine pipeline
# (batch-32 chunks under lax.map; scripts/ab_engine_phase.py) — the
# full-channel grid serializes over N and the win inverts at engine batch.
# Re-A/B per toolchain/batch; only full-pipeline numbers count.
_PHASE_FUSE_CAP = 0


def _conv(x, kernel, bias=None, *, stride=1, padding="VALID", dtype=None):
    dims = ("NHWC", "HWIO", "NHWC")
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    pad = padding if isinstance(padding, (str, tuple, list)) else padding
    y = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), pad, dimension_numbers=dims,
        precision=prec_for(x.dtype))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _conv_int8(x, kernel, bias=None, *, padding="VALID"):
    """3x3 conv on the int8 MXU path (~1.6x bf16 measured on v5e).

    Weights: symmetric per-output-channel int8 — every trunk conv feeds an
    InstanceNorm, which is invariant to per-channel scaling of its input,
    so the only weight-quantization artifact that survives is the <=2^-8
    rounding noise (the bias is scaled into the same grid implicitly by
    dequantizing before the add). Activations: symmetric per-sample
    dynamic int8 (scale from that sample's amax — trunk activations are
    IN-normalized or residual sums thereof, so the amax is well-behaved).
    Quantization happens in-graph from the regular params; under lax.map
    the weight-side ops are loop-invariant and cost ~10M elementwise ops
    against the ~10 GFLOP conv. Accumulation is exact int32."""
    wq, ws = quantize_weights_int8(kernel, reduce_axes=(0, 1, 2))

    x32 = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(x32), axis=(1, 2, 3), keepdims=True)
    xs = jnp.maximum(xs, 1e-12) / 127.0                    # (N,1,1,1)
    xq = jnp.round(x32 / xs).astype(jnp.int8)

    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (xs * ws.reshape(1, 1, 1, -1))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _quantize_static(x, act_scale: float):
    """Symmetric int8 quantization at a STATIC scale — pure elementwise, so
    XLA fuses it into the producer's epilogue (no standalone requant pass,
    unlike the per-sample-amax path in _conv_int8)."""
    k = 127.0 / act_scale
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * k), -127.0, 127.0)
    return q.astype(jnp.int8)


def _conv_int8_static(x8, kernel, bias, act_scale: float, *, stride=1,
                      padding="VALID", dtype, zero_point: int = 0):
    """int8 activations (pre-quantized at the static `act_scale`) x
    symmetric per-output-channel int8 weights -> exact int32 accumulation;
    dequantization folds into the conv epilogue. The encoder/decoder
    extension of the trunk's fused quantized write (quant="full").

    zero_point=0: symmetric grid, y = acc * (ws_c * S/127) + b.
    zero_point=128 (post-ReLU activations, which are non-negative and
    would waste half a symmetric grid): x8 stores round(y*255/S) - 128,
    DOUBLING the activation resolution. Dequantization stays a conv
    epilogue because the shift contributes a per-output-channel constant:
    conv(q+128, w) = conv(q, w) + 128 * sum(wq)_c — exact as long as every
    tap sees a shifted value, so callers must pad with -128 (the exact
    encoding of 0), never 0."""
    wq, ws = quantize_weights_int8(kernel, reduce_axes=(0, 1, 2))
    acc = jax.lax.conv_general_dilated(
        x8, wq, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    grid = INT8_GRID if zero_point else 127.0
    if zero_point:
        acc = acc + zero_point * jnp.sum(wq.astype(jnp.float32),
                                         axis=(0, 1, 2))
    y = acc * (ws * (act_scale / grid))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def packed_in_relu_int8(x, groups: int, scale: float = None):
    """packed_in_relu emitting int8 on the SHIFTED grid: q =
    trunc(min(y*255/S + 0.5, 255)) - 128. Post-ReLU values are
    non-negative, so the shift uses the whole int8 range (half the
    quantization step of the symmetric grid); consumers pass
    zero_point=128 to _conv_int8_static and pad with -128. The quantize
    rides the norm's elementwise epilogue and its int8 write halves the
    norm's HBM write traffic."""
    if scale is None:
        scale = _INT8_NORM_SCALE
    n, h, w, cf = x.shape
    c = cf // groups
    g = x.reshape(n, h, w, groups, c).astype(jnp.float32)
    mean = jnp.mean(g, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(g - mean), axis=(1, 2, 3), keepdims=True)
    y = jnp.maximum((g - mean) * jax.lax.rsqrt(var + EPS_INSTANCE_NORM), 0.0)
    q = jnp.minimum(y * (INT8_GRID / scale) + 0.5, INT8_GRID)
    return (q.astype(jnp.int32)
            - INT8_ZERO_POINT).astype(jnp.int8).reshape(n, h, w, cf)


def _instance_norm_xla(x, relu):
    # single source of truth for the fp32-stats IN (see models/layers.py);
    # relu commutes with the output cast (monotone, 0-preserving)
    y = layers.instance_norm(x)
    return jnp.maximum(y, 0.0) if relu else y


# -------------------------------------------------- space-to-depth helpers
def _s2d2(x):
    """(N, H, W, C) -> (N, H/2, W/2, 4C); channel order (pr, qr, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def _d2s2(x):
    """(N, H, W, 4C) -> (N, 2H, 2W, C); channel order (p, q, o)."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c)


def s2d_conv_kernel(w):
    """7x7 (or any odd k) HWIO kernel -> the (ceil((k+1)/2), ., 4Cin, 4Cout)
    kernel computing the same conv on the s2d(2) input, all four output
    phases at once. Exact: out[2i+p, 2j+q] taps xp[2i+p+u, 2j+q+v] =
    s2d[i + (p+u)//2, j + (q+v)//2, ((p+u)%2, (q+v)%2, c)]."""
    k, _, cin, cout = w.shape
    kd = (k + 1) // 2
    out = jnp.zeros((kd, kd, 4 * cin, 4 * cout), w.dtype)
    for p in range(2):
        for q in range(2):
            for pr in range(2):
                for qr in range(2):
                    for d in range(kd):
                        u = 2 * d + pr - p
                        if not 0 <= u < k:
                            continue
                        for e in range(kd):
                            v = 2 * e + qr - q
                            if not 0 <= v < k:
                                continue
                            ci = (pr * 2 + qr) * cin
                            co = (p * 2 + q) * cout
                            out = out.at[d, e, ci:ci + cin,
                                         co:co + cout].set(w[u, v])
    return out


def stem_s2d(x, kernel, bias, *, ref_pad: int, dtype):
    """ReflectionPad(p) + kxk VALID conv, computed on the s2d(2) grid.
    Requires (H + 2p - k + 1) even and (2p - k + 1) odd handled by
    construction (k odd, H even)."""
    k = kernel.shape[0]
    xp = reflect_pad(x.astype(dtype), ref_pad)          # (H+2p)^2
    if xp.shape[1] % 2:  # odd padded size: s2d needs even; extra zero
        # row/col on the high side is never tapped (output size is exact)
        xp = jnp.pad(xp, ((0, 0), (0, 1), (0, 1), (0, 0)))
    s = _s2d2(xp)                                       # (., hp/2, wp/2, 4C)
    w4 = s2d_conv_kernel(kernel).astype(dtype)
    y = _conv(s, w4, dtype=dtype)                       # VALID
    h_out = (x.shape[1] + 2 * ref_pad - k + 1) // 2
    w_out = (x.shape[2] + 2 * ref_pad - k + 1) // 2
    y = _d2s2(y[:, :h_out, :w_out])
    return y + bias.astype(y.dtype)


def subpixel_kernel(w):
    """3x3 HWIO kernel -> (2,2,Cin,4Cout) phase kernels equivalent to
    nearest-upsample(2x) + zero-pad(1) + VALID 3x3 conv."""
    r0 = jnp.stack([w[0], w[1] + w[2]])           # output row phase p=0
    r1 = jnp.stack([w[0] + w[1], w[2]])           # p=1

    def cols(rw):
        c0 = jnp.stack([rw[:, 0], rw[:, 1] + rw[:, 2]], axis=1)
        c1 = jnp.stack([rw[:, 0] + rw[:, 1], rw[:, 2]], axis=1)
        return c0, c1

    k00, k01 = cols(r0)
    k10, k11 = cols(r1)
    return jnp.concatenate([k00, k01, k10, k11], axis=-1)


def upsample_conv_subpixel(x, kernel, bias, *, dtype):
    """nearest-upsample x2 + SAME 3x3 conv without materializing the 4x
    activation (2.25x fewer MACs; one less HBM round trip)."""
    n, h, w, _ = x.shape
    cout = kernel.shape[-1]
    wsub = subpixel_kernel(kernel.astype(jnp.float32)).astype(dtype)
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    c4 = _conv(xp, wsub, dtype=dtype)             # (n, h+1, w+1, 4Cout)
    o00 = c4[:, 0:h, 0:w, 0 * cout:1 * cout]
    o01 = c4[:, 0:h, 1:w + 1, 1 * cout:2 * cout]
    o10 = c4[:, 1:h + 1, 0:w, 2 * cout:3 * cout]
    o11 = c4[:, 1:h + 1, 1:w + 1, 3 * cout:4 * cout]
    top = jnp.stack([o00, o01], axis=3)
    bot = jnp.stack([o10, o11], axis=3)
    inter = jnp.stack([top, bot], axis=2)         # (n, h, 2, w, 2, cout)
    out = inter.reshape(n, 2 * h, 2 * w, cout)
    return out + bias.astype(out.dtype)


# ------------------------------------------------------------ the forward
def generator_apply_fused(params, x, *, num_residual_blocks: int = 9,
                          use_cbam: bool = True,
                          dtype=jnp.bfloat16,
                          use_pallas: bool = True):
    """Functionally identical to Generator.__call__ (models/generator.py)
    on the same params tree, kernel-reorganized for TPU. Output fp32 tanh
    NHW1."""
    p = params
    x = x.astype(dtype)

    h = stem_s2d(x, p["stem"]["kernel"], p["stem"]["bias"],
                 ref_pad=3, dtype=dtype)
    h = _instance_norm_xla(h, relu=True)

    h = _conv(h, p["down1"]["kernel"], p["down1"]["bias"], stride=2,
              padding=((1, 1), (1, 1)), dtype=dtype)
    h = _instance_norm_xla(h, relu=True)
    h = _conv(h, p["down2"]["kernel"], p["down2"]["bias"], stride=2,
              padding=((1, 1), (1, 1)), dtype=dtype)
    h = _instance_norm_xla(h, relu=True)

    eps = EPS_INSTANCE_NORM
    for i in range(num_residual_blocks):
        bp = p[f"block{i}"]
        t = reflect_pad(h, 1)
        t = _conv(t, bp["conv1"]["kernel"], bp["conv1"]["bias"], dtype=dtype)
        if use_pallas:
            t = instance_norm_fused(t, True, eps, 1)   # IN+ReLU+pad fused
        else:
            t = reflect_pad(_instance_norm_xla(t, relu=True), 1)
        t = _conv(t, bp["conv2"]["kernel"], bp["conv2"]["bias"], dtype=dtype)
        if use_cbam:
            h = block_tail_fused(
                t, h, bp["ca"]["fc1"]["kernel"], bp["ca"]["fc2"]["kernel"],
                bp["sa"]["conv"]["kernel"], eps, 0)
        else:
            h = h + _instance_norm_xla(t, relu=False)

    h = upsample_conv_subpixel(h, p["up1"]["kernel"], p["up1"]["bias"],
                               dtype=dtype)
    h = _instance_norm_xla(h, relu=True)
    h = upsample_conv_subpixel(h, p["up2"]["kernel"], p["up2"]["bias"],
                               dtype=dtype)
    h = _instance_norm_xla(h, relu=True)

    h = reflect_pad(h, 3)
    h = _conv(h, p["head"]["kernel"], p["head"]["bias"], dtype=dtype)
    return jnp.tanh(h.astype(jnp.float32))


# ================================================================== packed
# Space-to-depth ("packed") layout machinery: the encoder/decoder stages
# around the trunk all run at 512^2/256^2 with <=128 channels — each one
# either starves the MXU (stem 7x7 from 1-3 channels: ~4% utilization;
# head 7x7 to 1 channel: 21 ms of a 60 ms forward) or materializes 4x
# activations (upsample+conv). Working on the packed grid (true pixels
# folded into channels, channel index (row_phase*f + col_phase)*C + c)
# keeps every conv at MXU-friendly contraction/output widths and removes
# every 512^2 elementwise pass. All kernels below are EXACT rewrites of
# the reference ops (tested against the Flax module to fp32 tolerance).

def _d2s(x, f: int):
    """(N, H, W, f*f*C) packed -> (N, f*H, f*W, C) true grid."""
    n, h, w, cf = x.shape
    c = cf // (f * f)
    x = x.reshape(n, h, w, f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, f * h, f * w, c)


def packed_in_relu(x, groups: int, relu: bool = True):
    """InstanceNorm(+ReLU) over the TRUE grid of a packed tensor: per true
    channel, statistics pool over (H, W, phases) — exact (equal counts)."""
    n, h, w, cf = x.shape
    c = cf // groups
    g = x.reshape(n, h, w, groups, c).astype(jnp.float32)
    mean = jnp.mean(g, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(g - mean), axis=(1, 2, 3), keepdims=True)
    y = (g - mean) * jax.lax.rsqrt(var + EPS_INSTANCE_NORM)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.reshape(n, h, w, cf).astype(x.dtype)


def down_conv_packed_kernel(w):
    """3x3 stride-2 zero-pad-1 conv whose input arrives packed-4 (the s2d
    grid IS the output grid): (2,2,4Cin,Cout); input needs one zero packed
    row/col on the LOW side only."""
    _, _, cin, cout = w.shape
    out = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for pr in range(2):
        for qr in range(2):
            for d in range(2):
                u = 2 * d + pr - 1
                if not 0 <= u < 3:
                    continue
                for e in range(2):
                    v = 2 * e + qr - 1
                    if not 0 <= v < 3:
                        continue
                    ci = (pr * 2 + qr) * cin
                    out = out.at[d, e, ci:ci + cin].add(w[u, v])
    return out


def up_packed_kernel(w):
    """nearest-up(2) + zero-pad-1 + 3x3 conv, output left PACKED-4:
    (3,3,Cin,4Cout) — the four 2x2 subpixel phase kernels placed at their
    phase offsets inside a shared 3x3 window (input zero-padded by 1)."""
    _, _, cin, cout = w.shape
    sub = subpixel_kernel(w)                       # (2,2,Cin,4Cout)
    out = jnp.zeros((3, 3, cin, 4 * cout), w.dtype)
    for p in range(2):
        for q in range(2):
            blk = sub[:, :, :, (p * 2 + q) * cout:(p * 2 + q + 1) * cout]
            out = out.at[p:p + 2, q:q + 2, :,
                         (p * 2 + q) * cout:(p * 2 + q + 1) * cout].add(blk)
    return out


def up2_packed_kernel(w):
    """nearest-up(2) + zero-pad-1 + 3x3 conv where the INPUT is already
    packed-4 and the output stays PACKED-16: (3,3,4Cin,16Cout); input
    zero-padded by 1 packed pixel."""
    _, _, cin, cout = w.shape
    out = jnp.zeros((3, 3, 4 * cin, 16 * cout), w.dtype)
    for t in range(4):          # output row phase on the true 512 grid
        for s in range(4):      # output col phase
            for dr in range(3):
                for dc in range(3):
                    fr = (t + dr - 1) // 2      # floor: true-256 row offset
                    fc = (s + dc - 1) // 2
                    d, alpha = fr // 2 + 1, fr % 2
                    e, beta = fc // 2 + 1, fc % 2
                    ci = (alpha * 2 + beta) * cin
                    co = (t * 4 + s) * cout
                    out = out.at[d, e, ci:ci + cin,
                                 co:co + cout].add(w[dr, dc])
    return out


def head_packed_kernel(w):
    """7x7 conv (reflect-padded separately) with input AND output packed-16
    on the 128^2 grid: (3,3,16Cin,16Cout)."""
    k, _, cin, cout = w.shape
    out = jnp.zeros((3, 3, 16 * cin, 16 * cout), w.dtype)
    for t in range(4):
        for s in range(4):
            for u in range(k):
                for v in range(k):
                    fr = (t + u - 3) // 4
                    fc = (s + v - 3) // 4
                    d, alpha = fr + 1, (t + u - 3) % 4
                    e, beta = fc + 1, (s + v - 3) % 4
                    ci = (alpha * 4 + beta) * cin
                    co = (t * 4 + s) * cout
                    out = out.at[d, e, ci:ci + cin,
                                 co:co + cout].add(w[u, v])
    return out


def packed16_reflect_pad3(x, c: int, fill=0):
    """True-grid ReflectionPad2d(3) expressed on a packed-16 tensor: one
    extra packed row/col per side whose phase channels are the reflected
    true rows/cols (phase permutation of the adjacent packed row/col); the
    never-tapped outermost true line is `fill` (pass -128 for shifted-grid
    int8 tensors, the exact encoding of 0)."""
    n, h, w, cf = x.shape

    def pad_axis(t, axis):
        # gather phase slices of the packed border element
        def phase_sel(border, perm, axis_phase):
            # border: packed row/col (…, 16C); reorder its 4 sub-phases
            # along `axis_phase` (0 = row phase alpha, 1 = col phase beta)
            b = border.reshape(border.shape[:-1] + (4, 4, c))
            parts = []
            for k_ in perm:
                if k_ is None:
                    parts.append(jnp.full_like(
                        jnp.take(b, 0, axis=-3 if axis_phase == 0 else -2),
                        fill))
                else:
                    parts.append(jnp.take(
                        b, k_, axis=-3 if axis_phase == 0 else -2))
            stacked = jnp.stack(parts, axis=-3 if axis_phase == 0 else -2)
            return stacked.reshape(border.shape)

        sl = lambda i: tuple(slice(i, i + 1) if d == axis else slice(None)
                             for d in range(t.ndim))
        first, last = t[sl(0)], t[sl(t.shape[axis] - 1)]
        ap = 0 if axis == 1 else 1
        pre = phase_sel(first, [None, 3, 2, 1], ap)   # true rows -4..-1
        post = phase_sel(last, [2, 1, 0, None], ap)   # true rows H..H+3
        return jnp.concatenate([pre, t, post], axis=axis)

    return pad_axis(pad_axis(x, 1), 2)


def generator_apply_packed(params, x, *, num_residual_blocks: int = 9,
                           use_cbam: bool = True, dtype=jnp.bfloat16,
                           trunk: str = "auto", encoder_fused: bool = True,
                           trunk_int8: bool = False,
                           quant: str | None = None):
    """Generator forward entirely in packed (space-to-depth) layout outside
    the trunk: one s2d at the input, one tiny d2s at the (128^2, 16)
    output, MXU-shaped convs everywhere between. Exact to bf16 rounding
    versus Generator.__call__ on the same params.

    trunk="pallas" runs the residual trunk with zero standalone pad ops:
    each block is conv(VALID) -> Pallas IN+ReLU with the next reflect-pad
    folded into the output write -> conv(VALID) -> Pallas block tail
    (IN + CBAM + skip from the PADDED carry + next pad folded), so per
    block only the two convs remain outside the fused kernels. A/B per
    toolchain (docs/PERF.md); "xla" keeps the plain graph; "auto"
    (default) picks pallas on a real TPU — measured +12.5% on the batch-8
    512^2 forward (49.5 -> 44.0 ms) where the UNPACKED graph's A/B had the
    same kernels losing: kernel wins are layout-context-dependent."""
    if trunk == "auto":
        from ducosy_tpu.ops.pallas.instance_norm import pallas_available
        trunk = "pallas" if pallas_available() else "xla"
    # "chain{k}" (e.g. chain3, chain9): k consecutive blocks per Pallas
    # kernel — the carry never leaves VMEM inside a chain (conv_in.py
    # residual_chain_pallas). chain1 == mono.
    chain_k = 0
    if isinstance(trunk, str) and trunk.startswith("chain"):
        chain_k = int(trunk[5:] or 1)
        if not 1 <= chain_k <= num_residual_blocks:
            raise ValueError(f"chain length out of range: {trunk!r}")
        trunk = "chain"
    if trunk not in ("xla", "pallas", "mega", "mono", "chain"):
        raise ValueError(
            f"trunk must be auto/xla/pallas/mega/mono/chain{{k}}: {trunk!r}")
    # quant: None | "trunk" (the 18 trunk convs int8) | "full" (also the
    # stem/down/up2/head convs at static scales; up1 stays bf16 — its
    # input is the un-normalized residual carry). trunk_int8=True is the
    # back-compat spelling of quant="trunk".
    if quant is None and trunk_int8:
        quant = "trunk"
    if quant not in (None, "trunk", "full"):
        raise ValueError(f"quant must be None, 'trunk' or 'full': {quant!r}")
    trunk_int8 = quant in ("trunk", "full")
    full_int8 = quant == "full"
    p = params
    x = x.astype(dtype)

    # ---- encoder (packed-4 until down1 consumes it)
    xp = reflect_pad(x, 3)
    if xp.shape[1] % 2:
        xp = jnp.pad(xp, ((0, 0), (0, 1), (0, 1), (0, 0)))
    s = _s2d2(xp)
    w_stem = s2d_conv_kernel(p["stem"]["kernel"])
    if full_int8:
        # model inputs are [-1,1] (image) / {0,1} (masks) by construction:
        # act_scale 1.0 uses the whole int8 grid; the <=1/254 quantization
        # noise is below the HU window's stored-pixel resolution
        h = _conv_int8_static(_quantize_static(s, 1.0), w_stem, None, 1.0,
                              dtype=dtype)
    else:
        h = _conv(s, w_stem.astype(dtype), dtype=dtype)
    h_out = (x.shape[1] + 6 - p["stem"]["kernel"].shape[0] + 1) // 2
    h = h[:, :h_out, :h_out] + jnp.tile(p["stem"]["bias"], 4).astype(dtype)

    pallas_trunk = trunk in ("pallas", "mega", "mono", "chain") and use_cbam
    # "mega": the two trunk convs fold INTO the Pallas kernels
    # (ops/pallas/conv_in.py) — one HBM read of the padded carry per
    # half-block, nothing between the convs ever leaves VMEM. Under the
    # quant modes the first kernel's output write emits shifted-grid int8
    # and the tail's taps run on the int8 MXU (scripts/ab_mega_int8.py:
    # trunk 120.1, full 132.0 slices/s vs 111.0 bf16 mega).
    mega_trunk = pallas_trunk and trunk == "mega"
    # "mono": the whole residual block as ONE Pallas kernel (the
    # intermediate never leaves VMEM); inference-only like mega.
    mono_trunk = pallas_trunk and trunk == "mono"
    # encoder_fused routes every non-trunk norm through the Pallas IN:
    # down1/down2's directly (TRUE-layout channels; down2's folds the
    # trunk's priming reflect-pad into its output write — measured +5.8%
    # on the inference forward, 44.0 -> 41.6 ms at batch 8 x 512^2), and
    # the phase-packed stem/up1/up2 norms via the kernel's phase-group
    # pooling. INFERENCE ONLY: under grad, the custom-VJP boundaries at
    # these 256^2-scale shapes materialize residuals XLA otherwise fuses
    # away and the batch-8 train step OOMs HBM (22 GB need vs 15.75) —
    # the train step passes encoder_fused=False.
    enc_fused = pallas_trunk and encoder_fused
    # trunk_int8: inference-only quantized serving mode — trunk convs run
    # on the int8 MXU path (~1.6x bf16 throughput measured in isolation);
    # encoder/decoder/CBAM/norms stay bf16. In the Pallas trunk the input
    # quantization rides the IN kernel's output write (see the loop
    # below); in the XLA trunk both convs use the dynamic-requant
    # _conv_int8 via conv_trunk. Opt-in: quality is checkpoint-dependent
    # (tests/test_fused_forward.py mechanism checks, docs/PERF.md measured
    # fidelity on random-init params).
    conv_trunk = _conv_int8 if trunk_int8 else \
        (lambda x_, k_, b_, padding="VALID": _conv(x_, k_, b_,
                                                   padding=padding,
                                                   dtype=dtype))

    def _phase_norm(t, groups):
        # phase-grouped Pallas IN only where the full-channel block fits
        # VMEM: the phase groups stride the whole packed axis, so the
        # kernel needs every channel in one block — at 16 MB windows it
        # compiles (up1); at 32 MB (stem/up2) Mosaic needs 192 MB scoped
        # (2x double-buffered window + spills) and the XLA norm stays.
        n_, h_, w_, cf_ = t.shape
        if enc_fused and h_ * w_ * cf_ * t.dtype.itemsize <= _PHASE_FUSE_CAP:
            return instance_norm_fused(t, True, eps, 0, groups)
        return packed_in_relu(t, groups)

    eps = EPS_INSTANCE_NORM
    w_d1 = down_conv_packed_kernel(p["down1"]["kernel"])
    if full_int8:
        # the stem norm emits int8 at the static post-norm scale (its
        # elementwise epilogue), down1 runs the int8 MXU path; pads use
        # -128 — the exact encoding of 0 on the shifted grid
        h8 = jnp.pad(packed_in_relu_int8(h, 4),
                     ((0, 0), (1, 0), (1, 0), (0, 0)),
                     constant_values=-128)
        h = _conv_int8_static(h8, w_d1, p["down1"]["bias"],
                              _INT8_NORM_SCALE, dtype=dtype, zero_point=128)
        h8 = jnp.pad(packed_in_relu_int8(h, 1),     # true 256^2 x 2base
                     ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=-128)
        h = _conv_int8_static(h8, p["down2"]["kernel"], p["down2"]["bias"],
                              _INT8_NORM_SCALE, stride=2, dtype=dtype,
                              zero_point=128)
    else:
        h = _phase_norm(h, 4)                      # true 512^2 x base
        h = jnp.pad(h, ((0, 0), (1, 0), (1, 0), (0, 0)))
        h = _conv(h, w_d1.astype(dtype), dtype=dtype) \
            + p["down1"]["bias"].astype(dtype)
        if enc_fused:
            h = instance_norm_fused(h, True, eps, 0)  # true 256^2 x 2base
        else:
            h = _instance_norm_xla(h, relu=True)

        h = _conv(h, p["down2"]["kernel"], p["down2"]["bias"], stride=2,
                  padding=((1, 1), (1, 1)), dtype=dtype)

    # ---- trunk
    if pallas_trunk:
        # fully fused: the padded activation is the loop carry; down2's
        # pad-folded norm primes it (encoder_fused) or a standalone pad
        # does, and the trunk itself contains zero standalone pad ops
        if enc_fused:
            hp = instance_norm_fused(h, True, eps, 1)  # 128^2 x 4base
        else:
            hp = reflect_pad(_instance_norm_xla(h, relu=True), 1)
        if trunk == "chain":
            # groups of chain_k consecutive blocks, each group ONE Pallas
            # kernel (the carry stays in VMEM inside a group); the final
            # group drops the trailing pad.
            for lo in range(0, num_residual_blocks, chain_k):
                hi = min(lo + chain_k, num_residual_blocks)
                bs = [p[f"block{i}"] for i in range(lo, hi)]
                hp = residual_chain_fused(
                    hp,
                    jnp.stack([b["conv1"]["kernel"] for b in bs]),
                    jnp.stack([b["conv2"]["kernel"] for b in bs]),
                    jnp.stack([b["ca"]["fc1"]["kernel"] for b in bs]),
                    jnp.stack([b["ca"]["fc2"]["kernel"] for b in bs]),
                    jnp.stack([b["sa"]["conv"]["kernel"] for b in bs]),
                    eps=eps, pad=0 if hi == num_residual_blocks else 1,
                    quant=trunk_int8)
        for i in range(num_residual_blocks if trunk != "chain" else 0):
            bp = p[f"block{i}"]
            if mono_trunk:
                # the ENTIRE block in one kernel: the intermediate
                # activation never leaves VMEM — one HBM read of the
                # padded carry and one write per block, vs two of each
                # for the two-kernel mega path (A/B: scripts/ab_mono.py).
                hp = residual_block_fused(
                    hp, bp["conv1"]["kernel"], bp["conv2"]["kernel"],
                    bp["ca"]["fc1"]["kernel"], bp["ca"]["fc2"]["kernel"],
                    bp["sa"]["conv"]["kernel"], eps=eps,
                    pad=0 if i == num_residual_blocks - 1 else 1,
                    quant=trunk_int8)
                continue
            if mega_trunk:
                # conv biases drop exactly under the following IN
                # (ops/pallas/conv_in.py docstring). Under quant the first
                # kernel's output write emits shifted-grid int8 and the
                # tail's nine conv taps ride the int8 MXU path with the IN
                # statistics taken straight off the int32 accumulator —
                # no dequantization exists anywhere in the trunk.
                scale = _INT8_NORM_SCALE if trunk_int8 else None
                t = conv3x3_in_fused(hp, bp["conv1"]["kernel"], eps=eps,
                                     pad=1, int8_scale=scale)
                hp = conv_block_tail(
                    t, hp, bp["conv2"]["kernel"], bp["ca"]["fc1"]["kernel"],
                    bp["ca"]["fc2"]["kernel"], bp["sa"]["conv"]["kernel"],
                    eps=eps, pad=0 if i == num_residual_blocks - 1 else 1,
                    x_pad=1, in_int8_scale=scale)
                continue
            if trunk_int8:
                # fused quantized serving: the IN kernel emits SHIFTED-grid
                # int8 at a static post-norm scale (its output write — zero
                # standalone requant passes, full int8 range for the
                # non-negative ReLU'd values), conv2 runs the int8 MXU
                # path, and dequantization folds into the conv epilogue
                # (with the exact 128*sum(wq)_c shift constant; every tap
                # is data — the reflect pad is folded — so the constant is
                # position-independent). conv1 stays bf16 (its input is
                # the un-normalized residual carry).
                t = _conv(hp, bp["conv1"]["kernel"], bp["conv1"]["bias"],
                          dtype=dtype)
                t8 = instance_norm_int8(t, eps=eps, pad=1,
                                        scale=_INT8_NORM_SCALE)
                t = _conv_int8_static(t8, bp["conv2"]["kernel"],
                                      bp["conv2"]["bias"],
                                      _INT8_NORM_SCALE, dtype=dtype,
                                      zero_point=128)
            else:
                t = conv_trunk(hp, bp["conv1"]["kernel"],
                               bp["conv1"]["bias"])
                t = instance_norm_fused(t, True, eps, 1)
                t = conv_trunk(t, bp["conv2"]["kernel"],
                               bp["conv2"]["bias"])
            last = i == num_residual_blocks - 1
            hp = block_tail_fused(t, hp, bp["ca"]["fc1"]["kernel"],
                                  bp["ca"]["fc2"]["kernel"],
                                  bp["sa"]["conv"]["kernel"], eps,
                                  0 if last else 1, 1)
        h = hp
    else:
        h = _instance_norm_xla(h, relu=True)       # true 128^2 x 4base
        for i in range(num_residual_blocks):
            bp = p[f"block{i}"]
            t = reflect_pad(h, 1)
            t = conv_trunk(t, bp["conv1"]["kernel"], bp["conv1"]["bias"])
            t = reflect_pad(_instance_norm_xla(t, relu=True), 1)
            t = conv_trunk(t, bp["conv2"]["kernel"], bp["conv2"]["bias"])
            if use_cbam:
                from ducosy_tpu.ops.pallas.cbam_block import _xla_block_tail
                h = _xla_block_tail(t, h, bp["ca"]["fc1"]["kernel"],
                                    bp["ca"]["fc2"]["kernel"],
                                    bp["sa"]["conv"]["kernel"], eps, 0)
            else:
                h = h + _instance_norm_xla(t, relu=False)

    # ---- decoder: packed-4 -> packed-16, no d2s until the very end
    w_u1 = up_packed_kernel(p["up1"]["kernel"].astype(jnp.float32))
    h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h = _conv(h, w_u1.astype(dtype), dtype=dtype)  # bf16: un-normalized in
    h = h + jnp.tile(p["up1"]["bias"], 4).astype(dtype)

    co2 = p["up2"]["kernel"].shape[3]
    w_u2 = up2_packed_kernel(p["up2"]["kernel"].astype(jnp.float32))
    w_hd = head_packed_kernel(p["head"]["kernel"].astype(jnp.float32))
    if full_int8:
        h8 = jnp.pad(packed_in_relu_int8(h, 4),    # packed-4 of 256^2 x co1
                     ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=-128)
        h = _conv_int8_static(h8, w_u2, None, _INT8_NORM_SCALE, dtype=dtype,
                              zero_point=128)
        h = h + jnp.tile(p["up2"]["bias"], 16).astype(dtype)
        # packed-16 norm -> int8 -> true-grid reflect pad (phase gathers;
        # fill lines encode exact 0 = -128) -> quantized head conv
        h8 = packed16_reflect_pad3(packed_in_relu_int8(h, 16), co2,
                                   fill=-128)
        h = _conv_int8_static(h8, w_hd, None, _INT8_NORM_SCALE,
                              dtype=jnp.float32, zero_point=128)
        h = h + jnp.tile(p["head"]["bias"], 16).astype(jnp.float32)
    else:
        h = _phase_norm(h, 4)                      # packed-4 of 256^2 x co1
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h = _conv(h, w_u2.astype(dtype), dtype=dtype)
        h = h + jnp.tile(p["up2"]["bias"], 16).astype(dtype)
        h = _phase_norm(h, 16)                     # packed-16 of 512^2 x co2

        h = packed16_reflect_pad3(h, co2)
        h = _conv(h, w_hd.astype(dtype), dtype=dtype)
        h = h + jnp.tile(p["head"]["bias"], 16).astype(dtype)
    h = jnp.tanh(h.astype(jnp.float32))            # (N, 128, 128, 16)
    return _d2s(h, 4)                              # (N, 512, 512, 1)
