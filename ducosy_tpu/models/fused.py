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

from ducosy_tpu.models.layers import EPS_INSTANCE_NORM, prec_for, reflect_pad
from ducosy_tpu.ops.pallas.cbam_block import block_tail_fused
from ducosy_tpu.ops.pallas.instance_norm import instance_norm_fused


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


def _instance_norm_xla(x, relu):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + EPS_INSTANCE_NORM)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


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
