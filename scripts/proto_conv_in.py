"""Prototype: fused 3x3-conv + InstanceNorm(+ReLU)(+reflect-pad) Pallas
kernel for the trunk shape, vs the current conv(XLA) -> Pallas IN pair.

Parity on small shapes (interpret mode / TPU) + slope-method timing at
trunk shape (8|32, 130, 130, 256) -> (., 130, 130, 256).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/ducosy_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

from ducosy_tpu.ops.pallas.instance_norm import (
    EPS, instance_norm_fused, reflect_pad_hw)


def _conv_in_kernel(x_ref, w_ref, o_ref, *, relu, eps, pad):
    xp = x_ref[0]                              # (H+2, W+2, Cin) io dtype
    hp_, wp_, cin = xp.shape
    hh, ww = hp_ - 2, wp_ - 2
    w = w_ref[...]                             # (9*Cin, Cout)
    cout = w.shape[1]
    acc = jnp.zeros((hh * ww, cout), jnp.float32)
    for di in range(3):
        slab = xp[di:di + hh]                  # free slice (untiled dim)
        for dj in range(3):
            s = slab[:, dj:dj + ww, :].reshape(hh * ww, cin)
            tap = w[(di * 3 + dj) * cin:(di * 3 + dj + 1) * cin]
            acc = acc + jnp.dot(s, tap, preferred_element_type=jnp.float32)
    # conv bias is omitted: the following InstanceNorm subtracts per-channel
    # means, so a per-channel additive constant is exactly a no-op.
    count = hh * ww
    mean = jnp.sum(acc, axis=0, keepdims=True) / count
    var = jnp.maximum(
        jnp.sum(jnp.square(acc - mean), axis=0, keepdims=True) / count, 0.0)
    y = (acc - mean) * jax.lax.rsqrt(var + eps)
    if relu:
        y = jnp.maximum(y, 0.0)
    y = y.astype(o_ref.dtype).reshape(hh, ww, cout)
    if pad:
        y = reflect_pad_hw(y, pad, h_axis=0)
    o_ref[0] = y


@functools.partial(jax.jit, static_argnames=("relu", "eps", "pad",
                                             "interpret"))
def conv3x3_in_pallas(xp, w, *, relu=True, eps=EPS, pad=1, interpret=False):
    """xp: (N, H+2, W+2, Cin) pre-padded; w: (3, 3, Cin, Cout) HWIO.
    Returns IN(conv_VALID(xp, w))(+ReLU), reflect-padded by `pad`."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, hp_, wp_, cin = xp.shape
    hh, ww = hp_ - 2, wp_ - 2
    cout = w.shape[-1]
    wf = w.reshape(9 * cin, cout).astype(xp.dtype)
    vspace = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        functools.partial(_conv_in_kernel, relu=relu, eps=eps, pad=pad),
        out_shape=jax.ShapeDtypeStruct(
            (n, hh + 2 * pad, ww + 2 * pad, cout), xp.dtype),
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


def _conv_tail_kernel(t_ref, x_ref, w_ref, w1_ref, w2_ref, wsa_ref, o_ref,
                      *, eps, pad, x_pad):
    """conv2(VALID) + IN + CBAM + skip-add(+pad) — the whole second half of
    a residual block in one pass. t_ref: padded conv input; x_ref: the
    (padded) residual carry."""
    tp = t_ref[0]                              # (H+2, W+2, Cin)
    hp_, wp_, cin = tp.shape
    hh, ww = hp_ - 2, wp_ - 2
    w = w_ref[...]                             # (9*Cin, C)
    c = w.shape[1]
    count = hh * ww
    acc = jnp.zeros((hh * ww, c), jnp.float32)
    for di in range(3):
        slab = tp[di:di + hh]
        for dj in range(3):
            s = slab[:, dj:dj + ww, :].reshape(hh * ww, cin)
            tap = w[(di * 3 + dj) * cin:(di * 3 + dj + 1) * cin]
            acc = acc + jnp.dot(s, tap, preferred_element_type=jnp.float32)
    # bias omitted (IN follows). fp32 IN stats straight off the accumulator.
    mean = jnp.sum(acc, axis=0, keepdims=True) / count
    var = jnp.maximum(
        jnp.sum(jnp.square(acc - mean), axis=0, keepdims=True) / count, 0.0)
    io = o_ref.dtype
    y = ((acc - mean) * jax.lax.rsqrt(var + eps)).astype(io)  # (HW, C)

    # ---- channel attention (block_tail math on the 2-D view)
    avg = jnp.sum(y, axis=0, dtype=jnp.float32) / count      # (C,)
    mx = jnp.max(y, axis=0).astype(jnp.float32)              # (C,)
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    hid = jnp.maximum(
        jnp.dot(jnp.stack([avg, mx]), w1,
                preferred_element_type=jnp.float32), 0.0)
    gates = jnp.dot(hid, w2, preferred_element_type=jnp.float32)
    gate_c = jax.nn.sigmoid(gates[0] + gates[1])             # (C,)
    t = (y * gate_c.astype(io)[None, :]).reshape(hh, ww, c)

    # ---- spatial attention
    sa_avg = jnp.sum(t, axis=-1, dtype=jnp.float32) / c      # (H, W)
    sa_max = jnp.max(t, axis=-1).astype(jnp.float32)
    SA_K = 7
    p = SA_K // 2

    def zero_pad(a):
        zr = jnp.zeros((p, a.shape[1]), a.dtype)
        a = jnp.concatenate([zr, a, zr], axis=0)
        zc = jnp.zeros((a.shape[0], p), a.dtype)
        return jnp.concatenate([zc, a, zc], axis=1)

    avg_p = zero_pad(sa_avg)
    max_p = zero_pad(sa_max)
    sacc = jnp.zeros((hh, ww), jnp.float32)
    for di in range(SA_K):
        for dj in range(SA_K):
            wa = wsa_ref[di * SA_K + dj]
            wm = wsa_ref[SA_K * SA_K + di * SA_K + dj]
            sacc += (wa * avg_p[di:di + hh, dj:dj + ww]
                     + wm * max_p[di:di + hh, dj:dj + ww])
    gate_s = jax.nn.sigmoid(sacc)[:, :, None].astype(io)

    x = x_ref[0]
    if x_pad:
        x = x[x_pad:x_pad + hh, x_pad:x_pad + ww]
    out = x + t * gate_s
    if pad:
        out = reflect_pad_hw(out, pad, h_axis=0)
    o_ref[0] = out.astype(io)


@functools.partial(jax.jit, static_argnames=("eps", "pad", "x_pad",
                                             "interpret"))
def conv_block_tail_pallas(tp, x, w, w1, w2, wsa, *, eps=EPS, pad=1,
                           x_pad=1, interpret=False):
    """x(+pad interior) + CBAM(IN(conv_VALID(tp, w))), reflect-padded."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, hp_, wp_, cin = tp.shape
    hh, ww = hp_ - 2, wp_ - 2
    c = w.shape[-1]
    SA_K = 7
    wf = w.reshape(9 * cin, c).astype(tp.dtype)
    wsa_flat = wsa.reshape(SA_K * SA_K, 2).T.reshape(-1).astype(jnp.float32)
    vspace = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        functools.partial(_conv_tail_kernel, eps=eps, pad=pad, x_pad=x_pad),
        out_shape=jax.ShapeDtypeStruct(
            (n, hh + 2 * pad, ww + 2 * pad, c), tp.dtype),
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
            pl.BlockSpec((2 * SA_K * SA_K,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, hh + 2 * pad, ww + 2 * pad, c),
                               lambda i: (i, 0, 0, 0), memory_space=vspace),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(tp, x, wf, w1.astype(jnp.float32), w2.astype(jnp.float32), wsa_flat)


def xla_pair(xp, w, b, *, pad=1):
    """Current production pair: XLA conv VALID + Pallas IN+ReLU+pad."""
    y = jax.lax.conv_general_dilated(
        xp, w.astype(xp.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b.astype(y.dtype)
    return instance_norm_fused(y, True, EPS, pad)


def parity(n=2, hw=32, c=128, interpret=True):
    from ducosy_tpu.ops.pallas.cbam_block import block_tail_fused

    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((n, hw + 2, hw + 2, c)),
                     jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    ref = xla_pair(xp, w, b)
    got = conv3x3_in_pallas(xp, w, interpret=interpret)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"conv+IN parity n={n} hw={hw} c={c} interpret={interpret}: "
          f"max|d|={err:.3e}")
    assert err < 1e-3, err

    r = max(c // 16, 1)
    w1 = jnp.asarray(rng.standard_normal((c, r)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((r, c)) * 0.1, jnp.float32)
    wsa = jnp.asarray(rng.standard_normal((7, 7, 2, 1)) * 0.1, jnp.float32)
    conv_out = jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref_t = block_tail_fused(conv_out, xp, w1, w2, wsa, EPS, 1, 1)
    got_t = conv_block_tail_pallas(xp, xp, w, w1, w2, wsa,
                                   interpret=interpret)
    err_t = float(jnp.max(jnp.abs(ref_t - got_t)))
    print(f"conv+tail parity: max|d|={err_t:.3e}")
    assert err_t < 1e-3, err_t


def slope_time(fn, x, iters_list=(4, 16)):
    """Chained-application slope timing: y_{k+1} = fn(y_k) jitted as one
    program; slope of time vs iters removes dispatch + transfer."""
    times = {}
    for it in iters_list:
        @jax.jit
        def chain(x0):
            def body(h, _):
                return fn(h), None
            y, _ = jax.lax.scan(body, x0, None, length=it)
            return y
        y = chain(x)
        jax.block_until_ready(y)
        float(jnp.sum(y[0, 0, 0, :1]))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            y = chain(x)
            float(jnp.sum(y[0, 0, 0, :1]))
            best = min(best, time.perf_counter() - t0)
        times[it] = best
    i0, i1 = iters_list
    return (times[i1] - times[i0]) / (i1 - i0)


def bench(n=8, hw=128, c=256):
    from ducosy_tpu.ops.pallas.cbam_block import block_tail_fused

    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((n, hw + 2, hw + 2, c)),
                     jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((c,)), jnp.bfloat16)
    r = c // 16
    w1 = jnp.asarray(rng.standard_normal((c, r)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((r, c)) * 0.1, jnp.float32)
    wsa = jnp.asarray(rng.standard_normal((7, 7, 2, 1)) * 0.1, jnp.float32)

    def prod_block(hp):
        """Current production residual block (packed trunk loop body)."""
        t = jax.lax.conv_general_dilated(
            hp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO",
                                                       "NHWC")) + b
        t = instance_norm_fused(t, True, EPS, 1)
        t = jax.lax.conv_general_dilated(
            t, wb, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO",
                                                       "NHWC")) + b
        return block_tail_fused(t, hp, w1, w2, wsa, EPS, 1, 1)

    def fused_block(hp):
        t = conv3x3_in_pallas(hp, w)
        return conv_block_tail_pallas(t, hp, wb, w1, w2, wsa)

    def half_fused_block(hp):
        """Kernel A only (conv1+IN fused), production tail."""
        t = conv3x3_in_pallas(hp, w)
        t = jax.lax.conv_general_dilated(
            t, wb, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO",
                                                       "NHWC")) + b
        return block_tail_fused(t, hp, w1, w2, wsa, EPS, 1, 1)

    t_conv_in = slope_time(lambda h: conv3x3_in_pallas(h, w), xp)
    t_pair = slope_time(lambda h: xla_pair(h, w, b), xp)
    flop = 2 * n * hw * hw * 9 * c * c
    print(f"batch {n} conv+IN : fused {t_conv_in*1e3:.3f} ms "
          f"({flop/t_conv_in/1e12:.1f} TF/s) | xla+palIN {t_pair*1e3:.3f} ms "
          f"({flop/t_pair/1e12:.1f} TF/s) | speedup {t_pair/t_conv_in:.3f}x")

    t_prod = slope_time(prod_block, xp)
    t_half = slope_time(half_fused_block, xp)
    t_full = slope_time(fused_block, xp)
    print(f"batch {n} block   : prod {t_prod*1e3:.3f} ms | "
          f"A-only {t_half*1e3:.3f} ms ({t_prod/t_half:.3f}x) | "
          f"A+C {t_full*1e3:.3f} ms ({t_prod/t_full:.3f}x)")

    got = fused_block(xp)
    ref = prod_block(xp)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"  on-device block parity max|d| = {err:.3e}")


if __name__ == "__main__":
    if jax.devices()[0].platform != "tpu":
        parity(interpret=True)
        print("no TPU — interpret parity only")
        sys.exit(0)
    parity(interpret=False)
    bench(8)
    bench(32)
