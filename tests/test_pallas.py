"""Pallas fused InstanceNorm kernel tests.

Runs the kernel in interpret mode on CPU (numerics only; the compiled TPU
path is exercised by bench.py and the TPU probes). The custom-VJP wrapper's
backward is checked against jax.grad of the unfused reference."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


from ducosy_tpu.models.layers import instance_norm
from ducosy_tpu.ops.pallas.instance_norm import (
    instance_norm_fused,
    instance_norm_pallas,
)

pytestmark = pytest.mark.slow  # full-tier only: heavy compiles /
# torch parity (round-5 fast tier: pytest -m "not slow")



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


def _ref_pad(y, pad):
    return np.pad(np.asarray(y), ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                  mode="reflect")


def test_interpret_pad_fold(rng):
    """IN+ReLU with the reflect-pad folded into the output write."""
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 128)), jnp.float32)
    y = instance_norm_pallas(x, relu=True, pad=1, interpret=True)
    ref = _ref_pad(np.maximum(np.asarray(instance_norm(x)), 0), 1)
    assert y.shape == (2, 14, 14, 128)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-5)


def test_pad_fold_backward_matches_autodiff(rng):
    from ducosy_tpu.models.layers import reflect_pad

    x = jnp.asarray(rng.standard_normal((2, 10, 10, 4)), jnp.float32)
    tangent = jnp.asarray(rng.standard_normal((2, 12, 12, 4)), jnp.float32)

    def ref_loss(v):
        return jnp.sum(reflect_pad(jnp.maximum(instance_norm(v), 0.0), 1)
                       * tangent)

    def fused_loss(v):
        return jnp.sum(instance_norm_fused(v, True, 1e-5, 1) * tangent)

    g_ref = jax.grad(ref_loss)(x)
    g_fused = jax.grad(fused_loss)(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-3, atol=1e-5)


# ------------------------------------------------------ fused block tail
def _tail_params(rng, c=256, r=16):
    w1 = jnp.asarray(rng.standard_normal((c, r)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((r, c)) * 0.1, jnp.float32)
    wsa = jnp.asarray(rng.standard_normal((7, 7, 2, 1)) * 0.1, jnp.float32)
    return w1, w2, wsa


def _module_tail(h, x, w1, w2, wsa):
    """The exact Flax composition the kernel replaces: IN -> CA -> SA ->
    skip add (models/generator.py ResidualBlock tail)."""
    from ducosy_tpu.models.generator import ChannelAttention, SpatialAttention

    y = instance_norm(h)
    ca = ChannelAttention(h.shape[-1])
    y = ca.apply({"params": {"fc1": {"kernel": w1}, "fc2": {"kernel": w2}}},
                 y)
    sa = SpatialAttention()
    y = sa.apply({"params": {"conv": {"kernel": wsa}}}, y)
    return x + y


def test_block_tail_interpret_matches_module(rng):
    from ducosy_tpu.ops.pallas.cbam_block import block_tail_pallas

    c = 256
    h = jnp.asarray(rng.standard_normal((2, 12, 12, c)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, c)), jnp.float32)
    w1, w2, wsa = _tail_params(rng, c)
    ref = _module_tail(h, x, w1, w2, wsa)
    out = block_tail_pallas(h, x, w1, w2, wsa, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_block_tail_pad_interpret(rng):
    from ducosy_tpu.ops.pallas.cbam_block import block_tail_pallas

    c = 128
    h = jnp.asarray(rng.standard_normal((1, 10, 10, c)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 10, 10, c)), jnp.float32)
    w1, w2, wsa = _tail_params(rng, c, r=8)
    ref = _ref_pad(_module_tail(h, x, w1, w2, wsa), 1)
    out = block_tail_pallas(h, x, w1, w2, wsa, pad=1, interpret=True)
    assert out.shape == (1, 12, 12, c)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_block_tail_xla_fallback_and_grad(rng):
    """CPU path: forward equals the module composition; gradients flow to
    every input (incl. the attention weights) and match autodiff of the
    module tail."""
    from ducosy_tpu.ops.pallas.cbam_block import block_tail_fused

    c = 64
    h = jnp.asarray(rng.standard_normal((2, 8, 8, c)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, c)), jnp.float32)
    w1, w2, wsa = _tail_params(rng, c, r=4)
    tangent = jnp.asarray(rng.standard_normal((2, 10, 10, c)), jnp.float32)

    out = block_tail_fused(h, x, w1, w2, wsa)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_module_tail(h, x, w1, w2, wsa)),
                               rtol=2e-4, atol=2e-5)

    def fused_loss(*args):
        from ducosy_tpu.ops.pallas.instance_norm import EPS
        return jnp.sum(block_tail_fused(*args, EPS, 1) * tangent)

    def ref_loss(*args):
        from ducosy_tpu.models.layers import reflect_pad
        return jnp.sum(reflect_pad(_module_tail(*args), 1) * tangent)

    g_fused = jax.grad(fused_loss, argnums=(0, 1, 2, 3, 4))(h, x, w1, w2, wsa)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(h, x, w1, w2, wsa)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_block_tail_xpad_interpret(rng):
    """x_pad: the skip input arrives reflect-padded; only its interior
    joins the residual, and the padded output write still matches."""
    from ducosy_tpu.ops.pallas.cbam_block import block_tail_pallas

    c = 128
    h = jnp.asarray(rng.standard_normal((2, 10, 10, c)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 10, 10, c)), jnp.float32)
    xp = _ref_pad(x, 1)
    w1, w2, wsa = _tail_params(rng, c, r=8)
    for pad in (0, 1):
        ref = _module_tail(h, x, w1, w2, wsa)
        if pad:
            ref = _ref_pad(ref, 1)
        out = block_tail_pallas(h, jnp.asarray(xp), w1, w2, wsa, pad=pad,
                                x_pad=1, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


def test_block_tail_xpad_fallback_and_grad(rng):
    """CPU fallback with a padded skip input: forward parity and gradient
    parity vs autodiff of the module composition (the padded skip's border
    must receive zero gradient from this op)."""
    from ducosy_tpu.ops.pallas.cbam_block import block_tail_fused
    from ducosy_tpu.ops.pallas.instance_norm import EPS

    c = 64
    h = jnp.asarray(rng.standard_normal((2, 8, 8, c)), jnp.float32)
    xp = jnp.asarray(rng.standard_normal((2, 10, 10, c)), jnp.float32)
    w1, w2, wsa = _tail_params(rng, c, r=4)
    tangent = jnp.asarray(rng.standard_normal((2, 10, 10, c)), jnp.float32)

    def fused_loss(*args):
        return jnp.sum(block_tail_fused(*args, EPS, 1, 1) * tangent)

    def ref_loss(h, xp, w1, w2, wsa):
        from ducosy_tpu.models.layers import reflect_pad
        core = _module_tail(h, xp[:, 1:-1, 1:-1, :], w1, w2, wsa)
        return jnp.sum(reflect_pad(core, 1) * tangent)

    np.testing.assert_allclose(
        np.asarray(block_tail_fused(h, xp, w1, w2, wsa, EPS, 1, 1)),
        np.asarray(_ref_pad(
            _module_tail(h, xp[:, 1:-1, 1:-1, :], w1, w2, wsa), 1)),
        rtol=2e-4, atol=2e-5)
    g_fused = jax.grad(fused_loss, argnums=(0, 1, 2, 3, 4))(
        h, xp, w1, w2, wsa)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(h, xp, w1, w2, wsa)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)
    border = np.asarray(g_fused[1])
    assert np.all(border[:, 0, :, :] == 0) and np.all(border[:, -1, :, :] == 0)


def test_bwd_kernel_interpret_matches_analytic(rng):
    """The Pallas backward kernel (one-pass dx with ReLU mask + pad-adjoint
    fold) must match the analytic XLA backward for every (relu, pad)
    combination the trunk uses."""
    from ducosy_tpu.ops.pallas.instance_norm import (
        EPS, instance_norm_bwd_pallas, reflect_pad_adjoint)
    import ducosy_tpu.ops.pallas.instance_norm as inmod

    x = jnp.asarray(rng.standard_normal((2, 12, 12, 128)), jnp.float32)
    for relu in (False, True):
        for pad in (0, 1):
            g = jnp.asarray(
                rng.standard_normal((2, 12 + 2 * pad, 12 + 2 * pad, 128)),
                jnp.float32)
            want = inmod._bwd(relu, EPS, pad, 1, x, g)[0]
            got = instance_norm_bwd_pallas(x, g, relu=relu, pad=pad,
                                           interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-4, atol=2e-5,
                                       err_msg=f"relu={relu} pad={pad}")


def test_reflect_fold_matches_pad_adjoint(rng):
    """reflect_fold_hw (slice+add, Mosaic-lowerable) vs the .at-based
    reflect_pad_adjoint used by the XLA path, and vs jax.vjp of jnp.pad."""
    from ducosy_tpu.ops.pallas.instance_norm import (
        reflect_fold_hw, reflect_pad_adjoint)

    for p in (1, 2):
        g = jnp.asarray(rng.standard_normal((2, 9 + 2 * p, 9 + 2 * p, 3)),
                        jnp.float32)
        want = reflect_pad_adjoint(g, p)
        got = reflect_fold_hw(g, p, h_axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)
        x = jnp.zeros((2, 9, 9, 3), jnp.float32)
        _, vjp = jax.vjp(lambda v: jnp.pad(
            v, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect"), x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(vjp(g)[0]),
                                   rtol=1e-6, atol=1e-6)


def test_block_tail_bwd_kernel_matches_autodiff(rng):
    """The one-pass Pallas tail backward must match jax.vjp of the XLA
    composition for every (pad, x_pad) combination the trunk uses —
    cotangents for h, the (possibly padded) skip input, and all three
    CBAM weights."""
    from ducosy_tpu.ops.pallas.cbam_block import (
        _xla_block_tail, block_tail_bwd_pallas)
    from ducosy_tpu.ops.pallas.instance_norm import EPS, reflect_pad_adjoint

    c = 128
    h = jnp.asarray(rng.standard_normal((2, 12, 12, c)), jnp.float32)
    w1, w2, wsa = _tail_params(rng, c, r=8)
    for pad in (0, 1):
        for x_pad in (0, 1):
            x = jnp.asarray(
                rng.standard_normal((2, 12 + 2 * x_pad, 12 + 2 * x_pad, c)),
                jnp.float32)
            g = jnp.asarray(
                rng.standard_normal((2, 12 + 2 * pad, 12 + 2 * pad, c)),
                jnp.float32)
            _, vjp = jax.vjp(
                lambda *a: _xla_block_tail(*a, EPS, 0, x_pad),
                h, x, w1, w2, wsa)
            want = vjp(reflect_pad_adjoint(g, pad).astype(g.dtype))
            got = block_tail_bwd_pallas(h, g, w1, w2, wsa, eps=EPS,
                                        pad=pad, x_pad=x_pad,
                                        interpret=True)
            for name, a, b in zip(("dh", "dx", "dw1", "dw2", "dwsa"),
                                  got, want):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
                    err_msg=f"{name} pad={pad} x_pad={x_pad}")


def test_analytic_tail_bwd_matches_autodiff(rng):
    """The hand-written adjoint chain (_analytic_tail_bwd — the training
    default) must match jax.vjp of the XLA composition for every
    (pad, x_pad) combination the trunk uses.

    fp32: elementwise-tight (the real correctness guard — with no rounding
    noise the analytic chain must reproduce the composition's VJP term by
    term).

    bf16: NOT elementwise. Both paths see bf16-quantized y/t/g, so both
    carry (a) a dense rounding-noise floor and (b) isolated O(1)-relative
    outliers where a max-pool argmax resolves differently at the bf16
    rounding floor (a tie flip moves the whole max-adjoint mass to a
    different channel/position; diagnosed round 4 — the dh outliers pair
    up two channels at one (n,h,w), the flip signature). Neither path is
    ground truth; across seeds each one's worst case exceeds the other's
    roughly half the time with mean ratios up to ~4x (measured over
    seeds 0-2 x all pad combos). A worst-case-magnitude ratio between
    them is therefore comparator noise — exactly how the round-3 1.5x
    bound went red on this box. The bf16 assertion is an error-PROFILE
    parity vs the fp32 truth instead: mean within 4x, big tensors also
    bounded in outlier count (tie flips are isolated: tens out of 36864)
    and in absolute worst case (a flip is bounded by the moved adjoint
    mass, ~0.6 relative here; a systematic error would not be)."""
    from ducosy_tpu.ops.pallas.cbam_block import (
        _analytic_tail_bwd, _xla_block_tail)
    from ducosy_tpu.ops.pallas.instance_norm import EPS, reflect_pad_adjoint

    c = 128
    names = ("dh", "dx", "dw1", "dw2", "dwsa")
    h32 = rng.standard_normal((2, 12, 12, c)).astype(np.float32)
    w1, w2, wsa = _tail_params(rng, c, r=8)
    for pad in (0, 1):
        for x_pad in (0, 1):
            x32 = rng.standard_normal(
                (2, 12 + 2 * x_pad, 12 + 2 * x_pad, c)).astype(np.float32)
            g32 = rng.standard_normal(
                (2, 12 + 2 * pad, 12 + 2 * pad, c)).astype(np.float32)

            def autodiff(dt):
                h, x, g = (jnp.asarray(h32, dt), jnp.asarray(x32, dt),
                           jnp.asarray(g32, dt))
                _, vjp = jax.vjp(
                    lambda *a: _xla_block_tail(*a, EPS, 0, x_pad),
                    h, x, w1, w2, wsa)
                return vjp(reflect_pad_adjoint(g, pad).astype(g.dtype))

            truth = autodiff(jnp.float32)

            # fp32: elementwise parity with the composition's VJP
            got32 = _analytic_tail_bwd(
                jnp.asarray(h32), w1, w2, wsa, jnp.asarray(g32), EPS,
                pad, x_pad)
            for name, a, b in zip(names, got32, truth):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-3,
                    atol=2e-4 * max(1.0, float(jnp.max(jnp.abs(b)))),
                    err_msg=f"{name} pad={pad} x_pad={x_pad} fp32")

            # bf16: error-profile parity vs the fp32 truth (see docstring)
            ad16 = autodiff(jnp.bfloat16)
            got16 = _analytic_tail_bwd(
                jnp.asarray(h32, jnp.bfloat16), w1, w2, wsa,
                jnp.asarray(g32, jnp.bfloat16), EPS, pad, x_pad)
            assert np.asarray(got16[0]).dtype == np.dtype(jnp.bfloat16)
            for name, t, a, b in zip(names, truth, ad16, got16):
                t, a, b = (np.asarray(v, np.float32) for v in (t, a, b))
                sc = max(1.0, float(np.max(np.abs(t))))
                err_ad = np.abs(a - t) / sc
                err_an = np.abs(b - t) / sc
                msg = f"{name} pad={pad} x_pad={x_pad} bf16"
                if err_an.size >= 4096:
                    # big activation cotangents (dh, dx): dense-noise mean
                    # parity, and outliers must be ISOLATED tie flips —
                    # bounded count, bounded magnitude
                    assert err_an.mean() <= max(4.0 * err_ad.mean(),
                                                3e-4), msg
                    n_an = int((err_an > 0.02).sum())
                    n_ad = int((err_ad > 0.02).sum())
                    assert n_an <= max(4 * n_ad, 64), (msg, n_an, n_ad)
                    assert n_an <= 2e-3 * err_an.size, (msg, n_an)
                    assert err_an.max() <= max(2.5 * err_ad.max(), 0.25), msg
                    assert err_an.max() <= 1.0, msg
                else:
                    # small weight grads (dw1/dw2/dwsa): a single pooled-
                    # stat flip tilts whole rows of the (C,R) bottleneck
                    # grads, so the mean itself is outlier-dominated in
                    # BOTH paths (up to ~5x either direction by seed) —
                    # bound mean and worst case with absolute floors
                    assert err_an.mean() <= max(4.0 * err_ad.mean(),
                                                0.02), msg
                    assert err_an.max() <= max(4.0 * err_ad.max(), 0.25), msg


def test_phase_grouped_interpret_matches_packed_in_relu(rng):
    """phases > 1: statistics pool over (H, W, phase groups) of a phase-
    major space-to-depth tensor — must match models/fused.packed_in_relu
    (forward) for both packing factors the packed generator uses."""
    from ducosy_tpu.models.fused import packed_in_relu

    for phases, c in ((4, 32), (16, 8)):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, phases * c)),
                        jnp.float32)
        want = packed_in_relu(x, phases)
        got = instance_norm_pallas(x, relu=True, phases=phases,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"phases={phases}")


def test_phase_grouped_fallback_and_grad(rng):
    """CPU path of instance_norm_fused with phases: forward equals
    packed_in_relu; the analytic VJP equals jax.grad through it."""
    from ducosy_tpu.models.fused import packed_in_relu
    from ducosy_tpu.ops.pallas.instance_norm import EPS

    phases, c = 4, 8
    x = jnp.asarray(rng.standard_normal((2, 6, 6, phases * c)), jnp.float32)
    tangent = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

    got = instance_norm_fused(x, True, EPS, 0, phases)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(packed_in_relu(x, phases)),
                               rtol=1e-5, atol=1e-6)

    g_ref = jax.grad(lambda v: jnp.sum(packed_in_relu(v, phases)
                                       * tangent))(x)
    g_fused = jax.grad(lambda v: jnp.sum(
        instance_norm_fused(v, True, EPS, 0, phases) * tangent))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-3, atol=1e-5)
