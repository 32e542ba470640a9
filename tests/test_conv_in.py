"""Mega-fused conv+IN / conv+block-tail kernels (ops/pallas/conv_in.py).

Reference semantics: modules/model.py:68-87 (residual block = conv ->
IN -> ReLU -> conv -> IN -> CBAM -> skip-add). The Pallas kernels are
exercised in interpret mode here; the compiled path is parity-checked and
A/B'd on hardware (scripts/proto_conv_in.py, docs/PERF.md)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ducosy_tpu.ops.pallas.conv_in import (
    _xla_conv_in,
    _xla_conv_tail,
    conv3x3_in_pallas,
    conv_block_tail_pallas,
    residual_block_fused,
    residual_block_pallas,
)

pytestmark = pytest.mark.slow  # full-tier only: heavy compiles /
# torch parity (round-5 fast tier: pytest -m "not slow")



@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_conv_in_interpret_matches_xla(rng):
    n, hw, c = 2, 24, 128
    xp = jnp.asarray(rng.standard_normal((n, hw + 2, hw + 2, c)),
                     jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    got = conv3x3_in_pallas(xp, w, interpret=True)
    ref = _xla_conv_in(xp, w, relu=True, eps=1e-5, pad=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv_in_bias_invariance(rng):
    """The kernel takes no bias: IN's mean subtraction makes any
    per-channel additive constant a no-op, so the biased XLA composition
    must agree with the bias-free kernel."""
    n, hw, c = 1, 16, 128
    xp = jnp.asarray(rng.standard_normal((n, hw + 2, hw + 2, c)),
                     jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((c,)) * 3.0, jnp.float32)
    y = jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    from ducosy_tpu.ops.pallas.instance_norm import instance_norm_fused
    ref = instance_norm_fused(y + b, True, 1e-5, 1)
    got = conv3x3_in_pallas(xp, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv_tail_interpret_matches_xla(rng):
    n, hw, c = 2, 24, 128
    tp = jnp.asarray(rng.standard_normal((n, hw + 2, hw + 2, c)),
                     jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, hw + 2, hw + 2, c)),
                    jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    r = c // 16
    w1 = jnp.asarray(rng.standard_normal((c, r)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((r, c)) * 0.1, jnp.float32)
    wsa = jnp.asarray(rng.standard_normal((7, 7, 2, 1)) * 0.1, jnp.float32)
    for pad in (0, 1):
        got = conv_block_tail_pallas(tp, x, w, w1, w2, wsa, pad=pad,
                                     x_pad=1, interpret=True)
        ref = _xla_conv_tail(tp, x, w, w1, w2, wsa, eps=1e-5, pad=pad,
                             x_pad=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5, err_msg=f"pad={pad}")


def test_packed_forward_mega_trunk_matches_module(rng):
    """trunk="mega" end to end: the packed forward with the conv-folded
    trunk must match the canonical Flax module (CPU exercises the XLA
    fallback composition, proving the fused.py wiring — bias dropping,
    pad plumbing, carry layout; the compiled kernels are parity-checked
    above in interpret mode and on hardware)."""
    from ducosy_tpu.models.fused import generator_apply_packed
    from ducosy_tpu.models.generator import Generator

    gen = Generator(input_channels=1, num_residual_blocks=3, use_cbam=True,
                    dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 1)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), x)["params"]
    ref = gen.apply({"params": params}, x)
    out = generator_apply_packed(params, x, num_residual_blocks=3,
                                 dtype=jnp.float32, trunk="mega")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_engine_accepts_trunk_flag(rng):
    """The engine threads trunk= through to the packed forward; on CPU the
    auto forward is 'module', so force packed via forward='packed'."""
    from ducosy_tpu.models.generator import Generator
    from ducosy_tpu.infer.engine import DualGeneratorEngine

    gen = Generator(input_channels=1, num_residual_blocks=2, use_cbam=True,
                    dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), x)["params"]
    eng = DualGeneratorEngine(params, params, img_size=64,
                              compute_dtype=jnp.float32,
                              forward="packed", trunk="mega")
    assert eng.trunk == "mega"
    vol = rng.integers(-1000, 2000, (3, 64, 64)).astype(np.int16)
    out = eng.run_patient(vol, 1.0, 0.0)
    assert out.shape == vol.shape and np.isfinite(out).all()


def test_conv_in_int8_write_matches_xla_grid(rng):
    """int8_scale: the kernel's quantized output write must land on the
    same shifted grid as instance_norm_int8 applied to the XLA conv
    (boundary rounding may differ by one quantization step)."""
    n, hw, c = 2, 24, 128
    xp = jnp.asarray(rng.standard_normal((n, hw + 2, hw + 2, c)),
                     jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    got = conv3x3_in_pallas(xp, w, int8_scale=6.0, interpret=True)
    ref = _xla_conv_in(xp, w, relu=True, eps=1e-5, pad=1, int8_scale=6.0)
    assert got.dtype == jnp.int8 and ref.dtype == jnp.int8
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.01, (diff > 0).mean()


def test_conv_tail_int8_matches_xla(rng):
    """in_int8: the tail's int8 MXU taps feed the IN statistics straight
    off the int32 accumulator; that must agree with the XLA fallback's
    dequantize-then-normalize (IN is invariant to per-channel affines)."""
    n, hw, c = 2, 24, 128
    tp = jnp.asarray(rng.integers(-128, 128, (n, hw + 2, hw + 2, c)),
                     jnp.int8)
    x = jnp.asarray(rng.standard_normal((n, hw + 2, hw + 2, c)),
                    jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    r = c // 16
    w1 = jnp.asarray(rng.standard_normal((c, r)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((r, c)) * 0.1, jnp.float32)
    wsa = jnp.asarray(rng.standard_normal((7, 7, 2, 1)) * 0.1, jnp.float32)
    for pad in (0, 1):
        got = conv_block_tail_pallas(tp, x, w, w1, w2, wsa, pad=pad,
                                     x_pad=1, in_int8=True, interpret=True)
        ref = _xla_conv_tail(tp, x, w, w1, w2, wsa, eps=1e-5, pad=pad,
                             x_pad=1, in_int8_scale=6.0)
        assert got.dtype == x.dtype
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"pad={pad}")


def test_packed_forward_mega_int8_close_to_fp32(rng):
    """trunk='mega' + quant='trunk' end to end (CPU exercises the XLA
    fallback composition): the quantized mega trunk must track the fp32
    forward within the same budget as the non-mega int8 path — the INs
    absorb every quantization scale, leaving 8-bit rounding noise."""
    from ducosy_tpu.models.fused import generator_apply_packed
    from ducosy_tpu.models.generator import Generator

    gen = Generator(input_channels=1, num_residual_blocks=2, use_cbam=True,
                    dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 1)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(3), x)["params"]
    ref = np.asarray(generator_apply_packed(
        params, x, num_residual_blocks=2, dtype=jnp.float32))
    out = np.asarray(generator_apply_packed(
        params, x, num_residual_blocks=2, dtype=jnp.float32,
        trunk="mega", quant="trunk"))
    err = np.abs(out - ref)
    assert err.max() < 0.05, err.max()
    assert err.mean() < 0.01, err.mean()


def test_residual_block_mono_matches_two_kernel(rng):
    """The mono kernel (whole block, one pallas_call) must reproduce the
    two-kernel mega composition exactly up to fp rounding — same taps,
    same IN statistics, same CBAM math, just no HBM round trip for the
    intermediate."""
    n, hw, c = 2, 24, 128
    xp = jnp.asarray(rng.standard_normal((n, hw + 2, hw + 2, c)),
                     jnp.float32)
    wa = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    wb = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    r = c // 16
    w1 = jnp.asarray(rng.standard_normal((c, r)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((r, c)) * 0.1, jnp.float32)
    wsa = jnp.asarray(rng.standard_normal((7, 7, 2, 1)) * 0.1, jnp.float32)
    for pad in (0, 1):
        got = residual_block_pallas(xp, wa, wb, w1, w2, wsa, pad=pad,
                                    interpret=True)
        t = _xla_conv_in(xp, wa, relu=True, eps=1e-5, pad=1)
        ref = _xla_conv_tail(t, xp, wb, w1, w2, wsa, eps=1e-5, pad=pad,
                             x_pad=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"pad={pad}")


def test_residual_block_mono_quant_close(rng):
    """quant=True: conv2 runs int8 from the in-register shifted-grid
    intermediate; must track the bf16 mono block within 8-bit rounding
    noise (the INs absorb every scale)."""
    n, hw, c = 2, 24, 128
    xp = jnp.asarray(rng.standard_normal((n, hw + 2, hw + 2, c)),
                     jnp.float32)
    wa = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    wb = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    r = c // 16
    w1 = jnp.asarray(rng.standard_normal((c, r)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((r, c)) * 0.1, jnp.float32)
    wsa = jnp.asarray(rng.standard_normal((7, 7, 2, 1)) * 0.1, jnp.float32)
    ref = residual_block_pallas(xp, wa, wb, w1, w2, wsa, pad=1,
                                interpret=True)
    got = residual_block_pallas(xp, wa, wb, w1, w2, wsa, pad=1, quant=True,
                                interpret=True)
    err = np.abs(np.asarray(got) - np.asarray(ref))
    assert err.mean() < 0.01, err.mean()
    assert err.max() < 0.1, err.max()


def test_packed_forward_mono_matches_module(rng):
    """trunk='mono' end to end (CPU exercises the XLA fallback
    composition): must agree with the canonical module forward."""
    from ducosy_tpu.models.fused import generator_apply_packed
    from ducosy_tpu.models.generator import Generator

    gen = Generator(input_channels=1, num_residual_blocks=2, use_cbam=True,
                    dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 1)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(4), x)["params"]
    ref = gen.apply({"params": params}, x)
    out = generator_apply_packed(params, x, num_residual_blocks=2,
                                 dtype=jnp.float32, trunk="mono")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_residual_chain_matches_mono_sequence(rng):
    """chain kernel (k blocks, one pallas_call, carry VMEM-resident) must
    reproduce k sequential mono blocks exactly up to fp rounding."""
    from ducosy_tpu.ops.pallas.conv_in import residual_chain_pallas

    n, hw, c, k = 2, 20, 128, 3
    xp = jnp.asarray(rng.standard_normal((n, hw + 2, hw + 2, c)),
                     jnp.float32)
    was = jnp.asarray(rng.standard_normal((k, 3, 3, c, c)) * 0.05,
                      jnp.float32)
    wbs = jnp.asarray(rng.standard_normal((k, 3, 3, c, c)) * 0.05,
                      jnp.float32)
    r = c // 16
    w1s = jnp.asarray(rng.standard_normal((k, c, r)) * 0.1, jnp.float32)
    w2s = jnp.asarray(rng.standard_normal((k, r, c)) * 0.1, jnp.float32)
    wsas = jnp.asarray(rng.standard_normal((k, 7, 7, 2, 1)) * 0.1,
                       jnp.float32)
    for pad, quant in ((0, False), (1, False), (1, True)):
        got = residual_chain_pallas(xp, was, wbs, w1s, w2s, wsas, pad=pad,
                                    quant=quant, interpret=True)
        ref = xp
        for j in range(k):
            ref = residual_block_pallas(
                ref, was[j], wbs[j], w1s[j], w2s[j], wsas[j],
                pad=pad if j == k - 1 else 1, quant=quant, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"pad={pad} quant={quant}")


def test_packed_forward_chain_matches_module(rng):
    """trunk='chain2' end to end over a 3-block net (one full group + a
    remainder group; CPU exercises the per-block XLA fallback): must agree
    with the canonical module forward."""
    from ducosy_tpu.models.fused import generator_apply_packed
    from ducosy_tpu.models.generator import Generator

    gen = Generator(input_channels=1, num_residual_blocks=3, use_cbam=True,
                    dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 1)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(5), x)["params"]
    ref = gen.apply({"params": params}, x)
    out = generator_apply_packed(params, x, num_residual_blocks=3,
                                 dtype=jnp.float32, trunk="chain2")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
