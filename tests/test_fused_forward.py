"""The TPU-optimized functional generator (models/fused.py) must be
numerically equivalent to the canonical Flax Generator on the same param
tree — stem s2d conv, subpixel up-convs, fused trunk (XLA fallbacks on
CPU), head. fp32 on CPU for a tight tolerance."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ducosy_tpu.models import Generator
from ducosy_tpu.models.fused import (
    generator_apply_fused,
    s2d_conv_kernel,
    stem_s2d,
    subpixel_kernel,
    upsample_conv_subpixel,
)

pytestmark = pytest.mark.slow  # full-tier only: heavy compiles /
# torch parity (round-5 fast tier: pytest -m "not slow")



@pytest.mark.parametrize("channels,img", [(3, 64), (1, 64)])
def test_fused_forward_matches_module(rng, channels, img):
    gen = Generator(input_channels=channels, num_residual_blocks=2,
                    use_cbam=True, dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (2, img, img, channels)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), x)["params"]
    ref = gen.apply({"params": params}, x)
    out = generator_apply_fused(params, x, num_residual_blocks=2,
                                dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_forward_no_cbam(rng):
    gen = Generator(input_channels=1, num_residual_blocks=2, use_cbam=False,
                    dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 1)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(1), x)["params"]
    ref = gen.apply({"params": params}, x)
    out = generator_apply_fused(params, x, num_residual_blocks=2,
                                use_cbam=False, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_stem_s2d_exact(rng):
    """s2d-grid stem == ReflectionPad(3) + 7x7 VALID conv."""
    from ducosy_tpu.models.layers import reflect_pad

    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        reflect_pad(x, 3), w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    out = stem_s2d(x, w, b, ref_pad=3, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_subpixel_exact(rng):
    """subpixel up-conv == nearest-upsample + zero-pad + 3x3 VALID conv."""
    from ducosy_tpu.models.layers import upsample_nearest_2x

    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 4)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(4) * 0.1, jnp.float32)
    up = jnp.pad(upsample_nearest_2x(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = jax.lax.conv_general_dilated(
        up, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    out = upsample_conv_subpixel(x, w, b, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_forward_grads_flow(rng):
    """Training usability: gradients through the fused forward reach every
    parameter and match the module's gradients."""
    gen = Generator(input_channels=1, num_residual_blocks=1, use_cbam=True,
                    dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 1)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(2), x)["params"]
    tgt = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 1)), jnp.float32)

    g_ref = jax.grad(lambda p: jnp.mean(
        (gen.apply({"params": p}, x) - tgt) ** 2))(params)
    g_fused = jax.grad(lambda p: jnp.mean(
        (generator_apply_fused(p, x, num_residual_blocks=1,
                               dtype=jnp.float32) - tgt) ** 2))(params)
    ref_flat = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(g_ref)}
    fused_flat = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_leaves_with_path(g_fused)}
    assert set(ref_flat) == set(fused_flat)
    for key in ref_flat:
        np.testing.assert_allclose(np.asarray(fused_flat[key]),
                                   np.asarray(ref_flat[key]),
                                   rtol=5e-3, atol=1e-6, err_msg=key)


def test_packed_forward_matches_module(rng):
    """The fully packed (space-to-depth) forward must equal the Flax module
    bit-for-bit at fp32 tolerance — including the reflect-padded head
    computed entirely in packed-16 layout."""
    from ducosy_tpu.models.fused import generator_apply_packed

    for channels in (1, 3):
        gen = Generator(input_channels=channels, num_residual_blocks=2,
                        use_cbam=True, dtype=jnp.float32)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, channels)),
                        jnp.float32)
        params = gen.init(jax.random.PRNGKey(0), x)["params"]
        ref = gen.apply({"params": params}, x)
        out = generator_apply_packed(params, x, num_residual_blocks=2,
                                     dtype=jnp.float32)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_packed_forward_grads_flow(rng):
    from ducosy_tpu.models.fused import generator_apply_packed

    gen = Generator(input_channels=1, num_residual_blocks=1, use_cbam=True,
                    dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 1)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(2), x)["params"]
    tgt = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 1)), jnp.float32)

    g_ref = jax.grad(lambda p: jnp.mean(
        (gen.apply({"params": p}, x) - tgt) ** 2))(params)
    g_pk = jax.grad(lambda p: jnp.mean(
        (generator_apply_packed(p, x, num_residual_blocks=1,
                                dtype=jnp.float32) - tgt) ** 2))(params)
    ref_flat = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(g_ref)}
    pk_flat = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_leaves_with_path(g_pk)}
    assert set(ref_flat) == set(pk_flat)
    for key in ref_flat:
        np.testing.assert_allclose(np.asarray(pk_flat[key]),
                                   np.asarray(ref_flat[key]),
                                   rtol=5e-3, atol=1e-6, err_msg=key)


@pytest.mark.parametrize("encoder_fused", [True, False])
def test_packed_forward_pallas_trunk_matches_module(rng, encoder_fused):
    """trunk="pallas": the fully fused trunk (pad-folded IN + block tail
    with padded-carry skip) must match the Flax module — forward and
    gradients (CPU exercises the composition through the kernels' XLA
    fallbacks; the compiled path is covered in interpret mode in
    test_pallas.py and A/B'd on hardware). encoder_fused=True is the
    inference composition (down1/down2 norms through the fused IN, down2's
    priming the trunk carry); False is the training composition."""
    from ducosy_tpu.models.fused import generator_apply_packed

    gen = Generator(input_channels=1, num_residual_blocks=3, use_cbam=True,
                    dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 1)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), x)["params"]
    ref = gen.apply({"params": params}, x)
    out = generator_apply_packed(params, x, num_residual_blocks=3,
                                 dtype=jnp.float32, trunk="pallas",
                                 encoder_fused=encoder_fused)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    tgt = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 1)), jnp.float32)
    g_ref = jax.grad(lambda p: jnp.mean(
        (gen.apply({"params": p}, x) - tgt) ** 2))(params)
    g_pk = jax.grad(lambda p: jnp.mean(
        (generator_apply_packed(p, x, num_residual_blocks=3,
                                dtype=jnp.float32, trunk="pallas",
                                encoder_fused=encoder_fused)
         - tgt) ** 2))(params)
    for (key, a), b in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves(g_pk)):
        # the noise floor is fp32 InstanceNorm statistics reassociated
        # differently by the custom VJPs: bias-into-IN grads are
        # analytically zero (shift invariance) and stem/encoder grads pass
        # through 6+ norm layers — tolerate noise scaled to each leaf's
        # gradient magnitude, not elementwise rtol
        a, b = np.asarray(a), np.asarray(b)
        atol = 6e-5 + 2e-3 * np.max(np.abs(a))
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=atol,
                                   err_msg=jax.tree_util.keystr(key))


def test_trunk_int8_close_to_fp32(rng):
    """Quantized-serving mode: trunk convs on the int8 path must track the
    fp32 forward closely — every trunk conv feeds an InstanceNorm, which
    absorbs per-channel scale error, leaving only 8-bit rounding noise."""
    from ducosy_tpu.models.fused import generator_apply_packed

    gen = Generator(input_channels=1, num_residual_blocks=2, use_cbam=True,
                    dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 1)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(3), x)["params"]
    ref = np.asarray(generator_apply_packed(
        params, x, num_residual_blocks=2, dtype=jnp.float32))
    out = np.asarray(generator_apply_packed(
        params, x, num_residual_blocks=2, dtype=jnp.float32,
        trunk_int8=True))
    # tanh outputs in [-1, 1]; two int8 convs per block x 2 blocks of
    # rounding noise through the norm-stabilized trunk
    err = np.abs(out - ref)
    assert err.max() < 0.05, err.max()
    # 0.01 on [-1,1] ~= 2 HU in the soft-tissue window — under CT noise
    assert err.mean() < 0.01, err.mean()


def test_full_int8_close_to_fp32(rng):
    """quant='full' also runs stem/down/up2/head on static-scale int8 (the
    decoder stages have no absorbing norm after them, so the tolerance is
    looser than trunk mode's; hardware-measured fidelity in docs/PERF.md)."""
    from ducosy_tpu.models.fused import generator_apply_packed

    gen = Generator(input_channels=1, num_residual_blocks=2, use_cbam=True,
                    dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 1)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(3), x)["params"]
    ref = np.asarray(generator_apply_packed(
        params, x, num_residual_blocks=2, dtype=jnp.float32))
    out = np.asarray(generator_apply_packed(
        params, x, num_residual_blocks=2, dtype=jnp.float32, quant="full"))
    err = np.abs(out - ref)
    assert err.max() < 0.25, err.max()
    # ~0.016 measured; 0.025 on [-1,1] ~= 5 HU in the soft-tissue window
    assert err.mean() < 0.025, err.mean()


def test_quant_rejects_unknown_mode(rng):
    from ducosy_tpu.models.fused import generator_apply_packed

    gen = Generator(input_channels=1, num_residual_blocks=1,
                    dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), x)["params"]
    with pytest.raises(ValueError, match="quant"):
        generator_apply_packed(params, x, num_residual_blocks=1,
                               quant="int4")


def test_conv_int8_static_shifted_grid_exact(rng):
    """zero_point=128: conv(q, wq) + 128*sum(wq)_c must exactly equal the
    conv of the dequantized operands, including -128-padded borders (the
    exact encoding of 0 on the shifted grid)."""
    from ducosy_tpu.models.fused import _conv_int8_static

    S = 6.0
    q = jnp.asarray(rng.integers(-128, 128, (2, 10, 10, 16)), jnp.int8)
    q_pad = jnp.pad(q, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-128)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(8) * 0.1, jnp.float32)
    out = np.asarray(_conv_int8_static(q_pad, w, b, S, dtype=jnp.float32,
                                       zero_point=128))

    ws = np.maximum(np.abs(np.asarray(w)).max(axis=(0, 1, 2)), 1e-12) / 127
    wdq = np.round(np.asarray(w) / ws) * ws
    xdq = (np.asarray(q_pad, np.float32) + 128.0) * (S / 255.0)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(xdq), jnp.asarray(wdq), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_packed_in_relu_int8_semantics(rng):
    """q = trunc(min(relu(IN(x)) * 255/S + 0.5, 255)) - 128, stats pooled
    over phase groups — exact recompute."""
    from ducosy_tpu.models.fused import packed_in_relu_int8, packed_in_relu

    S = 6.0
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)) * 2 + 0.5,
                    jnp.float32)
    got = np.asarray(packed_in_relu_int8(x, 4, S))
    y = np.asarray(packed_in_relu(x, 4))
    want = np.minimum(y * (255.0 / S) + 0.5, 255.0).astype(np.int32) - 128
    np.testing.assert_array_equal(got.astype(np.int32), want)


def test_conv_int8_quantization_exact(rng):
    """The int8 conv's accumulation is exact: it must equal the fp32 conv
    of the quantized-and-dequantized operands."""
    from ducosy_tpu.models.fused import _conv_int8

    x = jnp.asarray(rng.uniform(-2, 2, (2, 10, 10, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(8) * 0.1, jnp.float32)
    out = np.asarray(_conv_int8(x, w, b))

    ws = np.maximum(np.abs(np.asarray(w)).max(axis=(0, 1, 2)), 1e-12) / 127
    wdq = np.round(np.asarray(w) / ws) * ws
    xs = np.maximum(np.abs(np.asarray(x)).max(axis=(1, 2, 3)), 1e-12) / 127
    xdq = np.round(np.asarray(x) / xs[:, None, None, None]) \
        * xs[:, None, None, None]
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(xdq), jnp.asarray(wdq), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_trunk_int8_pallas_path_close_to_fp32(rng):
    """The fused quantized path (IN kernel emits int8, conv2 int8 with the
    dequant folded into the conv epilogue) must track fp32 as closely as
    the dynamic-requant path. CPU exercises the XLA fallbacks of the same
    composition."""
    from ducosy_tpu.models.fused import generator_apply_packed

    gen = Generator(input_channels=1, num_residual_blocks=2, use_cbam=True,
                    dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 1)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(4), x)["params"]
    ref = np.asarray(generator_apply_packed(
        params, x, num_residual_blocks=2, dtype=jnp.float32,
        trunk="pallas"))
    out = np.asarray(generator_apply_packed(
        params, x, num_residual_blocks=2, dtype=jnp.float32,
        trunk="pallas", trunk_int8=True))
    err = np.abs(out - ref)
    assert err.max() < 0.05, err.max()
    assert err.mean() < 0.01, err.mean()


def test_instance_norm_int8_semantics(rng):
    """q = trunc(min(relu(IN(x)) * 255/S + 0.5, 255)) - 128 (shifted grid)
    — exact recompute."""
    from ducosy_tpu.ops.pallas.instance_norm import instance_norm_int8

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)) * 3 + 1, jnp.float32)
    q = np.asarray(instance_norm_int8(x, pad=1, scale=6.0))
    assert q.dtype == np.int8 and q.shape == (2, 10, 10, 16)
    x32 = np.asarray(x)
    m = x32.mean((1, 2), keepdims=True)
    v = x32.var((1, 2), keepdims=True)
    y = np.maximum((x32 - m) / np.sqrt(v + 1e-5), 0.0)
    y = np.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    ref = (np.minimum(y * 255.0 / 6.0 + 0.5, 255.0).astype(np.int32)
           - 128).astype(np.int8)
    mismatch = (q != ref).mean()
    assert mismatch < 1e-3, mismatch  # float-boundary ties only
