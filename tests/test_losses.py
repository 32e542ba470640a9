"""Loss-suite tests against independent numpy recomputation of the reference
formulas (modules/trainer.py:22-184, 462-512)."""
import numpy as np
import jax.numpy as jnp
from scipy.signal import correlate

from ducosy_tpu.config import LossConfig, TrainConfig
from ducosy_tpu.losses import basic, contrast
from ducosy_tpu.losses import ssim as ssim_mod
from ducosy_tpu.losses.suite import generator_loss, discriminator_loss


def _nhwc(rng, n=2, h=32, w=32, c=1):
    return rng.uniform(-1, 1, size=(n, h, w, c)).astype(np.float32)


def test_gradient_loss(rng):
    p, t = _nhwc(rng), _nhwc(rng)
    got = float(basic.gradient_loss(jnp.asarray(p), jnp.asarray(t)))
    dy = np.mean(np.abs(np.abs(np.diff(p, axis=1)) - np.abs(np.diff(t, axis=1))))
    dx = np.mean(np.abs(np.abs(np.diff(p, axis=2)) - np.abs(np.diff(t, axis=2))))
    np.testing.assert_allclose(got, dx + dy, rtol=1e-5)


def _np_box_blur(x, k):
    """count_include_pad avg pool stride 1, pad k//2 (NHWC, C=1)."""
    pad = k // 2
    out = np.zeros_like(x)
    xpad = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    kern = np.ones((k, k)) / (k * k)
    for n in range(x.shape[0]):
        out[n, :, :, 0] = correlate(xpad[n, :, :, 0], kern, mode="valid")
    return out


def test_contrast_attention_loss(rng):
    p, t, s = _nhwc(rng), _nhwc(rng), _nhwc(rng)
    got = float(contrast.contrast_attention_loss(
        jnp.asarray(p), jnp.asarray(t), jnp.asarray(s),
        sigma=0.15, min_weight=1.0, max_weight=3.0, blur_kernel=7))
    tb, sb, pb = _np_box_blur(t, 7), _np_box_blur(s, 7), _np_box_blur(p, 7)
    diff = np.abs(tb - sb)
    w = 1.0 + 2.0 * (1 - np.exp(-diff / 0.15))
    want = np.mean(w * np.abs(pb - tb))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_contrast_region_loss(rng):
    p, t, s = _nhwc(rng), _nhwc(rng), _nhwc(rng)
    got = float(contrast.contrast_region_loss(
        jnp.asarray(p), jnp.asarray(t), jnp.asarray(s),
        threshold=0.15, weight=1.5, pool=8))

    def pool8(x):
        n, h, w, c = x.shape
        return x.reshape(n, h // 8, 8, w // 8, 8, c).mean(axis=(2, 4))

    pp, tp, sp = pool8(p), pool8(t), pool8(s)
    mask = 1 / (1 + np.exp(-5 * ((tp - sp) - 0.15)))
    region = np.mean(mask * np.abs(pp - tp))
    dist = (abs(p.mean() - t.mean())
            + abs(p.std(ddof=1) - t.std(ddof=1)))
    want = 1.5 * (region + 0.5 * dist)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_contrast_edge_loss(rng):
    p, t = _nhwc(rng), _nhwc(rng)
    got = float(contrast.contrast_edge_loss(jnp.asarray(p), jnp.asarray(t)))

    sx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
    sy = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)

    def edges(x):
        out = np.zeros_like(x)
        xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        for n in range(x.shape[0]):
            gx = correlate(xp[n, :, :, 0], sx, mode="valid")
            gy = correlate(xp[n, :, :, 0], sy, mode="valid")
            out[n, :, :, 0] = np.sqrt(gx ** 2 + gy ** 2 + 1e-6)
        return out

    pe, te = edges(p), edges(t)
    stats = abs(pe.mean() - te.mean()) + abs(pe.std(ddof=1) - te.std(ddof=1))
    k = int(pe.size * 0.1)
    topk = abs(np.sort(pe.ravel())[-k:].mean()
               - np.sort(te.ravel())[-k:].mean())
    np.testing.assert_allclose(got, stats + topk, rtol=1e-4)


def _np_ssim(x, y, win_size=11, sigma=1.5, data_range=1.0):
    """Direct numpy SSIM with VALID gaussian window, biased stats
    (pytorch_msssim convention)."""
    coords = np.arange(win_size) - win_size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    win = np.outer(g, g)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2

    def f(im):
        out = []
        for n in range(im.shape[0]):
            out.append(correlate(im[n, :, :, 0].astype(np.float64), win,
                                 mode="valid"))
        return np.stack(out)

    mu1, mu2 = f(x), f(y)
    s1 = f(x * x) - mu1 ** 2
    s2 = f(y * y) - mu2 ** 2
    s12 = f(x * y) - mu1 * mu2
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    m = ((2 * mu1 * mu2 + c1) / (mu1 ** 2 + mu2 ** 2 + c1)) * cs
    return m.mean()


def test_ssim_matches_numpy(rng):
    x, y = _nhwc(rng, h=48, w=48), _nhwc(rng, h=48, w=48)
    got = float(ssim_mod.ssim(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, _np_ssim(x, y), rtol=1e-4)


def test_ssim_identical_is_one(rng):
    x = _nhwc(rng, h=32, w=32)
    got = float(ssim_mod.ssim(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(got, 1.0, atol=1e-5)


def test_ms_ssim_range(rng):
    x = _nhwc(rng, h=192, w=192)
    noise = (x + 0.05 * rng.standard_normal(x.shape)).astype(np.float32)
    v_same = float(ssim_mod.ms_ssim(jnp.asarray(x), jnp.asarray(x)))
    v_noise = float(ssim_mod.ms_ssim(jnp.asarray(x), jnp.asarray(noise)))
    assert v_same > 0.9999
    assert 0.0 < v_noise < v_same


def test_generator_loss_composition(rng):
    """Total must equal the weighted sum of its published terms."""
    cfg = TrainConfig()
    kw = dict(
        real_a=jnp.asarray(_nhwc(rng, h=64, w=64)),
        real_b=jnp.asarray(_nhwc(rng, h=64, w=64)),
        fake_a=jnp.asarray(_nhwc(rng, h=64, w=64)),
        fake_b=jnp.asarray(_nhwc(rng, h=64, w=64)),
        rec_a=jnp.asarray(_nhwc(rng, h=64, w=64)),
        rec_b=jnp.asarray(_nhwc(rng, h=64, w=64)),
        id_a=jnp.asarray(_nhwc(rng, h=64, w=64)),
        id_b=jnp.asarray(_nhwc(rng, h=64, w=64)),
        d_a_fake_logits=jnp.asarray(_nhwc(rng, h=4, w=4)),
        d_b_fake_logits=jnp.asarray(_nhwc(rng, h=4, w=4)),
        cfg=cfg,
    )
    terms = generator_loss(**kw)
    want = (terms.gan + cfg.lambda_cyc * terms.cycle
            + cfg.lambda_id * terms.identity
            + cfg.lambda_grad * terms.grad_cycle
            + cfg.lambda_grad_id * terms.grad_id
            + cfg.lambda_ssim * terms.ssim
            + cfg.lambda_contrast_attention * terms.contrast_attention
            + cfg.lambda_contrast_region * terms.contrast_region
            + cfg.lambda_contrast_edge * terms.contrast_edge)
    np.testing.assert_allclose(float(terms.total), float(want), rtol=1e-6)


def test_discriminator_loss(rng):
    r = jnp.asarray(_nhwc(rng, h=4, w=4))
    f = jnp.asarray(_nhwc(rng, h=4, w=4))
    got = float(discriminator_loss(r, f))
    want = (np.mean((np.asarray(r) - 1) ** 2) + np.mean(np.asarray(f) ** 2)) / 2
    np.testing.assert_allclose(got, want, rtol=1e-5)
