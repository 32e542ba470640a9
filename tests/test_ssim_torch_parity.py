"""Cross-framework SSIM/MS-SSIM parity.

The env lacks skimage/pytorch_msssim/torchmetrics, so the suite's skimage
parity test skips (tests/test_metrics.py). torch IS available: this file
re-implements pytorch_msssim's SSIM and MS-SSIM semantics directly in torch
(2-D gaussian window, VALID F.conv2d, biased statistics, avg_pool2d
downsampling — the algorithm the reference trains and evaluates with,
/root/reference/modules/trainer.py:10,351,485 and calculate.py:274-291) and
checks our JAX implementation (banded-Toeplitz matmul filtering,
ducosy_tpu/losses/ssim.py) against it. The two share no code path: torch
dense conv2d on CPU vs XLA matmuls — a genuine independent cross-check.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from ducosy_tpu.losses.ssim import ms_ssim, ssim  # noqa: E402

pytestmark = pytest.mark.slow  # full-tier only: heavy compiles /
# torch parity (round-5 fast tier: pytest -m "not slow")


K1, K2 = 0.01, 0.03
MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _window_2d(size=11, sigma=1.5):
    coords = torch.arange(size, dtype=torch.float64) - size // 2
    g = torch.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return (g[:, None] @ g[None, :]).to(torch.float32)


def _torch_ssim_maps(x, y, win, data_range):
    """x, y: (N, 1, H, W) float32. VALID conv with the 2-D gaussian window."""
    c1 = (K1 * data_range) ** 2
    c2 = (K2 * data_range) ** 2
    w = win[None, None]
    mu1 = F.conv2d(x, w)
    mu2 = F.conv2d(y, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1_sq = F.conv2d(x * x, w) - mu1_sq
    s2_sq = F.conv2d(y * y, w) - mu2_sq
    s12 = F.conv2d(x * y, w) - mu12
    cs = (2 * s12 + c2) / (s1_sq + s2_sq + c2)
    ssim_map = ((2 * mu12 + c1) / (mu1_sq + mu2_sq + c1)) * cs
    return ssim_map, cs


def _torch_ms_ssim(x, y, data_range=1.0):
    mcs = []
    for i in range(len(MS_WEIGHTS)):
        ssim_map, cs = _torch_ssim_maps(x, y, _window_2d(), data_range)
        if i < len(MS_WEIGHTS) - 1:
            mcs.append(torch.clamp(cs.mean(), min=0.0))
            pad = [s % 2 for s in x.shape[2:]]
            x = F.avg_pool2d(x, kernel_size=2, padding=pad)
            y = F.avg_pool2d(y, kernel_size=2, padding=pad)
        else:
            value = torch.clamp(ssim_map.mean(), min=0.0)
    result = value ** MS_WEIGHTS[-1]
    for w, cs_v in zip(MS_WEIGHTS[:-1], mcs):
        result = result * cs_v ** w
    return float(result)


def _pair(rng, n, h, w, noise=0.08):
    a = rng.uniform(0, 1, (n, h, w)).astype(np.float32)
    b = np.clip(a + noise * rng.standard_normal((n, h, w)), 0, 1)
    return a, b.astype(np.float32)


@pytest.mark.parametrize("shape", [(2, 64, 64), (1, 57, 43), (3, 33, 95)])
def test_ssim_matches_torch(rng, shape):
    a, b = _pair(rng, *shape)
    got = float(ssim(a, b, data_range=1.0))
    ta, tb = torch.from_numpy(a)[:, None], torch.from_numpy(b)[:, None]
    want = float(_torch_ssim_maps(ta, tb, _window_2d(), 1.0)[0].mean())
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_ssim_data_range_2(rng):
    """Training uses data_range on [-1,1] reconstructions."""
    a, b = _pair(rng, 2, 48, 48)
    a, b = a * 2 - 1, b * 2 - 1
    got = float(ssim(a, b, data_range=2.0))
    ta, tb = torch.from_numpy(a)[:, None], torch.from_numpy(b)[:, None]
    want = float(_torch_ssim_maps(ta, tb, _window_2d(), 2.0)[0].mean())
    np.testing.assert_allclose(got, want, rtol=2e-5)


@pytest.mark.parametrize("hw", [192, 208])
def test_ms_ssim_matches_torch(rng, hw):
    # even at every scale (192 -> 96 -> 48 -> 24 -> 12), so the floor-crop
    # pooling and F.avg_pool2d(padding=0) see identical pixels
    a, b = _pair(rng, 2, hw, hw, noise=0.05)
    got = float(ms_ssim(a, b, data_range=1.0))
    want = _torch_ms_ssim(torch.from_numpy(a)[:, None],
                          torch.from_numpy(b)[:, None])
    np.testing.assert_allclose(got, want, rtol=5e-5)


def test_ms_ssim_identical_is_one(rng):
    a, _ = _pair(rng, 1, 192, 192)
    np.testing.assert_allclose(float(ms_ssim(a, a.copy())), 1.0, atol=1e-5)
