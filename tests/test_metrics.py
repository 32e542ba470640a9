"""Metric suite tests: self-consistency properties plus parity of our
skimage-convention SSIM against a brute-force windowed implementation."""
import numpy as np
import pytest

from ducosy_tpu.eval import metrics


def _vols(rng, z=3, h=48, w=48, noise=0.1):
    a = rng.uniform(-1000, 1000, (z, h, w)).astype(np.float64)
    b = a + noise * rng.standard_normal((z, h, w)) * 100
    return a, b


def test_mae(rng):
    a, b = _vols(rng)
    v, per = metrics.calculate_mae(a, b)
    np.testing.assert_allclose(v, np.mean(np.abs(a - b)))
    assert len(per) == 3
    np.testing.assert_allclose(np.mean(per), v, rtol=1e-6)


def test_psnr_properties(rng):
    a, b = _vols(rng)
    v, per = metrics.calculate_psnr(a, b)
    assert np.isfinite(v) and len(per) == 3
    v_same, per_same = metrics.calculate_psnr(a, a)
    assert v_same == float("inf") and per_same[0] == float("inf")
    # less noise -> higher psnr
    v2, _ = metrics.calculate_psnr(a, a + 0.01 * (b - a))
    assert v2 > v


def test_ssim_brute_force_parity(rng):
    """Our uniform-window SSIM vs a direct per-window computation."""
    s1 = rng.uniform(0, 1, (20, 20))
    s2 = s1 + 0.05 * rng.standard_normal((20, 20))
    got = metrics.ssim_skimage(s1, s2, data_range=1.0, win_size=7)

    vals = []
    for i in range(3, 17):
        for j in range(3, 17):
            w1 = s1[i - 3:i + 4, j - 3:j + 4].ravel()
            w2 = s2[i - 3:i + 4, j - 3:j + 4].ravel()
            ux, uy = w1.mean(), w2.mean()
            vx, vy = w1.var(ddof=1), w2.var(ddof=1)
            vxy = np.cov(w1, w2, ddof=1)[0, 1]
            c1, c2 = 0.01 ** 2, 0.03 ** 2
            vals.append(((2 * ux * uy + c1) * (2 * vxy + c2))
                        / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)))
    np.testing.assert_allclose(got, np.mean(vals), rtol=1e-10)


def test_ssim_ranges(rng):
    a, b = _vols(rng)
    v, per = metrics.calculate_ssim(a, a.copy())
    np.testing.assert_allclose(v, 1.0, atol=1e-12)
    v2, _ = metrics.calculate_ssim(a, b)
    assert v2 < 1.0


def test_skimage_parity_if_available(rng):
    skimage_metrics = pytest.importorskip("skimage.metrics")
    s1 = rng.uniform(0, 255, (32, 32))
    s2 = s1 + 5 * rng.standard_normal((32, 32))
    want = skimage_metrics.structural_similarity(s1, s2, data_range=255.0)
    got = metrics.ssim_skimage(s1, s2, data_range=255.0)
    np.testing.assert_allclose(got, want, rtol=1e-7)


def test_emd(rng):
    a, b = _vols(rng)
    v, per = metrics.calculate_emd(a, a.copy())
    assert v == 0.0
    v2, _ = metrics.calculate_emd(a, b)
    assert v2 > 0.0


def test_ts_scale_invariance(rng):
    a, b = _vols(rng)
    v, _ = metrics.calculate_ts(a, b)
    v_scaled, _ = metrics.calculate_ts(a * 3.7, b * 3.7)
    np.testing.assert_allclose(v, v_scaled, rtol=1e-9)
    v_same, _ = metrics.calculate_ts(a, a.copy())
    assert v_same == 1.0


def test_cs_and_ed(rng):
    a, b = _vols(rng)
    v, _ = metrics.calculate_cs(a, a.copy())
    np.testing.assert_allclose(v, 1.0)
    ed_same, _ = metrics.calculate_ed(a, a.copy())
    np.testing.assert_allclose(ed_same, 0.0, atol=1e-12)
    ed_diff, _ = metrics.calculate_ed(a, b)
    assert ed_diff > 0


def test_lpips_gated():
    v, per = metrics.calculate_lpips(np.zeros((2, 8, 8)), np.zeros((2, 8, 8)))
    assert np.isnan(v) and per == []


def test_ms_ssim_small_returns_nan(rng):
    a, b = _vols(rng)  # 48x48 < 176 minimum
    v, per = metrics.calculate_ms_ssim(a, b)
    assert np.isnan(v)


def test_ms_ssim_large(rng):
    a = rng.uniform(0, 1, (2, 192, 192))
    v, per = metrics.calculate_ms_ssim(a, a + 0.02 * rng.standard_normal(a.shape))
    assert 0.5 < v <= 1.0


def test_ms_ssim_per_slice_is_honest(rng):
    """Per-slice MS-SSIM values are each slice's own score, not the batch
    value replicated (the reference's calculate.py:288 fakes this)."""
    a = rng.uniform(0, 1, (3, 192, 192))
    b = a.copy()
    # scramble slice 1 only — keeps the volume's min/max (and hence the
    # shared normalization) identical, so clean slices stay bit-identical
    b[1] = rng.permutation(b[1].ravel()).reshape(192, 192)
    v, per = metrics.calculate_ms_ssim(a, b)
    assert len(per) == 3
    # clean slices score near-perfect, the scrambled one collapses
    assert per[0] > 0.99 and per[2] > 0.99
    assert per[1] < 0.5
    # volume value = batch-mean computation over the same maps
    assert 0.0 <= v <= 1.0 and v < min(per[0], per[2])


def test_compute_all_keys(rng):
    a, b = _vols(rng)
    out = metrics.compute_all(a, b)
    assert set(out) == {"mae", "psnr", "ssim", "ts", "cs", "ed", "emd",
                        "ms_ssim", "lpips"}
