"""Unit tests for the HU transform core (ducosy_tpu/ops/hu.py) against
independent numpy recomputation of the reference formulas
(reference modules/preprocess.py:6-112)."""
import numpy as np
import jax.numpy as jnp

from ducosy_tpu.ops import hu


def np_soft_squeeze(image, hu_min, hu_max, sigma=50.0):
    normalized = (image - hu_min) / (hu_max - hu_min)
    k = 10.0 / sigma
    soft = 1.0 / (1.0 + np.exp(-k * (normalized - 0.9)))
    out = np.where(normalized < 0.9, normalized, 0.9 + 0.1 * soft)
    return 2.0 * out - 1.0


def test_soft_squeeze_matches_reference_formula(rng):
    img = rng.uniform(-200, 400, size=(64, 64)).astype(np.float32)
    got = np.asarray(hu.soft_squeeze(jnp.asarray(img), -150.0, 250.0))
    want = np_soft_squeeze(img, -150.0, 250.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_soft_squeeze_linear_below_threshold():
    # values whose normalized form is < 0.9 stay linear
    img = np.array([-150.0, 0.0, 100.0], dtype=np.float32)
    got = np.asarray(hu.soft_squeeze(jnp.asarray(img), -150.0, 250.0))
    lin = 2.0 * (img + 150.0) / 400.0 - 1.0
    np.testing.assert_allclose(got, lin, atol=1e-6)


def test_soft_squeeze_compresses_ceiling():
    # above threshold, output stays below the linear map but keeps ordering
    img = np.array([230.0, 240.0, 250.0], dtype=np.float32)
    got = np.asarray(hu.soft_squeeze(jnp.asarray(img), -150.0, 250.0))
    assert np.all(np.diff(got) > 0)
    assert got[-1] < 1.0


def test_hu_transform_linear_path(rng):
    stored = rng.integers(0, 4000, size=(32, 32)).astype(np.float32)
    slope, intercept = 1.0, -1024.0
    got = np.asarray(hu.hu_transform(jnp.asarray(stored), slope, intercept,
                                     -1000.0, -150.0, use_soft_squeezing=False))
    hu_img = np.clip(stored * slope + intercept, -1000, -150)
    want = 2 * (hu_img + 1000) / 850 - 1
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert got.min() >= -1.0 - 1e-6 and got.max() <= 1.0 + 1e-6


def test_denormalize_roundtrip(rng):
    x = rng.uniform(-1, 1, size=(16, 16)).astype(np.float32)
    hu_img = hu.denormalize_to_hu(jnp.asarray(x), -150.0, 250.0)
    back = hu.normalize_window(hu_img, -150.0, 250.0)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-5, atol=1e-5)


def test_hu_to_stored_roundtrip(rng):
    stored = rng.integers(0, 4000, size=(8, 8)).astype(np.float32)
    slope, intercept = 1.0, -1024.0
    hu_img = hu.stored_to_hu(jnp.asarray(stored), slope, intercept)
    back = hu.hu_to_stored(hu_img, slope, intercept)
    np.testing.assert_allclose(np.asarray(back), stored, rtol=1e-5)


def test_apply_windowing_range(rng):
    x = rng.uniform(-1, 1, size=(4, 4)).astype(np.float32)
    win = np.asarray(hu.apply_windowing(jnp.asarray(x), -150.0, 250.0,
                                        40.0, 400.0))
    assert win.min() >= 0.0 and win.max() <= 1.0
    # center of window maps to 0.5
    xc = hu.normalize_window(jnp.asarray([40.0]), -150.0, 250.0)
    wc = hu.apply_windowing(xc, -150.0, 250.0, 40.0, 400.0)
    np.testing.assert_allclose(np.asarray(wc), [0.5], atol=1e-6)


def test_preprocess_dual_matches_reference_semantics(rng):
    from ducosy_tpu.config import LUNG, SOFT_TISSUE
    stored = rng.integers(0, 4000, size=(32, 32)).astype(np.float32)
    st, lg = hu.preprocess_dual(jnp.asarray(stored), 1.0, -1024.0,
                                SOFT_TISSUE, LUNG)
    hu_img = stored - 1024.0
    want_st = 2 * (np.clip(hu_img, -150, 250) + 150) / 400 - 1
    want_lg = 2 * (np.clip(hu_img, -1000, -150) + 1000) / 850 - 1
    np.testing.assert_allclose(np.asarray(st), want_st, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lg), want_lg, rtol=1e-5, atol=1e-6)
