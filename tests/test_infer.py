"""Inference stack tests: volume postprocess parity vs scipy, synthesis
compositing semantics, and the batched dual-generator engine."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter, gaussian_filter1d, median_filter

from ducosy_tpu.config import LUNG, SOFT_TISSUE, InferConfig, ModelConfig
from ducosy_tpu.infer import postprocess as pp
from ducosy_tpu.infer import synthesis
from ducosy_tpu.infer.engine import DualGeneratorEngine
from ducosy_tpu.models import Generator

pytestmark = pytest.mark.slow  # full-tier only: heavy compiles /
# torch parity (round-5 fast tier: pytest -m "not slow")



def _vol(rng, z=6, h=32, w=32):
    return rng.uniform(-1000, 1500, (z, h, w)).astype(np.float32)


def test_gaussian3d_matches_scipy(rng):
    vol = _vol(rng)
    got = pp.postprocess_ct_volume(vol, method="gaussian3d",
                                   enhance_sharpness=False,
                                   sigma_z=0.7, sigma_xy=0.05)
    want = gaussian_filter(vol, sigma=(0.7, 0.05, 0.05))
    want = np.where(vol >= 750, vol, want).astype(np.int16)
    np.testing.assert_allclose(got, want, atol=1)


def test_gaussian_z_matches_scipy(rng):
    vol = _vol(rng)
    got = pp.postprocess_ct_volume(vol, method="gaussian",
                                   enhance_sharpness=False, sigma=0.8)
    want = gaussian_filter1d(vol, sigma=0.8, axis=0)
    want = np.where(vol >= 750, vol, want).astype(np.int16)
    np.testing.assert_allclose(got, want, atol=1)


def test_median_matches_scipy(rng):
    vol = _vol(rng)
    got = pp.postprocess_ct_volume(vol, method="median",
                                   enhance_sharpness=False, kernel_size=3)
    want = median_filter(vol, size=(3, 1, 1))
    want = np.where(vol >= 750, vol, want).astype(np.int16)
    np.testing.assert_allclose(got, want, atol=1)


def test_unsharp_matches_reference_formula(rng):
    vol = _vol(rng)
    sm = gaussian_filter(vol, sigma=(0.7, 0.05, 0.05))
    got = np.asarray(pp.unsharp_mask(jnp.asarray(sm), jnp.asarray(vol),
                                     amount=1.7, radius=1.2))
    blurred = gaussian_filter(sm.astype(np.float64), sigma=(0, 1.2, 1.2))
    high = sm - blurred
    oblur = gaussian_filter(vol.astype(np.float64), sigma=(0, 1.2, 1.2))
    ohigh = vol - oblur
    comb = (1 - 1.7) * high + 1.7 * ohigh
    want = np.clip(sm + comb * 1.7, vol.min(), vol.max())
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=0.5)


def test_bone_preserved(rng):
    vol = _vol(rng)
    vol[2, 10, 10] = 1400.0
    got = pp.postprocess_ct_volume(vol, method="gaussian3d", sigma_z=2.0,
                                   sigma_xy=0.5, enhance_sharpness=False)
    assert got[2, 10, 10] == 1400


def test_kalman_matches_reference_recursion(rng):
    vol = _vol(rng, z=8, h=4, w=4)
    got = np.asarray(pp.kalman_filter_z(jnp.asarray(vol), 1e-5, 1e-2))

    def kalman_1d(m, q, r):
        x, p = m[0], 1.0
        out = np.zeros_like(m)
        for k in range(len(m)):
            p_pred = p + q
            gain = p_pred / (p_pred + r)
            x = x + gain * (m[k] - x)
            p = (1 - gain) * p_pred
            out[k] = x
        return out

    want = np.zeros_like(vol)
    for i in range(4):
        for j in range(4):
            want[:, i, j] = kalman_1d(vol[:, i, j].astype(np.float64),
                                      1e-5, 1e-2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_interpolation_method_runs(rng):
    vol = _vol(rng)
    out = pp.postprocess_ct_volume(vol, method="interpolation",
                                   enhance_sharpness=False)
    assert out.shape == vol.shape and out.dtype == np.int16


def test_unknown_method_raises(rng):
    with pytest.raises(ValueError):
        pp.postprocess_ct_volume(_vol(rng), method="nope")


def test_composite_slice_semantics():
    raw_hu = np.array([[-500.0, -150.0], [0.0, 400.0]], np.float32)
    raw = np.array([[524, 874], [1024, 1424]], np.float32)
    st = raw + 10
    lung = raw + 100
    out = synthesis.composite_slice(raw, raw_hu, st, lung)
    # -500 HU -> lung range only; -150 -> both, lung wins (applied second);
    # 0 -> soft tissue; 400 -> out of both ranges -> raw preserved
    assert out[0, 0] == raw[0, 0] + 100
    assert out[0, 1] == raw[0, 1] + 100
    assert out[1, 0] == raw[1, 0] + 10
    assert out[1, 1] == raw[1, 1]


def test_composite_volume_matches_slice(rng):
    raw_hu = rng.uniform(-1100, 600, (3, 8, 8)).astype(np.float32)
    raw = (raw_hu + 1024)
    st, lung = raw + 7, raw + 13
    vol = synthesis.composite_volume(raw, raw_hu, st, lung)
    per = np.stack([synthesis.composite_slice(raw[z], raw_hu[z], st[z],
                                              lung[z]) for z in range(3)])
    np.testing.assert_array_equal(vol, per)


def test_additive_composite():
    raw_hu = np.array([[-500.0, 0.0, 100.0]], np.float32)
    raw = raw_hu + 1024
    st_hu = raw_hu + np.array([[50.0, 3.0, 20.0]], np.float32)
    lung_hu = raw_hu.copy()
    out = synthesis.additive_composite(raw, raw_hu, st_hu, lung_hu, 1.0)
    assert out[0, 0] == raw[0, 0]          # below -400 HU floor
    assert out[0, 1] == raw[0, 1]          # enhancement below threshold
    assert out[0, 2] == raw[0, 2] + 20.0   # applied


def test_dual_engine_smoke(rng):
    """Tiny dual-generator engine: output shapes, finite stored pixels in the
    expected windows, resize round-trip for non-512 input."""
    mcfg = ModelConfig(num_residual_blocks=1)
    gen = Generator(input_channels=1, num_residual_blocks=1)
    p1 = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    p2 = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 1)))["params"]
    eng = DualGeneratorEngine(p1, p2, model_cfg=mcfg, img_size=32,
                              compute_dtype=jnp.float32)
    stored = rng.integers(0, 3000, (4, 48, 48)).astype(np.float32)
    out = eng.generate_batch(stored, 1.0, -1024.0)
    assert out["st_stored"].shape == (4, 48, 48)
    assert out["lung_stored"].shape == (4, 48, 48)
    assert out["raw_hu"].shape == (4, 48, 48)
    # outputs must be within each model's HU window mapped to stored units
    st = out["st_stored"] - 1024.0
    lg = out["lung_stored"] - 1024.0
    assert st.min() >= SOFT_TISSUE.hu_min - 1 and \
        st.max() <= SOFT_TISSUE.hu_max + 1
    assert lg.min() >= LUNG.hu_min - 1 and lg.max() <= LUNG.hu_max + 1
    np.testing.assert_allclose(out["raw_hu"], stored - 1024.0, atol=1e-3)


def test_synthesize_volume_pipeline(rng):
    vol = rng.uniform(500, 1500, (5, 16, 16)).astype(np.float32)
    out = synthesis.synthesize_volume(vol, InferConfig())
    assert out.shape == vol.shape
    assert out.dtype == np.int16


def test_trunk_int8_requires_packed_forward():
    """trunk_int8 must never be silently dropped: on a host where the
    packed Pallas forward is unavailable (CPU here) the engine refuses
    instead of serving a different configuration."""
    mcfg = ModelConfig(num_residual_blocks=1)
    gen = Generator(input_channels=1, num_residual_blocks=1)
    p1 = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    with pytest.raises(ValueError, match="quant"):
        DualGeneratorEngine(p1, p1, model_cfg=mcfg, img_size=32,
                            trunk_int8=True)
    with pytest.raises(ValueError, match="quant"):
        DualGeneratorEngine(p1, p1, model_cfg=mcfg, img_size=32,
                            quant="full")
    with pytest.raises(ValueError, match="quant"):
        DualGeneratorEngine(p1, p1, model_cfg=mcfg, img_size=32,
                            quant="int4", forward="packed")


def test_dual_engine_masked_models(rng):
    """Generators trained with mask conditioning (the framework's own
    training defaults) must run through the engine, which regenerates the
    anatomical mask channels from raw HU at inference time."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import chest_hu

    mcfg = ModelConfig(num_residual_blocks=1)
    g3 = Generator(input_channels=3, num_residual_blocks=1)
    g2 = Generator(input_channels=2, num_residual_blocks=1)
    p_st = g3.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    p_lu = g2.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 2)))["params"]
    eng = DualGeneratorEngine(p_st, p_lu, model_cfg=mcfg, img_size=128,
                              compute_dtype=jnp.float32)
    assert eng.use_masks and eng.st_channels == 3 and eng.lung_channels == 2

    vol_hu = np.stack([chest_hu(128, 128, z=i) for i in range(4)])
    stored = (vol_hu + 1024).astype(np.int16)
    out = eng.generate_batch(stored.astype(np.float32), 1.0, -1024.0)
    assert out["st_stored"].shape == (4, 128, 128)
    final = eng.run_patient(stored, 1.0, -1024.0, chunk=2)
    assert final.shape == (4, 128, 128) and final.dtype == np.int16
    hu_out = final.astype(np.float32) - 1024.0
    assert hu_out.min() >= -1025 and hu_out.max() <= 3000


def test_run_patient_matches_host_pipeline(rng):
    """The fused on-device patient program must match the step-by-step host
    pipeline (generate_batch -> composite_volume -> synthesize_volume)."""
    from ducosy_tpu.config import InferConfig

    mcfg = ModelConfig(num_residual_blocks=1)
    gen = Generator(input_channels=1, num_residual_blocks=1)
    p1 = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    p2 = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 1)))["params"]
    eng = DualGeneratorEngine(p1, p2, model_cfg=mcfg, img_size=32,
                              compute_dtype=jnp.float32)
    stored = rng.integers(0, 3000, (6, 32, 32)).astype(np.float32)

    fused = eng.run_patient(stored.astype(np.int16), 1.0, -1024.0, chunk=2)

    out = eng.generate_batch(stored, 1.0, -1024.0)
    merged = synthesis.composite_volume(stored, out["raw_hu"],
                                        out["st_stored"], out["lung_stored"])
    stepwise = synthesis.synthesize_volume(merged, InferConfig())
    # int16 rounding at the boundary can differ by 1
    assert np.mean(np.abs(fused.astype(np.int32)
                          - stepwise.astype(np.int32)) <= 1) > 0.999


def test_run_patient_multi_device_mesh(rng):
    """Mesh-sharded patient pipeline on the 8-virtual-device backend: same
    int16 output as the single-device program."""
    from ducosy_tpu.parallel import data_mesh

    mcfg = ModelConfig(num_residual_blocks=1)
    gen = Generator(input_channels=1, num_residual_blocks=1)
    p1 = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    p2 = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 1)))["params"]
    stored = rng.integers(0, 3000, (16, 32, 32)).astype(np.int16)

    single = DualGeneratorEngine(p1, p2, model_cfg=mcfg, img_size=32,
                                 compute_dtype=jnp.float32)
    ref = single.run_patient(stored, 1.0, -1024.0, chunk=8)

    mesh = data_mesh()
    assert mesh.devices.size == 8
    sharded = DualGeneratorEngine(p1, p2, model_cfg=mcfg, img_size=32,
                                  compute_dtype=jnp.float32, mesh=mesh)
    got = sharded.run_patient(stored, 1.0, -1024.0, chunk=8)
    assert np.mean(np.abs(got.astype(np.int32)
                          - ref.astype(np.int32)) <= 1) > 0.999

    with pytest.raises(ValueError):
        sharded.run_patient(stored, 1.0, -1024.0, chunk=6)


def test_mask_prefetch_matches_sync(rng):
    """run_patient_async with a prefetch_masks future must be bit-identical
    to the synchronous mask path (VERDICT r1: overlap inference-time mask
    generation with device compute)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import chest_hu

    mcfg = ModelConfig(num_residual_blocks=1)
    g3 = Generator(input_channels=3, num_residual_blocks=1)
    g2 = Generator(input_channels=2, num_residual_blocks=1)
    p_st = g3.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    p_lu = g2.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 2)))["params"]
    eng = DualGeneratorEngine(p_st, p_lu, model_cfg=mcfg, img_size=64,
                              compute_dtype=jnp.float32)

    vol = np.stack([chest_hu(64, 64, z=i) for i in range(3)])  # 3 % 2 -> pad
    stored = (vol + 1024).astype(np.int16)
    sync = eng.run_patient(stored, 1.0, -1024.0, chunk=2)
    fut = eng.prefetch_masks(stored.astype(np.float32), 1.0, -1024.0)
    assert fut is not None
    pre = np.asarray(eng.run_patient_async(stored, 1.0, -1024.0, chunk=2,
                                           masks=fut))
    np.testing.assert_array_equal(pre, sync)


def test_generate_cli_fast_pipeline(tmp_path, rng):
    """End-to-end pipelined fast path of cli/generate.py: synthetic DICOM
    patients -> npz checkpoints -> final sCECT series on disk, identical to
    a direct engine run."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "cli"))
    from synth import write_dataset
    import importlib

    gen_cli = importlib.import_module("generate")
    from ducosy_tpu.dicom import dcmread
    from ducosy_tpu.train.checkpoint import save_params_npz

    write_dataset(str(tmp_path / "input"), n_patients=2, n_slices=4, size=64)
    g1 = Generator(input_channels=1, num_residual_blocks=1)
    p_st = g1.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))["params"]
    p_lu = g1.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))["params"]
    st_path = str(tmp_path / "st.npz")
    lu_path = str(tmp_path / "lu.npz")
    save_params_npz(st_path, p_st)
    save_params_npz(lu_path, p_lu)

    gen_cli.main([
        "--input_dir_root", str(tmp_path / "input"),
        "--output_dir_root", str(tmp_path / "output"),
        "--working_dir_root", str(tmp_path / "working"),
        "--dataset_names", "SynthSet",
        "--img_size", "64", "--slice_batch", "2",
        "--soft_tissue_model", st_path, "--lung_model", lu_path,
        "--compute_dtype", "float32",
    ])
    for pid in ("patient00", "patient01"):
        out_dir = tmp_path / "output" / "SynthSet" / pid
        files = sorted(os.listdir(out_dir))
        assert files == [f"{i:04d}.dcm" for i in range(4)]
        ds = dcmread(str(out_dir / files[0]))
        assert ds.SeriesDescription == "DuCoSyGAN sCECT v2"
        assert ds.pixel_array.shape == (64, 64)


def test_generate_cli_survives_corrupt_slice(tmp_path, rng, capsys):
    """One unreadable slice file must not kill the patient run: the CLI
    skips it with a warning and writes the remaining slices (the
    reference's per-file try/except-continue, generate.py:128-132)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "cli"))
    from synth import write_dataset
    import importlib

    gen_cli = importlib.import_module("generate")
    from ducosy_tpu.dicom import dcmread
    from ducosy_tpu.train.checkpoint import save_params_npz

    write_dataset(str(tmp_path / "input"), n_patients=1, n_slices=4, size=64)
    # fuzz one mid-series slice into garbage
    pdir = next((tmp_path / "input" / "SynthSet").iterdir())
    victim = sorted((pdir / "POST VUE").glob("*.dcm"))[2]
    victim.write_bytes(b"\x00" * 64 + bytes(rng.integers(0, 256, 128,
                                                         dtype=np.uint8)))

    g1 = Generator(input_channels=1, num_residual_blocks=1)
    p_st = g1.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))["params"]
    p_lu = g1.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))["params"]
    st_path, lu_path = str(tmp_path / "st.npz"), str(tmp_path / "lu.npz")
    save_params_npz(st_path, p_st)
    save_params_npz(lu_path, p_lu)

    gen_cli.main([
        "--input_dir_root", str(tmp_path / "input"),
        "--output_dir_root", str(tmp_path / "output"),
        "--working_dir_root", str(tmp_path / "working"),
        "--dataset_names", "SynthSet",
        "--img_size", "64", "--slice_batch", "2",
        "--soft_tissue_model", st_path, "--lung_model", lu_path,
        "--compute_dtype", "float32",
    ])
    out_dir = tmp_path / "output" / "SynthSet" / pdir.name
    files = sorted(os.listdir(out_dir))
    assert files == [f"{i:04d}.dcm" for i in range(3)]  # 4 - 1 corrupt
    assert dcmread(str(out_dir / files[0])).pixel_array.shape == (64, 64)
    assert "skipping unreadable slice" in capsys.readouterr().out


def test_engine_packed_forward_matches_module(rng):
    """The engine's packed generator path must produce the same patient
    output as the canonical module path (fp32 on CPU -> near-exact)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import chest_hu

    g1 = Generator(input_channels=1, num_residual_blocks=1)
    p_st = g1.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))["params"]
    p_lu = g1.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))["params"]
    vol = np.stack([chest_hu(64, 64, z=i) for i in range(4)])
    stored = (vol + 1024).astype(np.int16)

    kw = dict(img_size=64, compute_dtype=jnp.float32)
    out_mod = DualGeneratorEngine(p_st, p_lu, forward="module",
                                  **kw).run_patient(stored, 1.0, -1024.0,
                                                    chunk=2)
    out_pk = DualGeneratorEngine(p_st, p_lu, forward="packed",
                                 **kw).run_patient(stored, 1.0, -1024.0,
                                                   chunk=2)
    # int16 outputs: allow 1-LSB rounding flips at fp32 tolerance
    assert np.abs(out_pk.astype(np.int32) - out_mod.astype(np.int32)).max() <= 1


def test_masks_threaded_matches_serial():
    """z-chunked threaded mask generation must be byte-identical to the
    serial call (detectors are per-slice independent)."""
    from ducosy_tpu.infer.engine import DualGeneratorEngine
    from ducosy_tpu.masks import generate_anatomical_masks

    rng = np.random.default_rng(7)
    z, s = 16, 64
    yy, xx = np.mgrid[0:s, 0:s]
    body = (((yy - 32) / 26.0) ** 2 + ((xx - 32) / 29.0) ** 2) < 1
    lung = (((yy - 32) / 14.0) ** 2 + ((xx - 20) / 9.0) ** 2) < 1
    hu = np.full((z, s, s), -1000.0, np.float32)
    hu[:, body] = 30.0
    hu[:, lung] = -820.0
    hu += rng.normal(0, 15, hu.shape).astype(np.float32)

    types = ["lung", "bone", "mediastinum"]
    serial = generate_anatomical_masks(hu, types)
    threaded = DualGeneratorEngine._masks_threaded(hu, types, n_workers=4)
    assert set(serial) == set(threaded)
    for k in serial:
        np.testing.assert_array_equal(threaded[k], serial[k])


def test_run_patient_spatial_mesh(rng):
    """(data, sp) mesh: slice batch over 'data', image rows over 'sp' —
    XLA SPMD inserts the conv halo exchanges; output must match the
    single-device program."""
    from ducosy_tpu.parallel import data_sp_mesh

    mcfg = ModelConfig(num_residual_blocks=1)
    gen = Generator(input_channels=1, num_residual_blocks=1)
    p1 = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    p2 = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 1)))["params"]
    stored = rng.integers(0, 3000, (16, 32, 32)).astype(np.int16)

    single = DualGeneratorEngine(p1, p2, model_cfg=mcfg, img_size=32,
                                 compute_dtype=jnp.float32)
    ref = single.run_patient(stored, 1.0, -1024.0, chunk=8)

    for dp, sp in ((2, 4), (1, 8)):
        mesh = data_sp_mesh(dp, sp)
        eng = DualGeneratorEngine(p1, p2, model_cfg=mcfg, img_size=32,
                                  compute_dtype=jnp.float32, mesh=mesh)
        # under sp, auto now serves the packed forward with the XLA trunk
        # (pure XLA ops — SPMD partitions them like the module path)
        assert eng.forward_impl == "packed" and eng.trunk == "xla", (dp, sp)
        got = eng.run_patient(stored, 1.0, -1024.0, chunk=8)
        assert np.mean(np.abs(got.astype(np.int32)
                              - ref.astype(np.int32)) <= 1) > 0.999, (dp, sp)

    # the module path stays available under sp by explicit request
    mesh = data_sp_mesh(2, 4)
    eng = DualGeneratorEngine(p1, p2, model_cfg=mcfg, img_size=32,
                              compute_dtype=jnp.float32, mesh=mesh,
                              forward="module")
    got = eng.run_patient(stored, 1.0, -1024.0, chunk=8)
    assert np.mean(np.abs(got.astype(np.int32)
                          - ref.astype(np.int32)) <= 1) > 0.999

    # H not divisible by sp
    mesh = data_sp_mesh(1, 8)
    eng = DualGeneratorEngine(p1, p2, model_cfg=mcfg, img_size=32,
                              compute_dtype=jnp.float32, mesh=mesh)
    with pytest.raises(ValueError):
        eng.run_patient(rng.integers(0, 10, (16, 36, 36)).astype(np.int16),
                        1.0, -1024.0, chunk=8)


def test_spatial_mesh_rejects_pallas_modes(rng):
    from ducosy_tpu.parallel import data_sp_mesh

    mcfg = ModelConfig(num_residual_blocks=1)
    gen = Generator(input_channels=1, num_residual_blocks=1)
    p1 = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    mesh = data_sp_mesh(2, 4)
    for kw in ({"trunk": "mono"}, {"trunk": "mega"}, {"quant": "trunk"},
               {"fused_norm": True}):
        with pytest.raises(ValueError):
            DualGeneratorEngine(p1, p1, model_cfg=mcfg, img_size=32,
                                mesh=mesh, **kw)


def test_trunk_auto_resolution(monkeypatch):
    """trunk='auto' picks the fused inference kernels: chain3 for every
    serving mode (round-4 hardware A/B, docs/PERF.md — bf16 and both
    quant modes; falls back to mono for trunks shorter than a chain) —
    and stays un-resolved off the packed forward (engine.py trunk
    selection)."""
    import ducosy_tpu.ops.pallas as pk
    monkeypatch.setattr(pk, "pallas_available", lambda: True)

    def mk(blocks, **kw):
        mcfg = ModelConfig(num_residual_blocks=blocks)
        gen = Generator(input_channels=1, num_residual_blocks=blocks)
        p = gen.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 32, 32, 1)))["params"]
        return DualGeneratorEngine(p, p, model_cfg=mcfg, img_size=32,
                                   forward="packed", **kw)

    assert mk(3).trunk == "chain3"
    assert mk(1).trunk == "mono"  # too short to chain
    assert mk(3, quant="trunk").trunk == "chain3"
    assert mk(3, quant="full").trunk == "chain3"
    assert mk(1, quant="trunk").trunk == "mono"
    assert mk(1, trunk="xla").trunk == "xla"
    mcfg = ModelConfig(num_residual_blocks=1)
    gen = Generator(input_channels=1, num_residual_blocks=1)
    p1 = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    module_eng = DualGeneratorEngine(p1, p1, model_cfg=mcfg, img_size=32,
                                     forward="module")
    assert module_eng.trunk == "auto"


def test_engine_single_sided_mask_conditioning(rng):
    """Exactly ONE mask-conditioned generator (framework st checkpoint +
    released 1-channel lung checkpoint): _host_masks emits only that
    model's key and the forward must not KeyError on the other."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import chest_hu

    mcfg = ModelConfig(num_residual_blocks=1)
    g3 = Generator(input_channels=3, num_residual_blocks=1)
    g1 = Generator(input_channels=1, num_residual_blocks=1)
    p_st = g3.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    p_lu = g1.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))["params"]
    eng = DualGeneratorEngine(p_st, p_lu, model_cfg=mcfg, img_size=128,
                              compute_dtype=jnp.float32)
    assert eng.use_masks and eng.lung_channels == 1

    vol_hu = np.stack([chest_hu(128, 128, z=i) for i in range(2)])
    stored = (vol_hu + 1024).astype(np.int16)
    out = eng.generate_batch(stored, 1.0, -1024.0)
    assert out["st_stored"].shape == (2, 128, 128)
    final = eng.run_patient(stored, 1.0, -1024.0, chunk=2)
    assert final.shape == (2, 128, 128)
    # mirrored: only lung conditioned (2ch = image + lung mask)
    g2 = Generator(input_channels=2, num_residual_blocks=1)
    p_lu2 = g2.init(jax.random.PRNGKey(2),
                    jnp.zeros((1, 64, 64, 2)))["params"]
    eng2 = DualGeneratorEngine(p_lu, p_lu2, model_cfg=mcfg, img_size=128,
                               compute_dtype=jnp.float32)
    assert eng2.st_channels == 1 and eng2.lung_channels == 2
    out2 = eng2.generate_batch(stored, 1.0, -1024.0)
    assert out2["lung_stored"].shape == (2, 128, 128)


def test_engine_soft_squeeze_matches_training_transform(rng):
    """soft_squeeze=True must feed the models the EXACT training-time
    input transform (dataset _hu_transform_np: clip -> squeeze), vs the
    default's reference-parity linear window."""
    from ducosy_tpu.data.dataset import _hu_transform_np
    from ducosy_tpu.ops import hu as hu_ops

    hu_img = rng.uniform(-1200, 3000, (4, 32, 32)).astype(np.float32)
    sq = np.asarray(hu_ops.soft_squeeze(
        jnp.clip(jnp.asarray(hu_img), SOFT_TISSUE.hu_min,
                 SOFT_TISSUE.hu_max),
        SOFT_TISSUE.hu_min, SOFT_TISSUE.hu_max))
    ref = _hu_transform_np(hu_img, SOFT_TISSUE.hu_min, SOFT_TISSUE.hu_max,
                           True)
    np.testing.assert_allclose(sq, ref, rtol=1e-5, atol=1e-6)

    # engine smoke: both modes run and differ (inputs near the window
    # ceiling are the squeezed region)
    mcfg = ModelConfig(num_residual_blocks=1)
    gen = Generator(input_channels=1, num_residual_blocks=1)
    p1 = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    stored = rng.integers(0, 3000, (2, 32, 32)).astype(np.int16)
    lin = DualGeneratorEngine(p1, p1, model_cfg=mcfg, img_size=32,
                              compute_dtype=jnp.float32)
    sqz = DualGeneratorEngine(p1, p1, model_cfg=mcfg, img_size=32,
                              compute_dtype=jnp.float32, soft_squeeze=True)
    o_lin = lin.generate_batch(stored, 1.0, -1024.0)
    o_sq = sqz.generate_batch(stored, 1.0, -1024.0)
    assert np.isfinite(o_sq["st_stored"]).all()
    assert not np.allclose(o_lin["st_stored"], o_sq["st_stored"])


def test_composite_slice_volume_agree_on_float_outputs(rng):
    """composite_slice and composite_volume must produce identical results
    when float model outputs composite against an int16 raw volume (the
    in-place fancy-assignment form would truncate toward zero)."""
    raw = rng.integers(0, 3000, (3, 16, 16)).astype(np.int16)
    raw_hu = raw.astype(np.float32) - 1024.0
    st = rng.uniform(0, 3000, (3, 16, 16)).astype(np.float32)
    lung = rng.uniform(0, 3000, (3, 16, 16)).astype(np.float32)
    vol = synthesis.composite_volume(raw, raw_hu, st, lung)
    per = np.stack([synthesis.composite_slice(raw[z], raw_hu[z], st[z],
                                              lung[z]) for z in range(3)])
    np.testing.assert_array_equal(vol, per)


def test_explicit_trunk_requires_packed_and_cbam():
    """An explicitly requested fused trunk must never be silently ignored
    (same rule the engine enforces for quant)."""
    mcfg = ModelConfig(num_residual_blocks=1)
    gen = Generator(input_channels=1, num_residual_blocks=1, use_cbam=False)
    p = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    with pytest.raises(ValueError, match="packed"):
        DualGeneratorEngine(p, p, model_cfg=mcfg, img_size=32,
                            trunk="mono", forward="module")
    with pytest.raises(ValueError, match="CBAM"):
        DualGeneratorEngine(p, p, model_cfg=mcfg, img_size=32,
                            trunk="mono", forward="packed")
