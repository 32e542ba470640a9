"""nmodel data pipeline + trainer tests."""
import os

import numpy as np
import pytest

from ducosy_tpu.models.nmodel_data import CTDiffDataset, NModelConfig

pytestmark = pytest.mark.slow  # full-tier only: heavy compiles /
# torch parity (round-5 fast tier: pytest -m "not slow")



@pytest.fixture
def nmodel_data(tmp_path, rng):
    for sub in ("vue", "diff_map"):
        os.makedirs(tmp_path / sub)
    for pid in ("p1", "p2", "p3", "p4"):
        vue = rng.uniform(-1024, 2000, (6, 40, 40)).astype(np.float32)
        diff = rng.uniform(0, 3500, (6, 40, 40)).astype(np.float32)
        np.save(tmp_path / "vue" / f"{pid}_vue.npy", vue)
        np.save(tmp_path / "diff_map" / f"{pid}_diff.npy", diff)
    return str(tmp_path)


def test_config_json_roundtrip(tmp_path):
    cfg = NModelConfig(base_channels=8, patch_size=(1, 64, 64))
    p = str(tmp_path / "cfg.json")
    cfg.save(p)
    back = NModelConfig.load(p)
    assert back == cfg


def test_dataset_split_and_shapes(nmodel_data):
    tr = CTDiffDataset(nmodel_data, "train", val_size=0.25,
                       patch_size=(1, 32, 32), patches_per_volume=4)
    va = CTDiffDataset(nmodel_data, "val", val_size=0.25,
                       patch_size=(1, 32, 32), patches_per_volume=4)
    assert len(tr.patient_ids) == 3 and len(va.patient_ids) == 1
    assert set(tr.patient_ids) | set(va.patient_ids) == {"p1", "p2", "p3",
                                                         "p4"}
    assert len(tr) == 12
    s = tr[0]
    assert s["vue"].shape == (1, 32, 32, 1)
    assert s["diff"].shape == (1, 32, 32, 1)
    assert -1.0 <= s["vue"].min() and s["vue"].max() <= 1.0
    assert -1.0 <= s["diff"].min() and s["diff"].max() <= 1.0


def test_dataset_pads_small_volumes(nmodel_data):
    ds = CTDiffDataset(nmodel_data, "train", patch_size=(1, 64, 64),
                       patches_per_volume=1)
    s = ds[0]
    assert s["vue"].shape == (1, 64, 64, 1)  # zero-padded from 40x40


def test_invalid_mode(nmodel_data):
    with pytest.raises(ValueError):
        CTDiffDataset(nmodel_data, "test")


@pytest.mark.slow
def test_train_nmodel_end_to_end(nmodel_data, tmp_path):
    from ducosy_tpu.train.nmodel_loop import train_nmodel

    cfg = NModelConfig(
        data_dir=nmodel_data, output_dir=str(tmp_path / "out"),
        model_type="light", base_channels=4, patch_size=(1, 32, 32),
        patches_per_volume=2, batch_size=2, num_epochs=2)
    out = train_nmodel(cfg, max_steps=3)
    assert np.isfinite(out["val_l1"])
    assert os.path.exists(os.path.join(cfg.checkpoint_dir,
                                       "nmodel_latest.npz"))
    assert os.path.exists(os.path.join(cfg.checkpoint_dir,
                                       "nmodel_best.npz"))
    assert os.path.exists(os.path.join(cfg.output_dir,
                                       "nmodel_config.json"))


def test_save_results_dumps(tmp_path):
    """save_results mirrors the reference's diff-map artifact dumps
    (modules/nmodel/inference.py:85-136): .npy volumes + per-slice PNGs,
    combined set only when the original volume is given."""
    from PIL import Image

    from ducosy_tpu.models.unet3d import (normalize_volume_to_uint8,
                                          save_results)

    rng = np.random.default_rng(0)
    diff = rng.uniform(0, 400, (3, 16, 16)).astype(np.float32)
    orig = rng.uniform(-1000, 1000, (3, 16, 16)).astype(np.float32)

    out = save_results(diff, str(tmp_path), "pat01", original_volume=orig)
    np.testing.assert_array_equal(np.load(out["diff_volume"]), diff)
    np.testing.assert_allclose(np.load(out["combined_volume"]), orig + diff,
                               rtol=1e-6)
    for key in ("diff_slices", "combined_slices"):
        pngs = sorted(os.listdir(out[key]))
        assert pngs == [f"slice_{i:04d}.png" for i in range(3)]
    img = np.asarray(Image.open(os.path.join(out["diff_slices"],
                                             "slice_0000.png")))
    np.testing.assert_array_equal(img, normalize_volume_to_uint8(diff)[0])

    out2 = save_results(diff, str(tmp_path / "b"), "pat02")
    assert "combined_volume" not in out2 and "combined_slices" not in out2

    flat = normalize_volume_to_uint8(np.zeros((2, 4, 4)))
    assert (flat == 128).all()
