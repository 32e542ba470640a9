"""Argv-level smoke tests for the CLI entry points whose underlying logic
is unit-tested elsewhere but whose flag surface had no end-to-end drive:
train, calculate, mask_preview, modify_heart_mask. Each runs the real
main() on a tiny synthetic tree (reference entries: train.py, calculate.py
:848-868, test_mask_generation.py, modify_heart_mask.py:212-242)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "cli"))

from synth import write_dataset, write_patient  # noqa: E402


def test_train_cli_tiny_run(tmp_path):
    import train as train_cli

    data_root = tmp_path / "data"
    write_dataset(str(data_root), n_patients=3, n_slices=4, size=32)
    tdir = tmp_path / "training_dir"
    train_cli.main([
        "--target_model", "soft_tissue",
        "--data_root", str(data_root), "--dataset_names", "SynthSet",
        "--training_dir", str(tdir),
        "--epochs", "1", "--max_epochs", "1",
        "--batch_size", "4", "--img_size", "32",
        "--num_residual_blocks", "1", "--compute_dtype", "float32",
        "--num_workers", "2", "--num_devices", "2",
        "--val_split", "0.34", "--resume", "",
    ])
    saved = tdir / "soft_tissue" / "saved_models"
    files = [str(p) for p in saved.rglob("*") if p.is_file()]
    assert any("last" in f for f in files), files
    logs = list(tdir.rglob("metrics.jsonl"))
    assert logs and logs[0].stat().st_size > 0


def test_calculate_cli(tmp_path):
    import calculate as calculate_cli
    from ducosy_tpu.dicom import dcmread

    ds_in = tmp_path / "input" / "DS"
    ds_out = tmp_path / "output" / "DS"
    for pid in ("p1", "p2"):
        write_patient(str(ds_in / pid), n_slices=3, size=32)
        os.makedirs(ds_out / pid)
        for f in sorted((ds_in / pid / "POST STD").glob("*.dcm")):
            d = dcmread(str(f))
            px = (d.pixel_array + 5).astype(np.uint16)
            d.PixelData = px.tobytes()
            d.save_as(str(ds_out / pid / f.name))

    calculate_cli.main([
        "--input_dir_root", str(tmp_path / "input"),
        "--output_dir_root", str(tmp_path / "output"),
        "--dataset_names", "DS", "--num_workers", "2", "--fast",
    ])
    calc = tmp_path / "output" / "calculated"
    csvs = [str(p) for p in calc.rglob("*.csv")]
    assert any("summary" in os.path.basename(c) for c in csvs), csvs


def test_mask_preview_cli(tmp_path, capsys):
    import mask_preview as preview_cli

    write_patient(str(tmp_path / "p1"), n_slices=1, size=64)
    slice_path = sorted((tmp_path / "p1" / "POST VUE").glob("*.dcm"))[0]
    out_png = tmp_path / "preview.png"
    preview_cli.main([str(slice_path), "--output", str(out_png)])
    assert out_png.exists() and out_png.stat().st_size > 0
    printed = capsys.readouterr().out
    for name in ("lung", "mediastinum", "bone", "lung_vessel"):
        assert name in printed


def test_modify_heart_mask_cli(tmp_path):
    import modify_heart_mask as heart_cli
    from ducosy_tpu.dicom.nifti import read_nifti, write_nifti

    mask_dir = tmp_path / "mask" / "DS"
    os.makedirs(mask_dir)
    vol = np.zeros((6, 16, 16), np.uint8)
    vol[0:2, 4:8, 4:8] = 51       # heart blob, then a z gap, then a blob
    vol[4:6, 4:8, 4:8] = 51       # that the z-gap cut should drop
    vol[3, 10:12, 10:12] = 30     # non-heart label must survive untouched
    write_nifti(str(mask_dir / "p1.nii"), vol)

    heart_cli.main(["--output_dir_root", str(tmp_path),
                    "--dataset_names", "DS", "--num_workers", "1"])
    out = tmp_path / "modified_mask" / "DS" / "p1.nii"
    assert out.exists()
    cleaned, _ = read_nifti(str(out))
    assert (cleaned == 30).sum() == (vol == 30).sum()
    assert (cleaned == 51).sum() <= (vol == 51).sum()
