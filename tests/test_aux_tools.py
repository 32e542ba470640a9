"""Tests for the auxiliary subsystems: NIfTI codec, heart-mask cleanup,
exclusion-mask building + application, and anonymization."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "cli"))

from ducosy_tpu.dicom.nifti import dicom_affine, read_nifti, write_nifti
from ducosy_tpu.masks.heart import (
    _z_gap_cut,
    modify_heart_mask_volume,
)
from ducosy_tpu.masks.totalseg import (
    MASK_FILL_VALUE,
    apply_exclusion_mask,
    build_exclusion_mask,
    dicom_to_nifti,
)


def test_nifti_roundtrip_int16(tmp_path, rng):
    vol = rng.integers(-1024, 2000, (8, 16, 12)).astype(np.int16)
    aff = dicom_affine([0.75, 0.75], 2.5, [-200.0, -180.0, 40.0])
    p = str(tmp_path / "v.nii")
    write_nifti(p, vol, aff)
    back, aff2 = read_nifti(p)
    np.testing.assert_array_equal(back, vol)
    np.testing.assert_allclose(aff2, aff, rtol=1e-6)


def test_nifti_gz_roundtrip(tmp_path, rng):
    vol = rng.random((4, 6, 5)).astype(np.float32)
    p = str(tmp_path / "v.nii.gz")
    write_nifti(p, vol)
    back, _ = read_nifti(p)
    np.testing.assert_allclose(back, vol, rtol=1e-6)


def test_dicom_to_nifti(tmp_path):
    from tests.synth import write_patient
    write_patient(str(tmp_path / "p"), n_slices=3, size=32)
    nifti_path = str(tmp_path / "out.nii.gz")
    ok = dicom_to_nifti(str(tmp_path / "p" / "POST VUE"), nifti_path)
    assert ok
    data, aff = read_nifti(nifti_path)
    assert data.shape == (32, 32, 3)  # (x, y, z)
    assert data.dtype == np.int16
    # HU values present (air at -1024)
    assert data.min() == -1024


def test_z_gap_cut():
    heart = np.zeros((1, 1, 10), np.uint8)
    heart[0, 0, [2, 3, 6, 7]] = 1  # gap of 2 at z=4,5
    out = _z_gap_cut(heart, start_z=2)
    # cut at the gap start: everything from z=4 on removed
    np.testing.assert_array_equal(np.nonzero(out[0, 0])[0], [2, 3])


def test_heart_cleanup_removes_small_and_far():
    vol = np.zeros((64, 64, 24), np.uint8)
    # main heart blob (big sphere, label 51)
    xx, yy, zz = np.mgrid[:64, :64, :24]
    heart = ((xx - 30) ** 2 + (yy - 30) ** 2 + ((zz - 8) * 2) ** 2) < 144
    vol[heart] = 51
    # a tiny satellite component
    vol[60:62, 60:62, 20:22] = 51
    # some other label untouched
    vol[0:4, 0:4, 0:4] = 7
    out = modify_heart_mask_volume(vol)
    assert (out[60:62, 60:62, 20:22] == 51).sum() == 0  # satellite removed
    assert (out == 51).sum() > 0                         # heart survives
    assert (out[0:4, 0:4, 0:4] == 7).all()               # other labels kept


def test_exclusion_mask_and_apply(tmp_path):
    from tests.synth import write_patient

    # label volume: one labeled blob (heart 51) and one ignored label (99)
    labels = np.zeros((3, 32, 32), np.int32)
    labels[:, 10:18, 10:18] = 51
    labels[:, 24:28, 24:28] = 99
    excl = build_exclusion_mask(labels)
    assert excl[0, 12, 12] == 1
    assert excl[0, 25, 25] == 0
    # dilation grows the contour beyond the original box
    assert excl[0].sum() > 8 * 8

    write_patient(str(tmp_path / "p"), n_slices=3, size=32)
    files = sorted((tmp_path / "p" / "POST VUE").glob("*.dcm"))
    out_dir = str(tmp_path / "masked")
    apply_exclusion_mask([str(f) for f in files], excl, out_dir)
    from ducosy_tpu.dicom import dcmread
    masked = dcmread(os.path.join(out_dir, files[0].name))
    arr = masked.pixel_array
    assert arr.dtype == np.int16
    assert (arr[10:18, 10:18] == MASK_FILL_VALUE).all()
    assert (arr[24:28, 24:28] != MASK_FILL_VALUE).all()


def test_anonymize_tool(tmp_path):
    from tests.synth import write_patient
    import anonymize as anon_cli

    ds_dir = tmp_path / "input" / "DS1"
    write_patient(str(ds_dir / "pat001"), n_slices=2, size=32)
    # a "generated" tree too
    gen_dir = tmp_path / "output" / "DS1" / "pat001"
    os.makedirs(gen_dir)
    from ducosy_tpu.dicom import dcmread
    src = sorted((ds_dir / "pat001" / "POST STD").glob("*.dcm"))
    for f in src:
        ds = dcmread(str(f))
        ds.save_as(str(gen_dir / f.name))

    anon_cli.main(["--input_dir_root", str(tmp_path / "input"),
                   "--output_dir_root", str(tmp_path / "output"),
                   "--dataset_names", "DS1"])
    out = tmp_path / "output" / "anonymized"
    npys = list(out.glob("*.npy"))
    assert len(npys) == 2  # original + generated
    vol = np.load(npys[0])
    assert vol.ndim == 3 and vol.dtype == np.int16
    mapping = (tmp_path / "output" /
               "anonymization_mapping.csv").read_text().splitlines()
    assert mapping[0].startswith("Category")
    assert len(mapping) == 3


def test_anonymize_dataset_strips_phi(tmp_path):
    from anonymize import anonymize_dataset
    from ducosy_tpu.dicom.codec import new_ct_dataset

    ds = new_ct_dataset(8, 8)
    ds.PatientName = "DOE^JANE"
    ds.PatientID = "HOSP12345"
    ds.InstitutionName = "Some Hospital"
    anonymize_dataset(ds, "abc12345")
    assert ds.PatientID == "abc12345"
    assert str(ds.PatientName) == "Anonymized"
    assert ds.InstitutionName == "Anonymized"
    assert ds.StudyDate == "20000101"


def test_fleet_interrupt_leaves_no_orphans(tmp_path):
    """SIGTERM on a worker that registered signal handlers must kill its
    registered external subprocess tree (masking.py:71-95 semantics)."""
    import signal
    import subprocess
    import textwrap
    import time

    pidfile = tmp_path / "child.pid"
    script = textwrap.dedent(f"""
        import subprocess, sys, time
        sys.path.insert(0, {repr(os.getcwd())})
        from ducosy_tpu.masks import totalseg
        totalseg.register_signal_handlers()
        child = subprocess.Popen(["sleep", "600"])
        totalseg._register_pid(child.pid)
        open({repr(str(pidfile))}, "w").write(str(child.pid))
        time.sleep(600)
    """)
    worker = subprocess.Popen([sys.executable, "-c", script])
    try:
        for _ in range(100):
            if pidfile.exists() and pidfile.read_text().strip():
                break
            time.sleep(0.1)
        else:
            raise AssertionError("worker never spawned its subprocess")
        child_pid = int(pidfile.read_text())
        assert _alive(child_pid), "child should be running before SIGTERM"

        worker.send_signal(signal.SIGTERM)
        worker.wait(timeout=10)
        deadline = time.time() + 5
        while time.time() < deadline and _alive(child_pid):
            time.sleep(0.1)
        assert not _alive(child_pid), "external subprocess leaked"
        assert worker.returncode == 128 + signal.SIGTERM
    finally:
        if worker.poll() is None:
            worker.kill()
        if pidfile.exists():
            try:
                os.kill(int(pidfile.read_text()), 9)
            except (OSError, ValueError):
                pass


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def test_visualize_cli_writes_comparisons(tmp_path):
    """cli/visualize.py end-to-end on a synthetic tree: per-slice
    [VUE|STD|Generated] PNGs plus the per-dataset grid (reference
    visualize.py:16-317 semantics; generated slices live directly under
    <output>/<dataset>/<patient>/ like cli/generate.py writes them)."""
    import shutil

    pytest.importorskip("PIL")
    from synth import write_dataset
    import visualize as visualize_cli

    inp = tmp_path / "input"
    out = tmp_path / "output"
    write_dataset(str(inp), n_patients=1, n_slices=2, size=32)
    gen_dir = out / "SynthSet" / "patient00"
    gen_dir.mkdir(parents=True)
    for f in (inp / "SynthSet" / "patient00" / "POST STD").glob("*.dcm"):
        shutil.copy(f, gen_dir / f.name)

    visualize_cli.main(["--input_dir_root", str(inp),
                        "--output_dir_root", str(out),
                        "--dataset_names", "SynthSet",
                        "--num_workers", "1"])
    vis = out / "visualized"
    assert (vis / "SynthSet" / "patient00" / "0000.png").exists()
    assert (vis / "SynthSet" / "patient00" / "0001.png").exists()
    assert (vis / "SynthSet_grid.png").exists()
