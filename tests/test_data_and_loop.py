"""Integration tests: pairing/dataset/loader on synthetic DICOM patients and
a tiny end-to-end training run with checkpoint resume."""
import os

import numpy as np
import pytest

from ducosy_tpu.config import (
    LUNG,
    ModelConfig,
    RangeConfig,
    SOFT_TISSUE,
    TrainConfig,
    replace,
)
from ducosy_tpu.data import (
    HostLoader,
    SlicePairDataset,
    list_patient_dirs,
    pair_patient_slices,
    train_val_split,
)
from tests.synth import write_dataset, write_patient


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    write_dataset(str(root), n_patients=3, n_slices=4, size=64)
    return str(root)


def test_pairing(synth_root):
    patients = list_patient_dirs(synth_root, "SynthSet")
    assert len(patients) == 3
    pairs = pair_patient_slices(patients[0], "POST VUE", "POST STD")
    assert len(pairs) == 4
    # ordered by InstanceNumber
    names = [os.path.basename(a) for a, _ in pairs]
    assert names == sorted(names)


def test_split_seeded(synth_root):
    patients = list_patient_dirs(synth_root, "SynthSet")
    t1, v1 = train_val_split(patients, 1 / 3, seed=42)
    t2, v2 = train_val_split(patients, 1 / 3, seed=42)
    assert t1 == t2 and v1 == v2
    assert len(v1) == 1 and len(t1) == 2
    assert set(t1) | set(v1) == set(patients)


def test_dataset_sample_with_auto_masks(synth_root):
    patients = list_patient_dirs(synth_root, "SynthSet")
    ds = SlicePairDataset(patients, SOFT_TISSUE, img_size=64)
    assert len(ds) == 12
    s = ds[0]
    assert s["a"].shape == (64, 64, 1) and s["a"].dtype == np.float32
    assert s["b"].shape == (64, 64, 1)
    assert s["masks"].shape == (64, 64, 2)  # bone + mediastinum
    assert s["a"].min() >= -1.0 and s["a"].max() <= 1.0
    assert set(np.unique(s["masks"])) <= {0.0, 1.0}
    # CECT has contrast the NCCT lacks (max saturates at the clipped spine,
    # so compare the mean brightness)
    assert s["b"].mean() > s["a"].mean()


def test_dataset_lung_range(synth_root, tmp_path):
    # 128px patient: the lung detector's fixed 32px border margin
    # (mask_generator.py:25-29) blanks out 64px slices entirely
    write_patient(str(tmp_path / "p0"), n_slices=2, size=128)
    ds = SlicePairDataset([str(tmp_path / "p0")], LUNG, img_size=32)
    s = ds[0]
    assert s["masks"].shape == (32, 32, 1)  # lung only
    assert s["masks"].sum() > 0


def test_loader_batching(synth_root):
    patients = list_patient_dirs(synth_root, "SynthSet")
    ds = SlicePairDataset(patients, SOFT_TISSUE, img_size=32)
    loader = HostLoader(ds, batch_size=8, shuffle=True, seed=0,
                        num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # 12 samples -> 8 + padded 8
    for b in batches:
        assert b["a"].shape == (8, 32, 32, 1)
        assert b["masks"].shape == (8, 32, 32, 2)
    # epochs reshuffle
    b2 = next(iter(loader))
    assert not np.allclose(b2["a"], batches[0]["a"])


def test_loader_drop_last(synth_root):
    patients = list_patient_dirs(synth_root, "SynthSet")
    ds = SlicePairDataset(patients, SOFT_TISSUE, img_size=32)
    loader = HostLoader(ds, batch_size=8, shuffle=False, drop_last=True)
    assert len(list(loader)) == 1


@pytest.mark.slow
def test_remat_auto_oom_retry_survives_donation(synth_root, tmp_path,
                                                monkeypatch):
    """remat="auto": the first step donates `state`; donation invalidates
    its buffers even when execution fails. The retry must run on a live
    copy, not the deleted originals. Simulated by a step whose first call
    deletes the state it was handed (exactly what a failed donating
    execution leaves behind) and raises an OOM-shaped error."""
    import jax
    from jax.errors import JaxRuntimeError
    from ducosy_tpu.train import loop as loop_mod

    real_make = loop_mod.make_train_step
    fired = {"oom": False}

    def faulty_make(gen, disc, cfg, loss_cfg, **kw):
        step = real_make(gen, disc, cfg, loss_cfg, **kw)
        if kw.get("remat") or fired["oom"]:
            return step

        def first_call_ooms(state, batch):
            fired["oom"] = True
            for leaf in jax.tree_util.tree_leaves(state):
                if hasattr(leaf, "delete"):
                    leaf.delete()
            raise JaxRuntimeError(
                "RESOURCE_EXHAUSTED: Out of memory while trying to "
                "allocate 1 bytes. (simulated)")
        return first_call_ooms

    monkeypatch.setattr(loop_mod, "make_train_step", faulty_make)

    cfg = replace(
        TrainConfig(),
        epochs=10, decay_epoch=2, batch_size=8, img_size=64, num_workers=2,
        data_root=synth_root, dataset_names="SynthSet",
        training_dir=str(tmp_path / "run_oom"), val_split=1 / 3,
        compute_dtype="float32", log_every=1, remat="auto")
    mcfg = ModelConfig(num_residual_blocks=1)
    out = loop_mod.train_cycle_gan(cfg, "soft_tissue", mcfg, max_epochs=1)
    assert fired["oom"], "simulated OOM step never ran"
    assert out["epochs_run"] == 1 and np.isfinite(out["val_loss"])


@pytest.mark.slow
def test_train_loop_end_to_end(synth_root, tmp_path):
    """Two tiny epochs + resume for one more: checkpoints, images, metrics,
    monotone epoch bookkeeping (SURVEY.md §7 stage 6)."""
    from ducosy_tpu.train.loop import train_cycle_gan

    cfg = replace(
        TrainConfig(),
        epochs=10, decay_epoch=2, batch_size=8, img_size=64, num_workers=2,
        data_root=synth_root, dataset_names="SynthSet",
        training_dir=str(tmp_path / "run"), val_split=1 / 3,
        compute_dtype="float32", log_every=1)
    mcfg = ModelConfig(num_residual_blocks=1)

    out = train_cycle_gan(cfg, "soft_tissue", mcfg, max_epochs=2)
    assert out["epochs_run"] == 2
    assert np.isfinite(out["val_loss"])

    run = tmp_path / "run" / "soft_tissue"
    saved = run / "saved_models"
    assert (saved / "checkpoint").is_dir()
    assert (saved / "G_A2B_last.npz").exists()
    assert (saved / "G_A2B_epoch_2.npz").exists()
    assert (run / "images" / "epoch_1.jpg").exists()
    assert (run / "metrics.jsonl").exists()
    best = list(saved.glob("G_A2B_best_epoch_*.npz"))
    assert len(best) == 1  # previous best deleted

    # resume one more epoch
    out2 = train_cycle_gan(cfg, "soft_tissue", mcfg, max_epochs=1)
    assert out2["epochs_run"] == 1
    assert (saved / "G_A2B_epoch_3.npz").exists()


def test_loader_propagates_worker_errors():
    """A dataset exception must surface in the consumer, not hang the
    iterator (the producer always enqueues its sentinel)."""

    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 3:
                raise OSError("corrupt file")
            return {"a": np.zeros((4, 4, 1), np.float32)}

    loader = HostLoader(Broken(), batch_size=4, shuffle=False, num_workers=2)
    with pytest.raises(RuntimeError, match="HostLoader worker failed"):
        list(loader)


def test_loader_early_break_does_not_hang(synth_root):
    patients = list_patient_dirs(synth_root, "SynthSet")
    ds = SlicePairDataset(patients, SOFT_TISSUE, img_size=32)
    loader = HostLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    for batch in loader:
        break  # consumer abandons mid-epoch; producer must wind down
    # a second epoch still works
    assert len(list(loader)) == 3


def test_epoch_snapshot_retention(tmp_path):
    """checkpoint_keep bounds per-epoch snapshot disk growth; best/last
    snapshots are never pruned."""
    from ducosy_tpu.train.checkpoint import save_epoch_snapshots

    params = {"w": np.zeros((2, 2), np.float32)}
    d = str(tmp_path)
    # a best snapshot that must survive pruning
    open(os.path.join(d, "G_A2B_best_epoch_1.npz"), "wb").write(b"x")
    for epoch in range(1, 6):
        save_epoch_snapshots(d, epoch, params, params, keep=2)
    files = sorted(os.listdir(d))
    kept = [f for f in files if "_epoch_" in f and "best" not in f]
    assert sorted(kept) == ["G_A2B_epoch_4.npz", "G_A2B_epoch_5.npz",
                            "G_B2A_epoch_4.npz", "G_B2A_epoch_5.npz"]
    assert "G_A2B_best_epoch_1.npz" in files
    assert "G_A2B_last.npz" in files and "G_B2A_last.npz" in files


def test_epoch_snapshot_keep_zero_keeps_all(tmp_path):
    from ducosy_tpu.train.checkpoint import save_epoch_snapshots

    params = {"w": np.zeros((2,), np.float32)}
    for epoch in range(1, 4):
        save_epoch_snapshots(str(tmp_path), epoch, params, params, keep=0)
    kept = [f for f in os.listdir(str(tmp_path)) if "_epoch_" in f]
    assert len(kept) == 6


def test_is_oom_error_classifier():
    """remat="auto" must only fall back on genuine XLA memory exhaustion:
    type-checked (when jaxlib exposes a runtime-error type) AND
    status-text-checked."""
    from ducosy_tpu.train.loop import _is_oom_error

    try:
        from jaxlib.xla_extension import XlaRuntimeError
    except ImportError:
        XlaRuntimeError = None

    if XlaRuntimeError is not None:
        assert _is_oom_error(
            XlaRuntimeError("RESOURCE_EXHAUSTED: ran out of HBM"))
        # right type, wrong status -> not OOM
        assert not _is_oom_error(XlaRuntimeError("INVALID_ARGUMENT: shape"))
        # right text, wrong type -> not OOM (a ValueError quoting a log
        # line must not trigger a silent retry)
        assert not _is_oom_error(ValueError("RESOURCE_EXHAUSTED said XLA"))
    assert not _is_oom_error(RuntimeError("unrelated failure"))
