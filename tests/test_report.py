"""eval/report pipeline unit tests (convert -> worker -> summary) and torch
.pth checkpoint export interop."""
import csv
import os

import numpy as np
import pytest

from ducosy_tpu.eval import report
from tests.synth import write_patient


@pytest.fixture
def eval_tree(tmp_path):
    """input/<ds>/<pid>/{POST VUE,POST STD} + output/<ds>/<pid>/*.dcm"""
    from ducosy_tpu.dicom import dcmread

    ds_in = tmp_path / "input" / "DS"
    ds_out = tmp_path / "output" / "DS"
    for pid in ("p1", "p2"):
        write_patient(str(ds_in / pid), n_slices=3, size=32)
        os.makedirs(ds_out / pid)
        for f in sorted((ds_in / pid / "POST STD").glob("*.dcm")):
            d = dcmread(str(f))
            px = (d.pixel_array + 5).astype(np.uint16)  # "generated" = STD+5
            d.PixelData = px.tobytes()
            d.save_as(str(ds_out / pid / f.name))
    return str(tmp_path / "input"), str(tmp_path / "output")


def test_convert_and_calculate(eval_tree):
    input_root, output_root = eval_tree
    # --skip_convert: enumerate tasks without writing any cache
    _, dd0, tasks0 = report.convert(input_root, output_root, ["DS"],
                                    skip_convert=True)
    assert len(tasks0) == 2 and not os.listdir(dd0)
    # reset would delete the very caches skip_convert relies on
    with pytest.raises(ValueError, match="contradictory"):
        report.convert(input_root, output_root, ["DS"], reset=True,
                       skip_convert=True)

    calc_dir, data_dir, tasks = report.convert(input_root, output_root,
                                               ["DS"])
    assert len(tasks) == 2
    for pid in ("p1", "p2"):
        for cat in ("vue", "std", "generated"):
            assert os.path.exists(os.path.join(data_dir,
                                               f"DS_{pid}_{cat}.npy"))
    # idempotent: second run skips existing caches
    _, _, tasks2 = report.convert(input_root, output_root, ["DS"])
    assert tasks2 == tasks

    results = report.calculate(data_dir, calc_dir, tasks, num_workers=1)
    assert set(results) == {"DS/p1", "DS/p2"}
    r = results["DS/p1"]
    # generated = STD + 5 HU everywhere -> MAE exactly 5 on STD_vs_Generated
    np.testing.assert_allclose(r["mae"][0], 5.0, atol=1e-4)
    assert len(r["mae"]) == 3  # three pair types
    # per-slice CSV written
    detail = os.path.join(calc_dir, "detail", "DS_p1_metrics.csv")
    with open(detail) as f:
        rows = list(csv.reader(f))
    assert rows[0][0] == "Slice_Idx"
    assert len(rows) == 4  # header + 3 slices

    summary = report.summary_statistics(results, calc_dir)
    with open(summary) as f:
        srows = list(csv.reader(f))
    assert srows[0] == ["Metric", "Pair", "N", "Mean", "Std", "Median",
                        "Min", "Max"]
    mae_row = [r for r in srows if r[0] == "mae"
               and r[1] == "STD_vs_Generated"][0]
    np.testing.assert_allclose(float(mae_row[3]), 5.0, atol=1e-4)

    # result cache round-trip
    again = report.calculate(data_dir, calc_dir, tasks, num_workers=1)
    assert set(again) == set(results)


def test_pth_export_reloads_via_torch_path(tmp_path):
    """export_params_pth output must load through the same path as the
    reference's released checkpoints (DualGeneratorEngine.from_torch...)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from ducosy_tpu.models import Generator
    from ducosy_tpu.models.torch_import import (
        generator_params_from_torch, load_torch_state_dict)
    from ducosy_tpu.train.checkpoint import export_params_pth

    gen = Generator(input_channels=1, num_residual_blocks=2)
    params = gen.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 32, 32, 1)))["params"]
    p = str(tmp_path / "G_A2B.pth")
    export_params_pth(p, params, num_residual_blocks=2)

    back = generator_params_from_torch(load_torch_state_dict(p),
                                       num_residual_blocks=2)
    jax.tree_util.tree_map(np.testing.assert_array_equal, params, back)
