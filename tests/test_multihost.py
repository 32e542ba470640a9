"""Multi-host data-parallel input feed (SURVEY.md §2.5).

Spawns a real 2-process jax.distributed CPU cluster (4 virtual devices per
process, 8 global) and runs two CycleGAN train steps where each process
loads ONLY its own rows of every global batch (HostLoader shard +
parallel.global_shard_batch / jax.make_array_from_process_local_data),
including a wrap-padded weighted final batch. Losses must match a
single-process 8-device run of the identical global batches.
"""
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
pytestmark = pytest.mark.slow  # full-tier only: heavy compiles /
# torch parity (round-5 fast tier: pytest -m "not slow")


# Deterministic toy dataset: 11 samples -> batch 8 gives one full batch and
# one wrap-padded batch with 3 real samples (weighted-step path).
WORKER_BODY = """
import numpy as np
import jax
import jax.numpy as jnp

from ducosy_tpu.config import ModelConfig, SOFT_TISSUE, TrainConfig, replace
from ducosy_tpu.data.loader import HostLoader
from ducosy_tpu.parallel import (data_mesh, data_sp_mesh, global_shard_batch,
                                 replicate)
from ducosy_tpu.train import create_state, make_train_step

IMG, BATCH, N = 32, 8, 11


class Toy:
    def __len__(self):
        return N

    def __getitem__(self, i):
        r = np.random.default_rng(1000 + int(i))
        return {
            "a": r.uniform(-1, 1, (IMG, IMG, 1)).astype(np.float32),
            "b": r.uniform(-1, 1, (IMG, IMG, 1)).astype(np.float32),
            "masks": r.integers(0, 2, (IMG, IMG, 2)).astype(np.float32),
        }


def run(shard, mesh_kind="data"):
    cfg = replace(TrainConfig(), img_size=IMG, batch_size=BATCH,
                  compute_dtype="float32")
    model_cfg = ModelConfig(num_residual_blocks=2)
    state, gen, disc = create_state(jax.random.PRNGKey(0), cfg, SOFT_TISSUE,
                                    model_cfg, img_size=IMG)
    if mesh_kind == "data_sp":
        mesh = data_sp_mesh(2, 2)  # batch rows x image rows
    else:
        mesh = data_mesh()
        assert mesh.devices.size == 8, mesh.devices.size
    state = replicate(mesh, state)
    loader = HostLoader(Toy(), BATCH, shuffle=True, seed=7, num_workers=2,
                        shard=shard)
    steps = {None: make_train_step(gen, disc, cfg, donate=False)}
    losses = []
    for host_batch in loader:
        key = loader.final_n_real if "weight" in host_batch else None
        if key not in steps:
            steps[key] = make_train_step(gen, disc, cfg, donate=False,
                                         n_real=key)
        batch = global_shard_batch(mesh, host_batch)
        state, metrics = steps[key](state, batch)
        losses.append(float(metrics["loss_G"]))
    return losses
"""

WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count={ndev}"
sys.path.insert(0, {repo!r})
import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address={coord!r},
                           num_processes=2, process_id={pid})
{body}
losses = run(shard=(jax.process_index(), 2), mesh_kind={mesh_kind!r})
print("LOSSES", " ".join(f"{{v:.6f}}" for v in losses), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_cluster(mesh_kind: str, ndev_per_proc: int, gold):
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             WORKER.format(repo=REPO, coord=coord, pid=pid, body=WORKER_BODY,
                           ndev=ndev_per_proc, mesh_kind=mesh_kind)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env={**os.environ, "JAX_PLATFORMS": "cpu"})
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)

    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("LOSSES")][0]
        losses = [float(v) for v in line.split()[1:]]
        np.testing.assert_allclose(losses, gold, rtol=2e-4,
                                   err_msg="multi-process losses diverge "
                                           "from single-process gold")


def _gold(mesh_kind: str):
    # gold: single process, 8 virtual devices (conftest), no input sharding
    import types

    gold_mod = types.ModuleType("gold")
    exec(WORKER_BODY, gold_mod.__dict__)
    gold = gold_mod.run(shard=None, mesh_kind=mesh_kind)
    assert len(gold) == 2 and all(np.isfinite(v) for v in gold)
    return gold


@pytest.mark.slow
def test_two_process_feed_matches_single_process():
    _run_cluster("data", ndev_per_proc=4, gold=_gold("data"))


@pytest.mark.slow
def test_two_process_data_sp_feed_matches_single_process():
    """(2, 2) (data, sp) mesh across 2 processes: each host owns one whole
    sp row (2 devices) and feeds full images for its half of every global
    batch (parallel.process_row_slice whole-sp-row contract); image rows
    shard over sp within each host. Losses must match the single-process
    run of the identical global batches."""
    _run_cluster("data_sp", ndev_per_proc=2, gold=_gold("data_sp"))
