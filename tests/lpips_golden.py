"""Deterministic LPIPS golden-fixture generation, shared by the tests and
scripts/make_lpips_golden.py.

Weights and inputs are generated from numpy integer draws scaled by powers
of two (exact in fp32 and stable across numpy versions — integer streams
of a seeded PCG64 are reproducible by contract, unlike float distribution
methods), so the committed expected values in
tests/fixtures/lpips_golden.npz stay valid forever. The expected
distances themselves were computed ONCE by the torch float64 module graph
that mirrors the `lpips` package (tests/test_lpips.py::_TorchLPIPSGraph)
and are asserted against the JAX implementation without needing torch.
"""
from __future__ import annotations

import os

import numpy as np

# (torch key, in_ch, out_ch, kernel) for the AlexNet features trunk
CONVS = (
    ("features.0", 3, 64, 11),
    ("features.3", 64, 192, 5),
    ("features.6", 192, 384, 3),
    ("features.8", 384, 256, 3),
    ("features.10", 256, 256, 3),
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "lpips_golden.npz")
WEIGHT_SEED = 2024
INPUT_SEED = 17
VOLUME_SHAPE = (4, 95, 83)  # odd sizes exercise the conv/pool arithmetic


def _dyadic(rng: np.random.Generator, shape, scale: float) -> np.ndarray:
    """Exact-fp32 random values: int draws / 2^15 * scale."""
    ints = rng.integers(-(2 ** 15), 2 ** 15, size=shape, dtype=np.int32)
    return (ints.astype(np.float32) / np.float32(2 ** 15)
            * np.float32(scale))


def golden_state_dict(seed: int = WEIGHT_SEED):
    """Architecture-correct random weights in the torch key layout the
    loader accepts (numpy arrays; torch.save-able directly)."""
    rng = np.random.default_rng(seed)
    sd = {}
    for key, cin, cout, k in CONVS:
        sd[f"{key}.weight"] = _dyadic(rng, (cout, cin, k, k), 0.05)
        sd[f"{key}.bias"] = _dyadic(rng, (cout,), 0.05)
    for i, (_, _, cout, _) in enumerate(CONVS):
        # lpips heads are non-negative 1x1 convs
        sd[f"lin{i}.model.1.weight"] = np.abs(
            _dyadic(rng, (1, cout, 1, 1), 0.1))
    return sd


def golden_volumes(seed: int = INPUT_SEED):
    """Two HU-ish volumes (Z, H, W) for the wrapper-level check."""
    rng = np.random.default_rng(seed)
    v1 = _dyadic(rng, VOLUME_SHAPE, 1000.0)
    v2 = v1 + _dyadic(rng, VOLUME_SHAPE, 80.0)
    return v1, v2
