#!/usr/bin/env python
"""Generate tests/fixtures/lpips_golden.npz.

Computes the expected per-slice LPIPS distances for the deterministic
weights/volumes of tests/lpips_golden.py using the torch float64 module
graph that mirrors the `lpips` package (tests/test_lpips.py::
_TorchLPIPSGraph), applying the reference's volume semantics
(calculate.py:296-312: per-volume min-max to [-1,1], grey->RGB). The
committed fixture lets the suite assert torch-level parity without torch.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import torch

    from tests.lpips_golden import (FIXTURE, WEIGHT_SEED, INPUT_SEED,
                                    golden_state_dict, golden_volumes)
    from tests.test_lpips import _TorchLPIPSGraph

    sd = golden_state_dict()
    v1, v2 = golden_volumes()

    def norm(v):
        v = torch.from_numpy(np.asarray(v, np.float64))
        v = (v - v.min()) / (v.max() - v.min() + 1e-8)
        return (v * 2 - 1).unsqueeze(1).repeat(1, 3, 1, 1)

    graph = _TorchLPIPSGraph(sd).double()
    with torch.no_grad():
        per = graph(norm(v1), norm(v2)).numpy()

    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez(FIXTURE, per_slice=per,
             weight_seed=WEIGHT_SEED, input_seed=INPUT_SEED)
    print(f"wrote {FIXTURE}: per_slice={per}")


if __name__ == "__main__":
    main()
