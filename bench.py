"""Benchmark: 512x512 CT slices/sec/chip for the full dual-model
generate + synthesis pipeline (BASELINE.json's headline metric).

The reference processes 0.1-0.2 s/slice on one RTX 4090 in a batch=1 loop
(README.md:508-509, generate.py:89); we use the midpoint 6.67 slices/s as
the baseline. This bench runs the production path: a synthetic patient
volume of 512x512 slices through DualGeneratorEngine.run_patient — chunked
dual-generator inference (both models in one vmapped XLA program),
device-side complementary compositing, z-gaussian + gaussian3d/unsharp
volume postprocess — and reports end-to-end slices/sec including host<->
device transfers (excluding DICOM file I/O, as does the reference's
per-slice timing).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "slices/s/chip", "vs_baseline": N}
"""
import json
import os
import sys
import time

BASELINE_SLICES_PER_S = 1.0 / 0.15  # RTX 4090 midpoint of 0.1-0.2 s/slice


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ducosy_tpu.config import ModelConfig
    from ducosy_tpu.infer.engine import DualGeneratorEngine
    from ducosy_tpu.models import Generator

    n_slices = int(os.environ.get("BENCH_SLICES", "64"))
    chunk = int(os.environ.get("BENCH_CHUNK", "32"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    model_cfg = ModelConfig()
    gen = Generator(input_channels=1,
                    num_residual_blocks=model_cfg.num_residual_blocks)
    x0 = jnp.zeros((1, 512, 512, 1), jnp.float32)
    st_params = gen.init(jax.random.PRNGKey(0), x0)["params"]
    lung_params = gen.init(jax.random.PRNGKey(1), x0)["params"]
    engine = DualGeneratorEngine(st_params, lung_params,
                                 model_cfg=model_cfg, img_size=512,
                                 compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    patients = [rng.integers(0, 3000, (n_slices, 512, 512)).astype(np.int16)
                for _ in range(repeats)]

    # warmup (compile both program shapes)
    engine.run_patient(patients[0], 1.0, -1024.0, chunk=chunk)

    # steady-state throughput: issue all patients asynchronously so upload,
    # compute, and download pipeline across patients (one dispatch each)
    t0 = time.perf_counter()
    pending = [engine.run_patient_async(p, 1.0, -1024.0, chunk=chunk)
               for p in patients]
    outs = [np.asarray(o) for o in pending]
    elapsed = time.perf_counter() - t0
    for out, stored in zip(outs, patients):
        assert out.shape == stored.shape and out.dtype == np.int16

    slices_per_s = (n_slices * repeats) / elapsed
    print(json.dumps({
        "metric": "512x512 CT slices/sec/chip (dual-model generate + "
                  "complementary synthesis + volume postprocess)",
        "value": round(slices_per_s, 2),
        "unit": "slices/s/chip",
        "vs_baseline": round(slices_per_s / BASELINE_SLICES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
