"""Hardware A/B of batched_forwards in the CycleGAN train step.

Control: the 6-generator-forward / 6-discriminator-forward step.
Test: batched_forwards=True — the fake+identity forwards fold into one
2N-batch call per direction (6 G forwards -> 4) and each discriminator
sees real+fake as one 2N-batch call. Same math (per-sample IN/CBAM),
fewer dispatches, fatter MXU tiles.

Run each arm in a SUBPROCESS so an OOM in the no-remat test arm (2N-batch
transients) can't poison the control measurement.
"""
import json
import os
import subprocess
import sys

ARM = r"""
import os, time, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/ducosy_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
import jax, jax.numpy as jnp, numpy as np
from ducosy_tpu.config import ModelConfig, SOFT_TISSUE, TrainConfig, replace
from ducosy_tpu.train import create_state, make_train_step

batched = os.environ["AB_BATCHED"] == "1"
cfg = replace(TrainConfig(), img_size=512, batch_size=8)
state, gen, disc = create_state(jax.random.PRNGKey(0), cfg, SOFT_TISSUE,
                                ModelConfig(), img_size=512)
rng = np.random.default_rng(0)
batch = {
    "a": jnp.asarray(rng.uniform(-1, 1, (8, 512, 512, 1)), jnp.float32),
    "b": jnp.asarray(rng.uniform(-1, 1, (8, 512, 512, 1)), jnp.float32),
    "masks": jnp.asarray(rng.integers(0, 2, (8, 512, 512, 2)), jnp.float32),
}
remat = False
try:
    step = make_train_step(gen, disc, cfg, remat=False, gen_forward="packed",
                           batched_forwards=batched)
    state, m = step(state, batch)
    float(m["loss_G"])
except Exception as e:  # OOM -> remat arm
    remat = True
    state, gen, disc = create_state(jax.random.PRNGKey(0), cfg, SOFT_TISSUE,
                                    ModelConfig(), img_size=512)
    step = make_train_step(gen, disc, cfg, remat=True, gen_forward="packed",
                           batched_forwards=batched)
    state, m = step(state, batch)
    float(m["loss_G"])
best = None
for _ in range(3):
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch)
    float(m["loss_G"])
    dt = (time.perf_counter() - t0) / n
    best = dt if best is None else min(best, dt)
print("ARM_JSON " + json.dumps({"batched": batched, "remat": remat,
                                "sec_per_step": round(best, 4),
                                "loss_G": float(m["loss_G"])}))
"""


def run(batched):
    env = dict(os.environ, AB_BATCHED="1" if batched else "0")
    p = subprocess.run([sys.executable, "-c", ARM], env=env, text=True,
                       capture_output=True, timeout=2400)
    for line in p.stdout.splitlines():
        if line.startswith("ARM_JSON "):
            return json.loads(line[len("ARM_JSON "):])
    raise SystemExit(f"arm batched={batched} failed:\n{p.stderr[-2000:]}")


if __name__ == "__main__":
    ctrl = run(False)
    print("control:", ctrl, flush=True)
    test = run(True)
    print("test:   ", test)
    d = (ctrl["sec_per_step"] - test["sec_per_step"]) / ctrl["sec_per_step"]
    print(f"delta: {d * 100:+.1f}% (positive = batched wins)")
