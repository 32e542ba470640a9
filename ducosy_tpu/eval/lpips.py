"""LPIPS (Learned Perceptual Image Patch Similarity), AlexNet backbone.

JAX re-implementation of the `lpips` package's default configuration
(``lpips.LPIPS(net='alex')``) used by the reference evaluation suite
(/root/reference/calculate.py:293-318): inputs in [-1, 1], an ImageNet
scaling layer, the torchvision AlexNet ``features`` trunk, channel-unit-
normalized feature differences squared, 1x1 non-negative linear heads,
spatial mean, summed over the five stages.

Pretrained weights cannot ship offline, so the network is weight-file
driven: :func:`load_lpips_weights` accepts either

  * a torch checkpoint (``.pth``/``.pt``) whose state dict contains the
    torchvision AlexNet keys (``features.0.weight`` ...) for the backbone
    and the lpips linear-head keys (``lin0.model.1.weight`` ...), i.e. the
    concatenation of ``alexnet(weights=...).state_dict()`` and
    ``lpips/weights/v0.1/alex.pth`` — the exact tensors the reference's
    ``lpips`` package downloads; or
  * an ``.npz`` with the same key names (portable, torch-free).

Without a weights file, callers fall back to NaN exactly like the
reference does when its ``lpips`` import fails (calculate.py:33-41).
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

# torchvision AlexNet `features` trunk: (layer-index, out_ch, kernel, stride,
# pad) for the conv layers; stage boundaries after each ReLU that lpips taps.
_CONVS = (
    ("features.0", 64, 11, 4, 2),
    ("features.3", 192, 5, 1, 2),
    ("features.6", 384, 3, 1, 1),
    ("features.8", 256, 3, 1, 1),
    ("features.10", 256, 3, 1, 1),
)
# max-pool (3x3 stride 2) sits before conv stages 2 and 3
_POOL_BEFORE = (False, True, True, False, False)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

ENV_WEIGHTS = "DUCOSY_LPIPS_WEIGHTS"


def default_weights_path() -> str | None:
    """Weights file from $DUCOSY_LPIPS_WEIGHTS or the conventional
    checkpoints/lpips_alex.{npz,pth} locations; None when absent."""
    cand = [os.environ.get(ENV_WEIGHTS, "")]
    cand += ["checkpoints/lpips_alex.npz", "checkpoints/lpips_alex.pth"]
    for c in cand:
        if c and os.path.isfile(c):
            return c
    return None


def load_lpips_weights(path: str) -> Dict[str, np.ndarray]:
    """Load and validate LPIPS-AlexNet weights into the canonical dict:
    conv kernels/biases in HWIO/(C,) plus per-stage head vectors ``lin{i}``
    of shape (C,)."""
    if path.endswith(".npz"):
        raw = {k: np.asarray(v) for k, v in np.load(path).items()}
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):  # a full module was saved
            sd = sd.state_dict()
        raw = {k: v.detach().cpu().numpy() for k, v in sd.items()}

    params: Dict[str, np.ndarray] = {}
    for i, (key, out_ch, k, _, _) in enumerate(_CONVS):
        w = raw.get(f"{key}.weight")
        b = raw.get(f"{key}.bias")
        if w is None or b is None:
            raise ValueError(f"LPIPS weights at {path} missing {key}.*")
        if w.shape != (out_ch, w.shape[1], k, k):
            raise ValueError(f"{key}.weight has shape {w.shape}")
        # torch OIHW -> XLA HWIO
        params[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        params[f"conv{i}_b"] = b.astype(np.float32)
    for i, (_, out_ch, _, _, _) in enumerate(_CONVS):
        lin = raw.get(f"lin{i}.model.1.weight",
                      raw.get(f"lins.{i}.model.1.weight",
                              raw.get(f"lin{i}")))
        if lin is None:
            raise ValueError(f"LPIPS weights at {path} missing lin{i}")
        params[f"lin{i}"] = np.asarray(lin, np.float32).reshape(-1)
        if params[f"lin{i}"].shape != (out_ch,):
            raise ValueError(f"lin{i} has {params[f'lin{i}'].shape} weights, "
                             f"expected ({out_ch},)")
    return params


def save_lpips_weights_npz(params: Dict[str, np.ndarray], path: str) -> None:
    """Persist canonical weights as a portable .npz (torch-free reload)."""
    flat = {}
    for i, (key, _, _, _, _) in enumerate(_CONVS):
        # store in the torch OIHW layout so the .npz mirrors the .pth keys
        flat[f"{key}.weight"] = np.transpose(
            params[f"conv{i}_w"], (3, 2, 0, 1))
        flat[f"{key}.bias"] = params[f"conv{i}_b"]
        flat[f"lin{i}"] = params[f"lin{i}"]
    np.savez(path, **flat)


def _lpips_forward(params, x0, x1):
    """Per-sample LPIPS distances. x0, x1: (N, H, W, 1) in [-1, 1]."""
    import jax
    import jax.numpy as jnp

    def scale(x):
        x = jnp.broadcast_to(x, x.shape[:3] + (3,))  # grey -> RGB
        return (x - _SHIFT) / _SCALE

    def stages(x):
        feats = []
        h = x
        for i, (_, _, k, stride, pad) in enumerate(_CONVS):
            if _POOL_BEFORE[i]:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                    "VALID")
            h = jax.lax.conv_general_dilated(
                h, params[f"conv{i}_w"], (stride, stride),
                [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST)
            h = h + params[f"conv{i}_b"]
            h = jax.nn.relu(h)
            feats.append(h)
        return feats

    f0, f1 = stages(scale(x0)), stages(scale(x1))
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        na = a / (jnp.sqrt(jnp.sum(a * a, -1, keepdims=True)) + 1e-10)
        nb = b / (jnp.sqrt(jnp.sum(b * b, -1, keepdims=True)) + 1e-10)
        d = (na - nb) ** 2
        # 1x1 head then spatial mean (lpips spatial=False)
        total = total + jnp.mean(d @ params[f"lin{i}"], axis=(1, 2))
    return total


class LPIPSAlex:
    """Callable LPIPS metric over (Z, H, W) volumes, reference semantics:
    min-max normalize each volume to [0,1], map to [-1,1], replicate to
    3 channels, per-slice distances (calculate.py:296-312)."""

    def __init__(self, weights_path: str):
        import jax
        import jax.numpy as jnp

        self.params = {k: jnp.asarray(v)
                       for k, v in load_lpips_weights(weights_path).items()}
        self._fwd = jax.jit(_lpips_forward)

    def __call__(self, img1: np.ndarray, img2: np.ndarray,
                 batch: int = 8) -> tuple[float, list[float]]:
        import jax.numpy as jnp

        def norm(v):
            v = np.asarray(v, np.float32)
            v = (v - v.min()) / (v.max() - v.min() + 1e-8)
            return v * 2.0 - 1.0

        a, b = norm(img1), norm(img2)
        dists: list[float] = []
        for s in range(0, len(a), batch):
            x0 = jnp.asarray(a[s:s + batch])[..., None]
            x1 = jnp.asarray(b[s:s + batch])[..., None]
            dists += [float(d) for d in np.asarray(
                self._fwd(self.params, x0, x1))]
        return float(np.mean(dists)), dists
