"""Torch .pth <-> Flax PyTree weight conversion for checkpoint parity.

The reference releases generator weights as torch state dicts saved from
nn.Sequential models (modules/model.py; loaded with 'module.' prefix fixup at
generate.py:38-43 / trainer.py:381-387). This module maps those flat key
spaces onto our named Flax trees and back, so the released checkpoints run
unmodified on TPU and our checkpoints can round-trip to torch.

Key layout of the reference Generator's nn.Sequential (modules/model.py:94-113),
for num_residual_blocks = R:
  model.1            stem conv 7x7
  model.4 / model.7  stride-2 down convs
  model.{10+i}       residual block i (0..R-1) with submodules
                     block.1 / block.5 convs and, when CBAM is on,
                     cbam.channel_attention.fc.{0,2} + cbam.spatial_attention.conv
  model.{10+R}       Upsample, model.{11+R} up1 conv,
  model.{14+R}       Upsample, model.{15+R} up2 conv (offsets below)
  model.{19+R}       head conv 7x7
Discriminator (modules/model.py:122-129): model.0/2/5/8 convs + model.12 head.

Conversion only reshapes/transposes: torch conv (O,I,kh,kw) <-> flax NHWC
kernel (kh,kw,I,O); CBAM 1x1 convs (O,I,1,1) <-> dense kernels (I,O).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Remove DataParallel's 'module.' prefix (generate.py:38-43)."""
    if sd and all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_to_flax(w) -> np.ndarray:
    return _to_np(w).transpose(2, 3, 1, 0)  # (O,I,kh,kw) -> (kh,kw,I,O)


def _conv_to_torch(k: np.ndarray) -> np.ndarray:
    return np.asarray(k).transpose(3, 2, 0, 1)


def _dense_to_flax(w) -> np.ndarray:
    a = _to_np(w)
    return a.reshape(a.shape[0], a.shape[1]).T  # (O,I,1,1) -> (I,O)


def _dense_to_torch(k: np.ndarray) -> np.ndarray:
    a = np.asarray(k).T
    return a.reshape(a.shape[0], a.shape[1], 1, 1)


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Read a .pth state dict (requires the baked-in CPU torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(sd, dict):
        raise ValueError(f"{path} does not contain a state dict")
    # Full training checkpoints store nested dicts; accept either.
    if "G_A2B_state_dict" in sd:
        return {k: v for k, v in sd.items()}
    return _strip_module_prefix(sd)


def generator_params_from_torch(sd: Dict[str, Any],
                                num_residual_blocks: int = 9,
                                use_cbam: bool | None = None) -> Dict[str, Any]:
    """Torch Generator state dict -> our Flax params tree."""
    sd = _strip_module_prefix(sd)
    r = num_residual_blocks
    if use_cbam is None:
        use_cbam = any(".cbam." in k for k in sd)

    def cw(idx):  # conv kernel+bias at sequential index idx
        return {
            "kernel": _conv_to_flax(sd[f"model.{idx}.weight"]),
            "bias": _to_np(sd[f"model.{idx}.bias"]),
        }

    params: Dict[str, Any] = {
        "stem": cw(1),
        "down1": cw(4),
        "down2": cw(7),
        "up1": cw(11 + r),
        "up2": cw(15 + r),
        "head": cw(19 + r),
    }
    for i in range(r):
        base = f"model.{10 + i}"
        blk: Dict[str, Any] = {
            "conv1": {
                "kernel": _conv_to_flax(sd[f"{base}.block.1.weight"]),
                "bias": _to_np(sd[f"{base}.block.1.bias"]),
            },
            "conv2": {
                "kernel": _conv_to_flax(sd[f"{base}.block.5.weight"]),
                "bias": _to_np(sd[f"{base}.block.5.bias"]),
            },
        }
        if use_cbam:
            blk["ca"] = {
                "fc1": {"kernel": _dense_to_flax(
                    sd[f"{base}.cbam.channel_attention.fc.0.weight"])},
                "fc2": {"kernel": _dense_to_flax(
                    sd[f"{base}.cbam.channel_attention.fc.2.weight"])},
            }
            blk["sa"] = {
                "conv": {"kernel": _conv_to_flax(
                    sd[f"{base}.cbam.spatial_attention.conv.weight"])},
            }
        params[f"block{i}"] = blk
    return params


def generator_params_to_torch(params: Dict[str, Any],
                              num_residual_blocks: int = 9) -> Dict[str, Any]:
    """Our Flax Generator params -> torch state dict (numpy values)."""
    r = num_residual_blocks
    sd: Dict[str, Any] = {}

    def put(idx, p):
        sd[f"model.{idx}.weight"] = _conv_to_torch(p["kernel"])
        sd[f"model.{idx}.bias"] = np.asarray(p["bias"])

    put(1, params["stem"])
    put(4, params["down1"])
    put(7, params["down2"])
    put(11 + r, params["up1"])
    put(15 + r, params["up2"])
    put(19 + r, params["head"])
    for i in range(r):
        blk = params[f"block{i}"]
        base = f"model.{10 + i}"
        sd[f"{base}.block.1.weight"] = _conv_to_torch(blk["conv1"]["kernel"])
        sd[f"{base}.block.1.bias"] = np.asarray(blk["conv1"]["bias"])
        sd[f"{base}.block.5.weight"] = _conv_to_torch(blk["conv2"]["kernel"])
        sd[f"{base}.block.5.bias"] = np.asarray(blk["conv2"]["bias"])
        if "ca" in blk:
            sd[f"{base}.cbam.channel_attention.fc.0.weight"] = \
                _dense_to_torch(blk["ca"]["fc1"]["kernel"])
            sd[f"{base}.cbam.channel_attention.fc.2.weight"] = \
                _dense_to_torch(blk["ca"]["fc2"]["kernel"])
            sd[f"{base}.cbam.spatial_attention.conv.weight"] = \
                _conv_to_torch(blk["sa"]["conv"]["kernel"])
    return sd


_DISC_IDX = {"conv1": 0, "conv2": 2, "conv3": 5, "conv4": 8, "head": 12}


def discriminator_params_from_torch(sd: Dict[str, Any]) -> Dict[str, Any]:
    sd = _strip_module_prefix(sd)
    return {
        name: {
            "kernel": _conv_to_flax(sd[f"model.{idx}.weight"]),
            "bias": _to_np(sd[f"model.{idx}.bias"]),
        }
        for name, idx in _DISC_IDX.items()
    }


def discriminator_params_to_torch(params: Dict[str, Any]) -> Dict[str, Any]:
    sd: Dict[str, Any] = {}
    for name, idx in _DISC_IDX.items():
        sd[f"model.{idx}.weight"] = _conv_to_torch(params[name]["kernel"])
        sd[f"model.{idx}.bias"] = np.asarray(params[name]["bias"])
    return sd
