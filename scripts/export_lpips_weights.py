#!/usr/bin/env python
"""Provision LPIPS-AlexNet weights for the evaluation suite.

The reference's ``lpips`` package auto-downloads the torchvision AlexNet
backbone and the v0.1 linear heads on first use
(/root/reference/calculate.py:33-41,293-318). This repo's JAX LPIPS
(ducosy_tpu/eval/lpips.py) is weight-file driven instead — run this script
once to produce the portable ``checkpoints/lpips_alex.npz`` that
``calculate_lpips`` picks up automatically.

Two modes:

  online (default)    download both tensors with torch.hub:
                        python scripts/export_lpips_weights.py
  offline / convert   merge user-supplied checkpoints (e.g. a torchvision
                      ``alexnet-owt*.pth`` and the lpips package's
                      ``weights/v0.1/alex.pth``):
                        python scripts/export_lpips_weights.py \
                            --backbone alexnet-owt-7be5be79.pth \
                            --heads alex.pth

Either way the merged state dict is validated through
``load_lpips_weights`` (shape checks per conv stage) before the .npz is
written, so a bad artifact fails loudly here, not as NaNs at eval time.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# torch.hub sources the reference implicitly relies on: torchvision's
# AlexNet IMAGENET1K_V1 weights and the lpips repo's v0.1 alex heads
BACKBONE_URL = "https://download.pytorch.org/models/alexnet-owt-7be5be79.pth"
HEADS_URL = ("https://github.com/richzhang/PerceptualSimilarity/raw/master/"
             "lpips/weights/v0.1/alex.pth")


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Export LPIPS-AlexNet weights to a portable .npz")
    p.add_argument("--backbone", type=str, default=None,
                   help="local torchvision AlexNet .pth (offline mode); "
                        "downloaded from download.pytorch.org when omitted")
    p.add_argument("--heads", type=str, default=None,
                   help="local lpips v0.1 alex.pth linear heads (offline "
                        "mode); downloaded from the PerceptualSimilarity "
                        "repo when omitted")
    p.add_argument("--out", type=str, default="checkpoints/lpips_alex.npz")
    return p.parse_args(argv)


def _load_state_dict(local_path, url, what):
    import torch

    if local_path:
        sd = torch.load(local_path, map_location="cpu", weights_only=True)
    else:
        print(f"downloading {what} from {url} ...")
        try:
            sd = torch.hub.load_state_dict_from_url(url, map_location="cpu",
                                                    weights_only=True)
        except Exception as e:
            raise SystemExit(
                f"could not download the {what} ({e}).\n"
                f"On an offline machine, fetch it elsewhere and pass "
                f"--backbone/--heads:\n  {BACKBONE_URL}\n  {HEADS_URL}")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v for k, v in sd.items()}


def main(argv=None):
    args = parse_args(argv)
    from ducosy_tpu.eval.lpips import (load_lpips_weights,
                                       save_lpips_weights_npz)

    backbone = _load_state_dict(args.backbone, BACKBONE_URL,
                                "AlexNet backbone")
    heads = _load_state_dict(args.heads, HEADS_URL, "LPIPS linear heads")

    merged = {}
    merged.update({k: v for k, v in backbone.items()
                   if k.startswith("features.")})
    merged.update({k: v for k, v in heads.items() if k.startswith("lin")})

    import tempfile

    import torch

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with tempfile.NamedTemporaryFile(suffix=".pth") as tmp:
        torch.save(merged, tmp.name)
        params = load_lpips_weights(tmp.name)  # validates every stage
    save_lpips_weights_npz(params, args.out)
    print(f"wrote {args.out} — calculate_lpips will now return finite "
          f"values (set DUCOSY_LPIPS_WEIGHTS to use a different path)")


if __name__ == "__main__":
    main()
