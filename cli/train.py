#!/usr/bin/env python
"""Training CLI.

Mirrors the reference train.py (:16-49) + get_common_train_args
(modules/argmanager.py:85-118): trains the soft-tissue and/or lung CycleGAN
sequentially with the fixed per-range HU/window/mask settings
(argmanager.py:121-152) merged over these shared flags.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="TPU-native DuCoSy-GAN training")
    p.add_argument("--target_model", type=str, default="soft_tissue",
                   choices=["soft_tissue", "lung", "all"])
    p.add_argument("--epochs", type=int, default=10000)
    p.add_argument("--decay_epoch", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=8,
                   help="global batch across the TPU mesh")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--lambda_cyc", type=float, default=10.0)
    p.add_argument("--lambda_id", type=float, default=5.0)
    p.add_argument("--num_workers", type=int, default=16)
    p.add_argument("--training_dir", type=str, default="./training_dir")
    p.add_argument("--data_root", type=str, default="./data/train")
    p.add_argument("--dataset_names", type=str, default="")
    p.add_argument("--ncct_folder", type=str, default="POST VUE")
    p.add_argument("--cect_folder", type=str, default="POST STD")
    p.add_argument("--resume", type=str, default="checkpoint",
                   help="checkpoint dir name under saved_models ('' = fresh)")
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--val_split", type=float, default=0.2)
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--num_devices", type=int, default=None,
                   help="limit the data mesh to the first N devices")
    p.add_argument("--max_epochs", type=int, default=None,
                   help="cap epochs this invocation (resume continues)")
    p.add_argument("--num_residual_blocks", type=int, default=9)
    p.add_argument("--profile_dir", type=str, default="",
                   help="write a jax.profiler trace of a few early steps")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ducosy_tpu.config import ModelConfig, TrainConfig, replace
    from ducosy_tpu.train.loop import train_cycle_gan
    from ducosy_tpu.utils.compcache import enable_persistent_cache

    # restarted runs (per-range trainings, resumes, pod workers) reuse the
    # compiled 512^2 train step instead of repaying the ~4 min compile
    enable_persistent_cache()

    cfg = replace(
        TrainConfig(),
        epochs=args.epochs, decay_epoch=args.decay_epoch,
        batch_size=args.batch_size, lr=args.lr,
        lambda_cyc=args.lambda_cyc, lambda_id=args.lambda_id,
        num_workers=args.num_workers, training_dir=args.training_dir,
        data_root=args.data_root, dataset_names=args.dataset_names,
        ncct_folder=args.ncct_folder, cect_folder=args.cect_folder,
        resume=args.resume, img_size=args.img_size,
        val_split=args.val_split, compute_dtype=args.compute_dtype,
        profile_dir=args.profile_dir)
    os.makedirs(cfg.training_dir, exist_ok=True)

    targets = ["soft_tissue", "lung"] if args.target_model == "all" \
        else [args.target_model]
    for target in targets:
        print(f"=== training {target} CycleGAN ===")
        out = train_cycle_gan(
            cfg, target,
            ModelConfig(num_residual_blocks=args.num_residual_blocks),
            max_epochs=args.max_epochs, num_devices=args.num_devices)
        print(f"=== {target} done: {out} ===")


if __name__ == "__main__":
    main()
