#!/usr/bin/env python
"""Evaluation CLI.

Mirrors the reference calculate.py main (:848-868): convert DICOM series to
cached HU volumes, compute the 12-metric suite over all patients in a
process pool, write per-slice CSVs, summary statistics, and figures.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DuCoSy-GAN evaluation suite")
    p.add_argument("--input_dir_root", type=str, default="./data/input")
    p.add_argument("--output_dir_root", type=str, default="./data/output")
    p.add_argument("--dataset_names", type=str, nargs="+", default=[])
    p.add_argument("--ncct_folder", type=str, default="POST VUE")
    p.add_argument("--cect_folder", type=str, default="POST STD")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--reset", action="store_true",
                   help="clear the conversion + result caches first")
    p.add_argument("--fast", action="store_true",
                   help="skip figures")
    p.add_argument("--mask", action="store_true",
                   help="evaluate the masked triplets under <output>/masked")
    p.add_argument("--skip_convert", action="store_true",
                   help="skip DICOM->npy conversion (use existing caches)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ducosy_tpu.eval import report
    from ducosy_tpu.eval.lpips import default_weights_path

    if default_weights_path() is None:
        print("note: no LPIPS weights found — the lpips column will be NaN "
              "(like the reference without its lpips package). Provision "
              "them once with scripts/export_lpips_weights.py, or point "
              "DUCOSY_LPIPS_WEIGHTS at an existing lpips_alex.npz/.pth.")

    calc_dir, data_dir, tasks = report.convert(
        args.input_dir_root, args.output_dir_root, args.dataset_names,
        ncct_folder=args.ncct_folder, cect_folder=args.cect_folder,
        reset=args.reset, masked=args.mask, skip_convert=args.skip_convert)
    print(f"converted {len(tasks)} patients -> {data_dir}")
    results = report.calculate(data_dir, calc_dir, tasks,
                               num_workers=args.num_workers,
                               use_cache=not args.reset)
    print(f"computed metrics for {len(results)} patients")
    summary = report.summary_statistics(results, calc_dir)
    print(f"summary: {summary}")
    if not args.fast:
        figs = report.save_figures(results, calc_dir)
        print(f"figures: {figs}")


if __name__ == "__main__":
    main()
