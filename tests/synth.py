"""Synthetic DICOM dataset builders shared by integration tests."""
import os

import numpy as np

from ducosy_tpu.dicom.codec import new_ct_dataset


def chest_hu(h=64, w=64, *, contrast=False, z=0):
    """Small chest-like slice: air, body, two lungs, vessel bright in CECT."""
    hu = np.full((h, w), -1024.0, np.float32)
    yy, xx = np.mgrid[:h, :w]
    body = ((yy - h / 2) / (h * 0.44)) ** 2 + \
           ((xx - w / 2) / (w * 0.46)) ** 2 < 1
    hu[body] = 40.0 + z
    for cx in (w * 0.33, w * 0.67):
        lung = ((yy - h / 2) / (h * 0.25)) ** 2 + \
               ((xx - cx) / (w * 0.15)) ** 2 < 1
        hu[lung] = -850.0
    if contrast:
        vessel = ((yy - h * 0.45) ** 2 + (xx - w / 2) ** 2) < (h * 0.06) ** 2
        hu[vessel & body] = 200.0
    spine = (np.abs(xx - w / 2) < w * 0.06) & (yy > h * 0.78) & body
    hu[spine] = 600.0
    return hu


def write_patient(patient_dir: str, n_slices: int = 4, size: int = 64,
                  ncct_folder: str = "POST VUE",
                  cect_folder: str = "POST STD"):
    """Write a paired NCCT/CECT synthetic patient; returns the dir."""
    for series, contrast in ((ncct_folder, False), (cect_folder, True)):
        d = os.path.join(patient_dir, series)
        os.makedirs(d, exist_ok=True)
        for i in range(n_slices):
            hu = chest_hu(size, size, contrast=contrast, z=i)
            stored = np.clip(hu + 1024.0, 0, 65535).astype(np.uint16)
            ds = new_ct_dataset(size, size, instance_number=i + 1,
                                series_description=series)
            ds.set_pixel_array(stored)
            ds.save_as(os.path.join(d, f"{i:04d}.dcm"))
    return patient_dir


def write_dataset(root: str, n_patients: int = 2, n_slices: int = 4,
                  size: int = 64, dataset_name: str = "SynthSet"):
    base = os.path.join(root, dataset_name)
    for p in range(n_patients):
        write_patient(os.path.join(base, f"patient{p:02d}"), n_slices, size)
    return base
