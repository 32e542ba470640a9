"""TotalSegmentator driver + mask application.

Rebuild of the reference masking.py pipeline. TotalSegmentator itself stays
an EXTERNAL subprocess exactly as in the reference (masking.py:239-253) —
its nnU-Net internals are out of scope; this module provides:

  dicom_to_nifti       — z-sorted HU volume -> NIfTI with the hand-rolled
                         affine (masking.py:104-202), via our codecs
  run_totalsegmentator — subprocess with 1200 s timeout and process-tree
                         kill (masking.py:36-68, 255-283); gated: a missing
                         binary returns a clear (ok=False, reason) instead
                         of crashing
  segment_patient      — convert + segment one patient (worker body)
  build_exclusion_mask — select the 34 cardiac/vascular/rib label IDs,
                         contour-fill + 2px dilate each label, then a final
                         4px contour dilation (masking.py:390,455-512)
  apply_exclusion_mask — set masked pixels of NCCT/CECT/sCECT triplets to
                         9999, force uncompressed MONOCHROME2 int16 output
                         (masking.py:518-560)
"""
from __future__ import annotations

import atexit
import glob
import os
import signal
import subprocess
import sys
import threading
from typing import List, Optional, Tuple

import numpy as np

# 34 cardiac/vascular/rib TotalSegmentator class IDs (masking.py:390)
MASK_TARGET_LABELS = [1, 2, 3, 4, 5, 6, 7, 8, 9, 15, 18, 19, 20, 21, 22, 23,
                      24, 51, 52, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63, 64,
                      65, 66, 67, 68]
MASK_FILL_VALUE = 9999
TIMEOUT_S = 1200


def kill_process_tree(pid: int):
    """Terminate a process and all children (masking.py:36-68)."""
    try:
        import psutil
        parent = psutil.Process(pid)
        for child in parent.children(recursive=True):
            try:
                child.kill()
            except psutil.NoSuchProcess:
                pass
        parent.kill()
    except Exception:
        # psutil missing or the process already exited: best-effort direct
        # kill so orphans don't outlive an interrupted run
        try:
            os.kill(pid, signal.SIGKILL)
        except (OSError, ProcessLookupError):
            pass


# ---------------------------------------------------------- fleet lifecycle
# Per-process registry of live external segmentation subprocesses so an
# interrupted run (SIGINT/SIGTERM or normal exit) never leaks workers —
# the reference installs the same handlers around its fleet
# (masking.py:71-95). Workers register their own subprocess; the Pool
# parent installs the handlers in each worker via `initializer=`.
_ACTIVE_PIDS: set[int] = set()
_PIDS_LOCK = threading.Lock()
_HANDLERS_INSTALLED = False


def _register_pid(pid: int):
    with _PIDS_LOCK:
        _ACTIVE_PIDS.add(pid)


def _unregister_pid(pid: int):
    with _PIDS_LOCK:
        _ACTIVE_PIDS.discard(pid)


def cleanup_workers():
    """Kill every registered external subprocess tree (idempotent)."""
    with _PIDS_LOCK:
        pids = list(_ACTIVE_PIDS)
        _ACTIVE_PIDS.clear()
    for pid in pids:
        kill_process_tree(pid)


def register_signal_handlers():
    """Install SIGINT/SIGTERM handlers + atexit cleanup that tear down any
    live segmentation subprocesses before exiting (masking.py:71-95). Safe
    to call repeatedly; also used as a multiprocessing.Pool initializer so
    each worker cleans up its own subprocess when the pool is terminated."""
    global _HANDLERS_INSTALLED
    if _HANDLERS_INSTALLED:
        return

    def _handler(signum, _frame):
        cleanup_workers()
        sys.exit(128 + signum)

    for sig in (signal.SIGINT, signal.SIGTERM):
        try:
            signal.signal(sig, _handler)
        except ValueError:  # non-main thread: atexit still covers us
            pass
    atexit.register(cleanup_workers)
    _HANDLERS_INSTALLED = True


def dicom_to_nifti(patient_dir: str, nifti_path: str) -> bool:
    """z-sorted DICOM series -> HU NIfTI with DICOM-derived affine."""
    from ducosy_tpu.dicom import dcmread
    from ducosy_tpu.dicom.nifti import dicom_affine, write_nifti

    files = glob.glob(os.path.join(patient_dir, "*.dcm"))
    if not files:
        return False
    slices = []
    for path in files:
        ds = dcmread(path)
        hu = (ds.pixel_array.astype(np.float32)
              * float(ds.get("RescaleSlope", 1.0))
              + float(ds.get("RescaleIntercept", 0.0)))
        ipp = ds.get("ImagePositionPatient", [0.0, 0.0, 0.0])
        z = float(ipp[2]) if isinstance(ipp, list) and len(ipp) >= 3 else \
            float(ds.get("InstanceNumber", 0))
        slices.append((hu, z, ds))
    slices.sort(key=lambda t: t[1])
    vol = np.stack([s[0] for s in slices]).astype(np.int16)
    first = slices[0][2]
    spacing = first.get("PixelSpacing", [1.0, 1.0])
    thickness = float(first.get("SliceThickness", 1.0))
    ipp0 = first.get("ImagePositionPatient", [0.0, 0.0, 0.0])
    affine = dicom_affine(spacing, thickness, ipp0)
    # NIfTI stores (x, y, z); our volume is (z, y, x)
    write_nifti(nifti_path, np.transpose(vol, (2, 1, 0)), affine)
    return True


def run_totalsegmentator(nifti_path: str, out_path: str, *,
                         device: str = "gpu",
                         timeout: int = TIMEOUT_S) -> Tuple[bool, Optional[str]]:
    """Spawn `TotalSegmentator -i ... -o ... --ml` (masking.py:239-283)."""
    cmd = ["TotalSegmentator", "-i", nifti_path, "-o", out_path,
           "--device", device, "--ml"]
    try:
        process = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                   stderr=subprocess.PIPE, text=True)
    except FileNotFoundError:
        return False, "TotalSegmentator command not found"
    _register_pid(process.pid)
    try:
        _stdout, stderr = process.communicate(timeout=timeout)
        kill_process_tree(process.pid)
        if process.returncode != 0:
            return False, (f"TotalSegmentator error "
                           f"(code {process.returncode}): {stderr[-200:]}")
        return True, None
    except subprocess.TimeoutExpired:
        kill_process_tree(process.pid)
        return False, "TotalSegmentator timeout"
    finally:
        _unregister_pid(process.pid)


def segment_patient(task) -> Tuple[str, bool, Optional[str]]:
    """Pool worker: DICOM -> NIfTI -> TotalSegmentator
    (masking.py:205-299)."""
    patient_dir, working_patient_dir, masked_patient_dir, device = task
    patient_id = os.path.basename(os.path.dirname(patient_dir)) or \
        os.path.basename(patient_dir)
    if os.path.exists(f"{masked_patient_dir}.nii"):
        return (patient_id, True, None)
    os.makedirs(working_patient_dir, exist_ok=True)
    nifti_path = os.path.join(working_patient_dir, "input.nii.gz")
    if not dicom_to_nifti(patient_dir, nifti_path):
        return (patient_id, False, "Failed to convert DICOM to NIfTI")
    ok, err = run_totalsegmentator(nifti_path, masked_patient_dir,
                                   device=device)
    return (patient_id, ok, err)


def build_exclusion_mask(label_volume: np.ndarray,
                         labels: List[int] = MASK_TARGET_LABELS
                         ) -> np.ndarray:
    """Multi-label volume (z, y, x) -> binary exclusion mask with the
    reference's contour fill + dilation passes (masking.py:455-512)."""
    import cv2

    out = np.zeros_like(label_volume, dtype=np.uint8)
    for z in range(label_volume.shape[0]):
        slice_mask = label_volume[z]
        filtered = np.zeros(slice_mask.shape, np.uint8)
        for label in labels:
            lm = (slice_mask == label).astype(np.uint8)
            if not lm.any():
                continue
            contours, _ = cv2.findContours(lm, cv2.RETR_EXTERNAL,
                                           cv2.CHAIN_APPROX_SIMPLE)
            cv2.drawContours(filtered, contours, -1, 1, thickness=-1)
            cv2.drawContours(filtered, contours, -1, 1, thickness=2)
            filtered[lm == 1] = 1
        # final 4px contour dilation (masking.py:507-512)
        contours, _ = cv2.findContours(filtered, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        cv2.drawContours(filtered, contours, -1, 1, thickness=4)
        out[z] = filtered
    return out


def apply_exclusion_mask(dcm_paths: List[str], mask_volume: np.ndarray,
                         out_dir: str):
    """Set masked pixels to 9999, force ExplicitVRLittleEndian int16
    MONOCHROME2, save under out_dir (masking.py:518-560)."""
    from ducosy_tpu.dicom import dcmread

    os.makedirs(out_dir, exist_ok=True)
    for idx, path in enumerate(dcm_paths):
        ds = dcmread(path)
        px = ds.pixel_array.copy().astype(np.int16)
        px[mask_volume[idx] != 0] = MASK_FILL_VALUE
        ds.PixelData = px.tobytes()
        ds.BitsAllocated = 16
        ds.BitsStored = 16
        ds.HighBit = 15
        ds.PixelRepresentation = 1
        if ds.get("PhotometricInterpretation") in ("YBR_FULL_422",
                                                   "YBR_FULL"):
            ds.PhotometricInterpretation = "MONOCHROME2"
        ds.save_as(os.path.join(out_dir, os.path.basename(path)))
