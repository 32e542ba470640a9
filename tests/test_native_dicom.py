"""Native C++ DICOM parser tests (skipped when the .so isn't built; CI can
build it with `make -C native`)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from ducosy_tpu.dicom import dcmread, native
from tests.synth import write_patient

if not native.available():
    # try a one-shot build (g++ is baked into the image)
    root = os.path.join(os.path.dirname(__file__), "..")
    subprocess.run(["make", "-C", os.path.join(root, "native")],
                   capture_output=True)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native parser not built")


@pytest.fixture(scope="module")
def patient(tmp_path_factory):
    d = tmp_path_factory.mktemp("pat")
    write_patient(str(d), n_slices=3, size=64)
    return d


def test_native_matches_python_codec(patient):
    p = str(patient / "POST VUE" / "0001.dcm")
    info = native.read_slice(p)
    ds = dcmread(p)
    np.testing.assert_array_equal(info.pixels, ds.pixel_array)
    assert info.rows == ds.Rows and info.cols == ds.Columns
    assert info.rescale_slope == float(ds.RescaleSlope)
    assert info.rescale_intercept == float(ds.RescaleIntercept)
    assert info.instance_number == int(ds.InstanceNumber)


def test_native_header_only(patient):
    p = str(patient / "POST STD" / "0002.dcm")
    info = native.read_slice(p, pixels=False)
    assert info.pixels is None
    assert info.instance_number == 3


def test_native_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.dcm"
    bad.write_bytes(b"\x00" * 200)
    with pytest.raises(ValueError):
        native.read_slice(str(bad))


def test_native_rejects_truncated(patient, tmp_path):
    src = (patient / "POST VUE" / "0000.dcm").read_bytes()
    t = tmp_path / "trunc.dcm"
    t.write_bytes(src[: len(src) // 2])
    with pytest.raises(ValueError):
        native.read_slice(str(t))


def test_read_slice_any_fallback_equivalence(patient):
    """The pure-Python fallback exposes identical fields."""
    p = str(patient / "POST VUE" / "0000.dcm")
    fast = native.read_slice(p)
    import ducosy_tpu.dicom.native as nat
    saved = nat._lib
    try:
        nat._lib = None
        orig_exists = os.path.exists
        # force fallback by pretending the .so is missing
        nat_path = nat._LIB_PATH
        nat._LIB_PATH = "/nonexistent.so"
        slow = nat.read_slice_any(p)
        nat._LIB_PATH = nat_path
    finally:
        nat._lib = saved
    np.testing.assert_array_equal(fast.pixels, slow.pixels)
    assert fast.instance_number == slow.instance_number
    assert fast.rescale_intercept == slow.rescale_intercept


def test_native_fuzz_mutations_fail_cleanly(tmp_path, rng):
    """Byte flips + truncations against the C++ parser: parse or raise a
    documented error type — never a segfault or an unexpected exception
    (5000-trial offline sweep was clean; 300 here keep CI fast)."""
    from ducosy_tpu.dicom.codec import new_ct_dataset

    ds = new_ct_dataset(16, 16, signed=True)
    ds.set_pixel_array(rng.integers(-1000, 1000, (16, 16)).astype(np.int16))
    base = tmp_path / "base.dcm"
    ds.save_as(str(base))
    raw = base.read_bytes()

    t = tmp_path / "mut.dcm"
    for trial in range(300):
        b = bytearray(raw)
        for _ in range(int(rng.integers(1, 10))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        if rng.random() < 0.3:
            b = b[:int(rng.integers(0, len(b)))]
        t.write_bytes(bytes(b))
        try:
            native.read_slice(str(t))
        except (ValueError, EOFError, NotImplementedError):
            pass
