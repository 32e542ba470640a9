"""DICOM codec tests: round-trips, tag surgery, implicit-VR reads, and the
pydicom-compatible surface the pipeline uses (pixel_array, RescaleSlope,
add_new, save_as — cf. reference generate.py:107-126,266-297)."""
import struct

import numpy as np
import pytest

from ducosy_tpu.dicom import codec
from ducosy_tpu.dicom.codec import Dataset, dcmread, new_ct_dataset


def _phantom(rows=32, cols=32, seed=0, signed=False):
    rng = np.random.default_rng(seed)
    if signed:
        arr = rng.integers(-1024, 3000, (rows, cols)).astype(np.int16)
    else:
        arr = rng.integers(0, 4000, (rows, cols)).astype(np.uint16)
    ds = new_ct_dataset(rows, cols, signed=signed)
    ds.set_pixel_array(arr)
    return ds, arr


def test_roundtrip_explicit(tmp_path):
    ds, arr = _phantom()
    p = str(tmp_path / "a.dcm")
    ds.save_as(p)
    back = dcmread(p)
    np.testing.assert_array_equal(back.pixel_array, arr)
    assert float(back.RescaleSlope) == 1.0
    assert float(back.RescaleIntercept) == -1024.0
    assert back.Rows == 32 and back.Columns == 32
    assert back.file_meta.TransferSyntaxUID == codec.EXPLICIT_VR_LE


def test_signed_pixels(tmp_path):
    ds, arr = _phantom(signed=True)
    p = str(tmp_path / "s.dcm")
    ds.save_as(p)
    back = dcmread(p)
    assert back.pixel_array.dtype == np.int16
    np.testing.assert_array_equal(back.pixel_array, arr)


def test_tag_surgery(tmp_path):
    """The synthesis writeback path: PixelData swap, VR-correct min/max tags,
    window + series description updates (generate.py:266-297)."""
    ds, arr = _phantom()
    new_arr = (arr // 2).astype(np.uint16)
    out = ds.copy()
    out.PixelData = new_arr.tobytes()
    vr = "US" if out.PixelRepresentation == 0 else "SS"
    out.add_new((0x0028, 0x0106), vr, int(new_arr.min()))
    out.add_new((0x0028, 0x0107), vr, int(new_arr.max()))
    out.WindowWidth = 1250.0
    out.WindowCenter = -375.0
    out.SeriesDescription = "DuCoSyGAN sCECT v2"
    p = str(tmp_path / "m.dcm")
    out.save_as(p)
    back = dcmread(p)
    np.testing.assert_array_equal(back.pixel_array, new_arr)
    assert back.SmallestImagePixelValue == int(new_arr.min())
    assert back.LargestImagePixelValue == int(new_arr.max())
    assert back.SeriesDescription == "DuCoSyGAN sCECT v2"
    assert float(back.WindowCenter) == -375.0
    # original untouched
    np.testing.assert_array_equal(ds.pixel_array, arr)


def test_stop_before_pixels(tmp_path):
    ds, _ = _phantom()
    ds.InstanceNumber = 17
    p = str(tmp_path / "h.dcm")
    ds.save_as(p)
    hdr = dcmread(p, stop_before_pixels=True)
    assert int(hdr.InstanceNumber) == 17
    assert hdr.PixelData is None


def test_multivalue_ds(tmp_path):
    ds, _ = _phantom()
    ds.PixelSpacing = [0.75, 0.75]
    ds.ImagePositionPatient = [-200.0, -180.5, 42.25]
    p = str(tmp_path / "mv.dcm")
    ds.save_as(p)
    back = dcmread(p)
    assert back.PixelSpacing == [0.75, 0.75]
    assert back.ImagePositionPatient == [-200.0, -180.5, 42.25]


def test_implicit_vr_read(tmp_path):
    """Hand-build an Implicit VR LE file and read it."""
    arr = np.arange(16, dtype=np.uint16).reshape(4, 4)
    body = b""

    def el(group, elem, raw):
        return struct.pack("<HHI", group, elem, len(raw)) + raw

    body += el(0x0028, 0x0010, struct.pack("<H", 4))
    body += el(0x0028, 0x0011, struct.pack("<H", 4))
    body += el(0x0028, 0x0100, struct.pack("<H", 16))
    body += el(0x0028, 0x0103, struct.pack("<H", 0))
    body += el(0x0028, 0x1052, b"-1024 ")
    body += el(0x0028, 0x1053, b"1 ")
    body += el(0x7FE0, 0x0010, arr.tobytes())

    meta_el = b""
    def mel(group, elem, vr, raw):
        if len(raw) % 2:
            raw += b"\x00"
        return struct.pack("<HH2sH", group, elem, vr, len(raw)) + raw
    meta_body = mel(0x0002, 0x0010, b"UI", codec.IMPLICIT_VR_LE.encode())
    meta_el = mel(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body)))

    p = tmp_path / "imp.dcm"
    p.write_bytes(b"\x00" * 128 + b"DICM" + meta_el + meta_body + body)
    ds = dcmread(str(p))
    np.testing.assert_array_equal(ds.pixel_array, arr)
    assert float(ds.RescaleIntercept) == -1024.0
    # implicit read assigns dictionary VRs
    assert ds.get_element((0x0028, 0x0010)).vr == "US"


def test_sequence_passthrough(tmp_path):
    """Unknown SQ content must round-trip byte-exactly."""
    ds, arr = _phantom()
    # defined-length private sequence payload
    item = struct.pack("<HHI", 0xFFFE, 0xE000, 4) + b"\xde\xad\xbe\xef"
    ds.set_raw((0x0008, 0x1115), "SQ", item)
    p = str(tmp_path / "sq.dcm")
    ds.save_as(p)
    back = dcmread(p)
    assert back.get_element((0x0008, 0x1115)).raw == item
    np.testing.assert_array_equal(back.pixel_array, arr)


def test_compressed_rejected(tmp_path):
    ds, _ = _phantom()
    p = str(tmp_path / "c.dcm")
    ds.save_as(p)
    raw = bytearray(open(p, "rb").read())
    jpeg_uid = b"1.2.840.10008.1.2.4.90"
    explicit = codec.EXPLICIT_VR_LE.encode() + b"\x00"
    idx = raw.find(explicit)
    raw[idx:idx + len(explicit)] = jpeg_uid + b"\x00"
    # fix length field of the TSU element (2 bytes before value)
    raw[idx - 2:idx] = struct.pack("<H", len(jpeg_uid) + 1)
    p2 = tmp_path / "c2.dcm"
    p2.write_bytes(bytes(raw))
    with pytest.raises(NotImplementedError):
        dcmread(str(p2))


def test_fuzz_mutations_fail_cleanly(tmp_path, rng):
    """Random byte flips + truncations of a valid file must either parse or
    raise one of the documented error types — never struct.error /
    Unicode errors / message-less AttributeErrors (a property getter's
    AttributeError is masked by __getattr__) / hangs."""
    ds = new_ct_dataset(16, 16, signed=True)
    ds.set_pixel_array(rng.integers(-1000, 1000, (16, 16)).astype(np.int16))
    p = str(tmp_path / "base.dcm")
    ds.save_as(p)
    raw = open(p, "rb").read()

    for trial in range(400):
        b = bytearray(raw)
        for _ in range(int(rng.integers(1, 8))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        if rng.random() < 0.3:
            b = b[:int(rng.integers(0, len(b)))]
        try:
            d = dcmread(bytes(b))
            if d.PixelData is not None:
                _ = d.pixel_array
            _ = str(d.get("SeriesDescription", ""))
        except (ValueError, EOFError, NotImplementedError, KeyError):
            pass
        except AttributeError as e:
            # only the pydicom-compatible "no PixelData" path may surface
            assert "pixel_array" not in str(e) or d.PixelData is None


def test_sv_uv_long_form_keeps_alignment():
    """SV/UV (64-bit, 2019 edition) use the 12-byte explicit form; parsing
    them short-form would consume the length field as the next tag."""
    import struct

    stream = b""
    for vr, value in ((b"SV", struct.pack("<q", -5)),
                      (b"UV", struct.pack("<Q", 7))):
        stream += struct.pack("<HH2sHI", 0x0011, 0x0001, vr, 0, len(value))
        stream += value
    # a recognizable trailing element proves the stream stayed aligned
    stream += struct.pack("<HH2sH", 0x0008, 0x103E, b"LO", 4) + b"OK  "
    ds = dcmread(stream)
    assert ds.SeriesDescription == "OK"


def test_garbage_file_raises(tmp_path):
    """A non-DICOM file must raise, not yield an empty Dataset — the
    reference surfaces pydicom's InvalidDicomError on such inputs."""
    for payload in (b"", b"DICM", b"\x00" * 7):
        p = tmp_path / "junk.dcm"
        p.write_bytes(payload)
        with pytest.raises(EOFError):
            dcmread(str(p))
    # 8-byte-aligned zero runs parse as whole (0000,0000) elements with an
    # invalid VR — must raise, not yield a one-element Dataset
    for payload in (b"\x00" * 40, b"\xff" * 64, b"PK\x03\x04" + b"\x00" * 60):
        p = tmp_path / "junk2.dcm"
        p.write_bytes(payload)
        with pytest.raises((ValueError, EOFError)):
            dcmread(str(p))
