"""Compressed transfer syntaxes: RLE Lossless + JPEG Lossless SV1.

The reference reads compressed archives through the python-rle / pylibjpeg
wheels it installs (/root/reference/requirements.txt); pydicom's
pixel_array is the entry point of its whole pipeline
(modules/preprocess.py:68-90, modules/dataset.py:109-120).  These tests
pin our self-contained decoders: byte-level goldens hand-assembled from
the specs (PS3.5 Annex G; ITU-T T.81), encode->decode round-trips on
CT-like content, dataset-level reads through dcmread().pixel_array, and
fuzz on truncated/corrupt streams.
"""
import io
import os
import struct

import numpy as np
import pytest

from ducosy_tpu.dicom import codec as C
from ducosy_tpu.dicom import compressed as X


def _ct_slice(rng, rows=64, cols=64):
    """Synthetic CT-like content: smooth anatomy + flat air background
    (long runs for RLE) + some noise and extreme values."""
    yy, xx = np.mgrid[:rows, :cols]
    hu = np.full((rows, cols), -1024.0)
    body = ((yy - rows / 2) ** 2 + (xx - cols / 2) ** 2) < (rows / 2.5) ** 2
    hu[body] = 40 + 30 * np.sin(xx[body] / 3.0)
    hu += rng.normal(0, 5, hu.shape) * body
    hu[0, 0], hu[-1, -1] = -32768, 32767  # dtype extremes survive
    return np.clip(hu, -32768, 32767).astype(np.int16)


# --------------------------------------------------------------- PackBits

def test_packbits_roundtrip_runs_and_literals():
    rng = np.random.default_rng(0)
    for data in (b"\x00" * 300, b"ab" * 7, bytes(rng.integers(0, 256, 513)),
                 b"x", b"\xff" * 129 + b"literal"):
        enc = X._packbits_encode(data)
        dec = X._packbits_decode(enc, 0, len(enc), len(data))
        assert dec == data


def test_packbits_golden():
    # PS3.5 G.3.1 semantics: n=2 -> 3 literal bytes; n=254 -> repeat 3x
    assert X._packbits_decode(bytes([2, 10, 20, 30]), 0, 4, 3) == \
        bytes([10, 20, 30])
    assert X._packbits_decode(bytes([254, 7]), 0, 2, 3) == bytes([7, 7, 7])
    # n=128 is a no-op
    assert X._packbits_decode(bytes([128, 0, 9]), 0, 3, 1) == bytes([9])


def test_packbits_truncated_raises():
    with pytest.raises(ValueError):
        X._packbits_decode(bytes([5, 1, 2]), 0, 3, 6)  # literal run cut
    with pytest.raises(ValueError):
        X._packbits_decode(bytes([254]), 0, 1, 3)  # replicate byte missing
    with pytest.raises(ValueError):
        X._packbits_decode(b"", 0, 0, 1)  # empty segment


# -------------------------------------------------------------------- RLE

def test_rle_roundtrip_int16():
    rng = np.random.default_rng(1)
    arr = _ct_slice(rng)
    frame = X.rle_encode_frame(arr)
    out = X.rle_decode_frame(frame, *arr.shape, 16)
    np.testing.assert_array_equal(out.view(np.int16), arr)


def test_rle_roundtrip_uint8():
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 255, (31, 17)).astype(np.uint8)
    frame = X.rle_encode_frame(arr)
    out = X.rle_decode_frame(frame, *arr.shape, 8)
    np.testing.assert_array_equal(out, arr)


def test_rle_golden_header_and_planes():
    """Hand-built 2x2 uint16 frame per PS3.5 Annex G: 2 segments (MSB
    plane first), 64-byte header of 16 LE uint32s."""
    # pixels: [[0x0102, 0x0304], [0x0102, 0x0304]]
    msb_plane = bytes([1, 3, 1, 3])   # PackBits literal: n=3 then 4 bytes
    lsb_plane = bytes([2, 4, 2, 4])
    seg1 = bytes([3]) + msb_plane + b"\x00"  # literal-4 + pad to even
    seg2 = bytes([3]) + lsb_plane + b"\x00"
    header = struct.pack("<16I", 2, 64, 64 + len(seg1), *([0] * 13))
    frame = header + seg1 + seg2
    out = X.rle_decode_frame(frame, 2, 2, 16)
    np.testing.assert_array_equal(
        out, np.array([[0x0102, 0x0304], [0x0102, 0x0304]], np.uint16))


def test_rle_corrupt_frames_raise():
    rng = np.random.default_rng(3)
    arr = _ct_slice(rng, 8, 8)
    frame = X.rle_encode_frame(arr)
    with pytest.raises(ValueError):
        X.rle_decode_frame(frame[:40], 8, 8, 16)  # shorter than header
    with pytest.raises(ValueError):
        X.rle_decode_frame(frame[:70], 8, 8, 16)  # segment truncated
    bad = bytearray(frame)
    struct.pack_into("<I", bad, 0, 7)  # wrong segment count
    with pytest.raises(ValueError):
        X.rle_decode_frame(bytes(bad), 8, 8, 16)
    bad = bytearray(frame)
    struct.pack_into("<I", bad, 4, len(frame) + 5)  # offset out of range
    with pytest.raises(ValueError):
        X.rle_decode_frame(bytes(bad), 8, 8, 16)


# ----------------------------------------------------- JPEG Lossless SV1

def test_encoder_huffman_table_is_exactly_full():
    kraft = sum(n * 2.0 ** -(i + 1) for i, n in enumerate(X._ENC_COUNTS))
    assert kraft == 1.0
    assert sum(X._ENC_COUNTS) == 17  # all 16-bit diff categories + s=16


def test_jpeg_sv1_golden_tiny():
    """Hand-assembled stream per T.81: 2x2, precision 8, one Huffman code
    (symbol 0, code '0'): four zero diffs from the default prediction
    2^(P-1)=128 -> all samples 128.  Entropy: 0000 + 1111 pad = 0x0F."""
    stream = bytes.fromhex(
        "FFD8"
        "FFC3" "000B" "08" "0002" "0002" "01" "01" "11" "00"
        # DHT len 0x14: tc/th=00, counts L1=1 (rest 0), one symbol: 0
        "FFC4" "0014" "00" "01" + "00" * 15 + "00"
        "FFDA" "0008" "01" "01" "00" "01" "00" "00"
        "0F"
        "FFD9")
    arr, precision = X.jpeg_sv1_decode(stream)
    assert precision == 8
    np.testing.assert_array_equal(arr, np.full((2, 2), 128, np.uint16))


def test_jpeg_sv1_roundtrip_int16_ct():
    rng = np.random.default_rng(4)
    arr = _ct_slice(rng)
    stream = X.jpeg_sv1_encode(arr, precision=16)
    out, precision = X.jpeg_sv1_decode(stream)
    assert precision == 16
    np.testing.assert_array_equal(out.view(np.int16), arr)


def test_jpeg_sv1_roundtrip_uint16_noise():
    # pure noise: exercises every magnitude category incl. the 32768 wrap
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 1 << 16, (33, 29)).astype(np.uint16)
    out, _ = X.jpeg_sv1_decode(X.jpeg_sv1_encode(arr, precision=16))
    np.testing.assert_array_equal(out, arr)


def test_jpeg_sv1_roundtrip_8bit():
    rng = np.random.default_rng(6)
    arr = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    out, precision = X.jpeg_sv1_decode(X.jpeg_sv1_encode(arr, precision=8))
    assert precision == 8
    np.testing.assert_array_equal(out.astype(np.uint8), arr)


def test_jpeg_sv1_byte_stuffing_exercised():
    # all-0xFFFF image forces 0xFF bytes in the entropy stream somewhere
    arr = np.full((8, 8), 0xFFFF, np.uint16)
    stream = X.jpeg_sv1_encode(arr, precision=16)
    out, _ = X.jpeg_sv1_decode(stream)
    np.testing.assert_array_equal(out, arr)


def test_jpeg_sv1_malformed_raises():
    rng = np.random.default_rng(7)
    arr = _ct_slice(rng, 16, 16)
    stream = X.jpeg_sv1_encode(arr, precision=16)
    with pytest.raises(ValueError):
        X.jpeg_sv1_decode(b"\x00\x01garbage")  # no SOI
    with pytest.raises(ValueError):
        X.jpeg_sv1_decode(stream[:20])  # cut inside headers
    # truncated entropy data: samples run short -> pad bits produce an
    # invalid Huffman code or short image; both must raise, not hang
    with pytest.raises(ValueError):
        X.jpeg_sv1_decode(stream[:len(stream) // 2] + b"\xFF\xD9")
    # bad Huffman table: SOS references table 3, only table 0 defined
    # (SOS layout: FFDA len2 Ns Cs Td/Ta ... -> Td/Ta byte at +6)
    bad = bytearray(stream)
    sos = bad.find(b"\xFF\xDA")
    bad[sos + 6] = 0x30
    with pytest.raises(ValueError, match="Huffman table"):
        X.jpeg_sv1_decode(bytes(bad))


def test_jpeg_sv1_rejects_other_processes():
    # SOF0 (baseline DCT) must be rejected as not-lossless
    stream = bytearray(X.jpeg_sv1_encode(np.zeros((4, 4), np.uint16)))
    stream[stream.find(b"\xFF\xC3") + 1] = 0xC0
    with pytest.raises(ValueError, match="SOF0"):
        X.jpeg_sv1_decode(bytes(stream))


# --------------------- general process 14 (predictors 2-7, syntax .4.57)

@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_jpeg_p14_roundtrip_all_predictors(predictor):
    """Every T.81 Table H.1 predictor round-trips bit-exactly on CT-like
    content (the general .4.57 syntax allows all seven; pylibjpeg decodes
    them for the reference).  The native SV1 decoder declines Ss != 1 and
    the Python path takes over transparently."""
    rng = np.random.default_rng(40 + predictor)
    arr = _ct_slice(rng, 24, 40)
    stream = X.jpeg_sv1_encode(arr, precision=16, predictor=predictor)
    # the SOS Ss byte really carries the predictor
    sos = stream.find(b"\xFF\xDA")
    assert stream[sos + 2 + 2 + 1 + 2 * 1] == predictor
    out, precision = X.jpeg_sv1_decode(stream)
    assert precision == 16
    np.testing.assert_array_equal(out.view(np.int16), arr)
    # forced pure-Python path agrees (native declined or not)
    out2, _ = X.jpeg_sv1_decode(stream, native=False)
    np.testing.assert_array_equal(out2, out)


@pytest.mark.parametrize("predictor", [2, 4, 5, 6, 7])
def test_jpeg_p14_roundtrip_noise(predictor):
    # pure noise exercises every magnitude category and the signed >>1
    # floor behaviour of predictors 5-7 on negative (Rb-Rc)/(Ra-Rc)
    rng = np.random.default_rng(50 + predictor)
    arr = rng.integers(0, 1 << 16, (17, 23)).astype(np.uint16)
    stream = X.jpeg_sv1_encode(arr, precision=16, predictor=predictor)
    out, _ = X.jpeg_sv1_decode(stream)
    np.testing.assert_array_equal(out, arr)


def test_jpeg_p14_golden_predictor_2():
    """Hand-checkable predictor-2 (Rb) stream: encode [[100, 101], [103,
    104]] with Ss=2 and verify the diff sequence the encoder must emit —
    first sample default (32768), first line Ra, row start Rb, interior
    Rb."""
    arr = np.array([[100, 101], [103, 104]], np.uint16)
    stream = X.jpeg_sv1_encode(arr, precision=16, predictor=2)
    out, _ = X.jpeg_sv1_decode(stream, native=False)
    np.testing.assert_array_equal(out, arr)
    # interior sample (1,1)=104 must have been predicted from Rb=101
    # (diff 3), not Ra=103 (diff 1): flip the predictor byte to Ss=1 and
    # the same entropy data must decode to a DIFFERENT interior value
    sv1 = bytearray(stream)
    sos = sv1.find(b"\xFF\xDA")
    sv1[sos + 2 + 2 + 1 + 2] = 1
    out_sv1, _ = X.jpeg_sv1_decode(bytes(sv1), native=False)
    assert out_sv1[1, 1] == 103 + 3  # same diff, Ra prediction
    assert out_sv1[0, 0] == 100 and out_sv1[1, 0] == 103  # rest unchanged


def test_jpeg_p14_rejects_selection_0_and_8():
    stream = bytearray(X.jpeg_sv1_encode(np.zeros((4, 4), np.uint16)))
    sos = stream.find(b"\xFF\xDA")
    for bad in (0, 8):
        stream[sos + 2 + 2 + 1 + 2] = bad
        with pytest.raises(ValueError, match="selection value"):
            X.jpeg_sv1_decode(bytes(stream), native=False)
    with pytest.raises(ValueError, match="predictor"):
        X.jpeg_sv1_encode(np.zeros((4, 4), np.uint16), predictor=0)


# ------------------------------------------------- encapsulation framing

def test_encapsulate_parse_roundtrip():
    frags = [b"abcdef", b"x" * 7]  # odd fragment gets padded
    raw = X.encapsulate(frags)
    offsets, out = X.parse_encapsulated(raw)
    assert out[0] == b"abcdef"
    assert out[1][:7] == b"x" * 7 and len(out[1]) == 8
    assert offsets[0] == 0 and offsets[1] == 8 + 6


def test_parse_encapsulated_corrupt():
    with pytest.raises(ValueError):
        X.parse_encapsulated(b"\x00\x00\x00\x00\x00\x00\x00\x00")  # bad tag
    raw = X.encapsulate([b"abcd"])
    with pytest.raises(ValueError):
        X.parse_encapsulated(raw[:10])  # item length past end
    # offset table only, no fragments
    bot_only = struct.pack("<HHI", 0xFFFE, 0xE000, 0)
    with pytest.raises(ValueError):
        X.parse_encapsulated(bot_only)


# ------------------------------------------------------ dataset-level IO

def _write_compressed_file(tmp_path, arr, tsu, name):
    ds = C.new_ct_dataset(*arr.shape, signed=True, instance_number=1)
    ds.set_pixel_array(arr)
    path = os.path.join(str(tmp_path), name)
    C.dcmwrite(path, ds, transfer_syntax=tsu)
    return path


@pytest.mark.parametrize(
    "tsu", [C.RLE_LOSSLESS, C.JPEG_LOSSLESS_SV1, C.JPEG_LOSSLESS_P14])
def test_dcmread_pixel_array_bit_exact(tmp_path, tsu):
    """VERDICT done-criterion: dcmread(...).pixel_array on RLE and
    JPEG-Lossless files matches the uncompressed pixels bit-exactly."""
    rng = np.random.default_rng(8)
    arr = _ct_slice(rng, 32, 48)
    path = _write_compressed_file(tmp_path, arr, tsu, "c.dcm")
    ds = C.dcmread(path)
    assert ds.file_meta.TransferSyntaxUID == tsu
    out = ds.pixel_array
    assert out.dtype == np.int16
    np.testing.assert_array_equal(out, arr)
    # compressed files are actually smaller on this runny content
    ds2 = C.new_ct_dataset(*arr.shape, signed=True)
    ds2.set_pixel_array(arr)
    plain = os.path.join(str(tmp_path), "plain.dcm")
    C.dcmwrite(plain, ds2)
    if tsu == C.RLE_LOSSLESS:
        assert os.path.getsize(path) < os.path.getsize(plain)


def test_dcmread_jpeg_frame_spanning_fragments(tmp_path):
    """PS3.5 A.4 allows one frame to span several fragments; the decoder
    joins them.  Split at even offsets (encapsulate pads odd fragments,
    which mid-stream would corrupt the codestream — the same reason real
    encoders split on even boundaries)."""
    rng = np.random.default_rng(11)
    arr = _ct_slice(rng, 16, 28)
    ds = C.new_ct_dataset(*arr.shape, signed=True, instance_number=1)
    ds.set_pixel_array(arr)
    stream = X.jpeg_sv1_encode(arr.view(np.uint16), precision=16)
    cut = (len(stream) // 3) & ~1
    frags = [stream[:cut], stream[cut:2 * cut], stream[2 * cut:]]
    ds.set_raw((0x7FE0, 0x0010), "OB", X.encapsulate(frags))
    ds.transfer_syntax_uid = C.JPEG_LOSSLESS_SV1
    path = os.path.join(str(tmp_path), "frag.dcm")
    C.dcmwrite(path, ds, transfer_syntax=C.JPEG_LOSSLESS_SV1)
    ds2 = C.dcmread(path)
    np.testing.assert_array_equal(ds2.pixel_array, arr)
    # pass-through kept the 3-fragment framing
    _, out_frags = X.parse_encapsulated(
        ds2.get_element((0x7FE0, 0x0010)).raw)
    assert len(out_frags) == 3


def test_dcmread_p14_nondefault_predictor(tmp_path):
    """A .4.57 file whose codestream uses predictor 6 (legal there, not
    under .4.70) reads bit-exactly — the archive shape a DCMTK-class
    encoder can produce."""
    rng = np.random.default_rng(9)
    arr = _ct_slice(rng, 20, 36)
    ds = C.new_ct_dataset(*arr.shape, signed=True, instance_number=1)
    ds.set_pixel_array(arr)
    frag = X.jpeg_sv1_encode(arr.view(np.uint16), precision=16,
                             predictor=6)
    ds.set_raw((0x7FE0, 0x0010), "OB", X.encapsulate([frag]))
    ds.transfer_syntax_uid = C.JPEG_LOSSLESS_P14
    path = os.path.join(str(tmp_path), "p14.dcm")
    C.dcmwrite(path, ds, transfer_syntax=C.JPEG_LOSSLESS_P14)
    out = C.dcmread(path).pixel_array
    assert out.dtype == np.int16
    np.testing.assert_array_equal(out, arr)


@pytest.mark.parametrize(
    "tsu", [C.RLE_LOSSLESS, C.JPEG_LOSSLESS_SV1, C.JPEG_LOSSLESS_P14])
def test_compressed_file_rewrites_as_explicit_le(tmp_path, tsu):
    """save_as on a compressed read normalizes to Explicit VR LE (the
    reference forces ExplicitVRLittleEndian on rewrite, masking.py)."""
    rng = np.random.default_rng(9)
    arr = _ct_slice(rng, 16, 16)
    path = _write_compressed_file(tmp_path, arr, tsu, "c.dcm")
    ds = C.dcmread(path)
    out_path = os.path.join(str(tmp_path), "out.dcm")
    ds.save_as(out_path)
    ds2 = C.dcmread(out_path)
    assert ds2.file_meta.TransferSyntaxUID == C.EXPLICIT_VR_LE
    np.testing.assert_array_equal(ds2.pixel_array, arr)


def test_lossy_syntaxes_still_rejected(tmp_path):
    """codec.py's NotImplementedError fires only for genuinely
    out-of-scope syntaxes (lossy J2K etc.)."""
    rng = np.random.default_rng(10)
    arr = _ct_slice(rng, 8, 8)
    path = _write_compressed_file(tmp_path, arr, C.JPEG_LOSSLESS_SV1,
                                  "c.dcm")
    data = bytearray(open(path, "rb").read())
    src = C.JPEG_LOSSLESS_SV1.encode()
    idx = data.find(src)
    j2k = b"1.2.840.10008.1.2.4.91"  # JPEG 2000 (lossy) — same length
    assert len(j2k) == len(src)
    data[idx:idx + len(src)] = j2k
    bad = os.path.join(str(tmp_path), "j2k.dcm")
    open(bad, "wb").write(bytes(data))
    with pytest.raises(NotImplementedError, match="lossy"):
        C.dcmread(bad)


def test_native_fallback_reads_compressed(tmp_path):
    """read_slice_any hands compressed files to the Python codec when the
    native parser reports status 2 (unsupported transfer syntax)."""
    from ducosy_tpu.dicom.native import read_slice_any

    rng = np.random.default_rng(11)
    arr = _ct_slice(rng, 16, 16)
    path = _write_compressed_file(tmp_path, arr, C.RLE_LOSSLESS, "c.dcm")
    info = read_slice_any(path, pixels=True)
    np.testing.assert_array_equal(info.pixels, arr)


def test_truncated_compressed_file_clean_error(tmp_path):
    rng = np.random.default_rng(12)
    arr = _ct_slice(rng, 16, 16)
    path = _write_compressed_file(tmp_path, arr, C.RLE_LOSSLESS, "c.dcm")
    data = open(path, "rb").read()
    cut = os.path.join(str(tmp_path), "cut.dcm")
    open(cut, "wb").write(data[:len(data) - len(data) // 3])
    with pytest.raises((ValueError, EOFError)):
        C.dcmread(cut).pixel_array


def test_preprocess_pipeline_reads_compressed(tmp_path):
    """End-to-end: the HU preprocess path is oblivious to the transfer
    syntax (reference parity: preprocess_dicom works on any archive the
    pixel-data handlers can decode, modules/preprocess.py:68-90)."""
    from ducosy_tpu.ops.hu import hu_transform

    rng = np.random.default_rng(13)
    arr = _ct_slice(rng, 32, 32)
    path = _write_compressed_file(tmp_path, arr, C.JPEG_LOSSLESS_SV1,
                                  "c.dcm")
    ds = C.dcmread(path)
    x = hu_transform(ds.pixel_array.astype(np.float32),
                     float(ds.RescaleSlope), float(ds.RescaleIntercept),
                     -150.0, 250.0)
    assert np.isfinite(np.asarray(x)).all()
    assert float(np.min(np.asarray(x))) >= -1.0
    assert float(np.max(np.asarray(x))) <= 1.0


# -------------------------------------------- native JPEG-SV1 fast path

def _native_ready():
    from ducosy_tpu.dicom.native import available, _lib
    if not available():
        return False
    from ducosy_tpu.dicom import native as N
    return hasattr(N._lib, "decode_jpeg_sv1")


@pytest.mark.skipif(not _native_ready(),
                    reason="native library not built with decode_jpeg_sv1")
def test_native_jpeg_parity_with_python():
    rng = np.random.default_rng(20)
    for arr in (_ct_slice(rng, 48, 64),
                rng.integers(0, 1 << 16, (17, 31)).astype(np.uint16),
                np.full((8, 8), 0xFFFF, np.uint16)):
        stream = X.jpeg_sv1_encode(
            arr if arr.dtype != np.int16 else arr, precision=16)
        py, p_prec = X.jpeg_sv1_decode(stream, native=False)
        nat, n_prec = X.jpeg_sv1_decode(stream, native=True)
        assert p_prec == n_prec
        np.testing.assert_array_equal(nat, py)


@pytest.mark.skipif(not _native_ready(),
                    reason="native library not built with decode_jpeg_sv1")
def test_native_jpeg_malformed_falls_back_to_python_errors():
    rng = np.random.default_rng(21)
    stream = X.jpeg_sv1_encode(_ct_slice(rng, 16, 16), precision=16)
    # the native path declines malformed input; the Python path raises
    # its detailed ValueError — the public function behaves identically
    # with native on or off
    for bad in (b"\x00\x01garbage", stream[:20],
                stream[:len(stream) // 2] + b"\xFF\xD9"):
        with pytest.raises(ValueError):
            X.jpeg_sv1_decode(bad, native=True)
        with pytest.raises(ValueError):
            X.jpeg_sv1_decode(bad, native=False)


def test_jpeg_sv1_restart_markers_both_paths():
    """Hand-built stream with DRI=4 and one RST0: 2x4 image, single
    1-bit Huffman code (all diffs 0), so every sample equals the default
    prediction 128 — including the post-restart reset (T.81 G: prediction
    reset at restart)."""
    stream = bytes.fromhex(
        "FFD8"
        "FFC3" "000B" "08" "0002" "0004" "01" "01" "11" "00"
        "FFC4" "0014" "00" "01" + "00" * 15 + "00"
        "FFDD" "0004" "0004"  # DRI: restart interval 4
        "FFDA" "0008" "01" "01" "00" "01" "00" "00"
        "0F"    # 4 zero-code bits + 1111 pad
        "FFD0"  # RST0
        "0F"    # second interval
        "FFD9")
    py, prec = X.jpeg_sv1_decode(stream, native=False)
    assert prec == 8
    np.testing.assert_array_equal(py, np.full((2, 4), 128, np.uint16))
    if _native_ready():
        nat, _ = X.jpeg_sv1_decode(stream, native=True)
        np.testing.assert_array_equal(nat, py)
