// Fast DICOM slice parser — the native data-loader core.
//
// The training input pipeline decodes two DICOM files per sample
// (reference modules/dataset.py:109-120, hidden behind 16 DataLoader
// workers). This parser does a single forward walk over the byte stream,
// extracting exactly the fields the CT pipeline needs plus the pixel-data
// extent, with no allocation and no Python object churn; Python binds it
// via ctypes (ducosy_tpu/dicom/native.py) and wraps the pixel bytes in a
// zero-copy numpy array.
//
// Scope mirrors ducosy_tpu/dicom/codec.py: Part-10 files (preamble+DICM) or
// headerless streams, Implicit/Explicit VR little endian; compressed
// transfer syntaxes are rejected (status 2). Undefined-length sequences are
// skipped item-by-item.
//
// Build: make -C native   (produces ducosy_tpu/dicom/_dicom_native.so)

#include <cstdint>
#include <cstring>
#include <cstdlib>

namespace {

struct Cursor {
  const uint8_t* p;
  size_t len;
  size_t off;

  bool ok(size_t n) const { return off + n <= len; }
  uint16_t u16() {
    uint16_t v;
    std::memcpy(&v, p + off, 2);
    off += 2;
    return v;
  }
  uint32_t u32() {
    uint32_t v;
    std::memcpy(&v, p + off, 4);
    off += 4;
    return v;
  }
};

constexpr uint32_t kUndefined = 0xFFFFFFFFu;

bool is_long_vr(const char* vr) {
  // 12-byte explicit-form VRs, PS3.5 Table 7.1-1 (incl. 2019's SV/UV)
  static const char* kLong[] = {"OB", "OW", "OF", "OD", "OL", "OV",
                                "SQ", "SV", "UC", "UN", "UR", "UT", "UV"};
  for (const char* s : kLong)
    if (vr[0] == s[0] && vr[1] == s[1]) return true;
  return false;
}

// every VR code of PS3.5 §6.2 — explicit-VR parsing rejects anything else
// (matches the Python codec's validation: garbage bytes must not parse as
// empty elements, regardless of which parser a build uses)
bool is_valid_vr(const char* vr) {
  static const char* kAll[] = {
      "AE", "AS", "AT", "CS", "DA", "DS", "DT", "FL", "FD", "IS", "LO",
      "LT", "OB", "OD", "OF", "OL", "OV", "OW", "PN", "SH", "SL", "SQ",
      "SS", "ST", "SV", "TM", "UC", "UI", "UL", "UN", "UR", "US", "UT",
      "UV"};
  for (const char* s : kAll)
    if (vr[0] == s[0] && vr[1] == s[1]) return true;
  return false;
}

double parse_ds(const uint8_t* v, uint32_t n) {
  // first backslash-separated decimal string
  char buf[24];
  uint32_t m = 0;
  for (uint32_t i = 0; i < n && m < 23; ++i) {
    char c = static_cast<char>(v[i]);
    if (c == '\\') break;
    if (c == '\0' || c == ' ') continue;
    buf[m++] = c;
  }
  buf[m] = '\0';
  return m ? strtod(buf, nullptr) : 0.0;
}

double parse_ds_at(const uint8_t* v, uint32_t n, int index) {
  // index-th backslash-separated decimal value
  uint32_t start = 0;
  int cur = 0;
  for (uint32_t i = 0; i <= n; ++i) {
    if (i == n || v[i] == '\\') {
      if (cur == index) return parse_ds(v + start, i - start);
      ++cur;
      start = i + 1;
    }
  }
  return 0.0;
}

long parse_is(const uint8_t* v, uint32_t n) {
  char buf[24];
  uint32_t m = 0;
  bool neg = false;
  for (uint32_t i = 0; i < n && m < 23; ++i) {
    char c = static_cast<char>(v[i]);
    if (c == '\\') break;
    if (c == '-') neg = true;
    if (c >= '0' && c <= '9') buf[m++] = c;
  }
  buf[m] = '\0';
  long val = m ? strtol(buf, nullptr, 10) : 0;
  return neg ? -val : val;
}

// skip an undefined-length sequence value; returns false on truncation
bool skip_sequence(Cursor& c) {
  for (;;) {
    if (!c.ok(8)) return false;
    uint16_t group = c.u16();
    uint16_t elem = c.u16();
    uint32_t length = c.u32();
    if (group == 0xFFFE && elem == 0xE0DD) return true;  // seq delimiter
    if (group == 0xFFFE && elem == 0xE000 && length == kUndefined) {
      for (;;) {  // undefined-length item
        if (!c.ok(8)) return false;
        uint16_t ig = c.u16();
        uint16_t ie = c.u16();
        uint32_t il = c.u32();
        if (ig == 0xFFFE && ie == 0xE00D) break;  // item delimiter
        if (il == kUndefined) return false;       // nested undefined: bail
        if (!c.ok(il)) return false;
        c.off += il;
      }
    } else {
      if (length == kUndefined || !c.ok(length)) return false;
      c.off += length;
    }
  }
}

}  // namespace

extern "C" {

// All outputs little-endian host values. Returns:
//   0 ok, 1 malformed/truncated, 2 unsupported transfer syntax
struct SliceMeta {
  int32_t rows;
  int32_t cols;
  int32_t bits_allocated;
  int32_t pixel_representation;
  int32_t instance_number;
  int32_t has_pixels;
  double rescale_slope;
  double rescale_intercept;
  double slice_location;
  double ipp_z;  // ImagePositionPatient[2]
  uint64_t pixel_offset;
  uint64_t pixel_length;
};

int parse_slice(const uint8_t* buf, uint64_t len, SliceMeta* out) {
  std::memset(out, 0, sizeof(*out));
  out->rescale_slope = 1.0;
  out->bits_allocated = 16;

  Cursor c{buf, static_cast<size_t>(len), 0};
  bool explicit_vr = true;

  if (len >= 132 && std::memcmp(buf + 128, "DICM", 4) == 0) {
    c.off = 132;
    // file meta group: explicit VR LE
    while (c.ok(8)) {
      size_t start = c.off;
      uint16_t group = c.u16();
      if (group != 0x0002) {
        c.off = start;
        break;
      }
      c.u16();  // element
      char vr[2] = {static_cast<char>(buf[c.off]),
                    static_cast<char>(buf[c.off + 1])};
      c.off += 2;
      if (!is_valid_vr(vr)) return 1;
      uint32_t vlen;
      if (is_long_vr(vr)) {
        c.off += 2;
        if (!c.ok(4)) return 1;
        vlen = c.u32();
      } else {
        if (!c.ok(2)) return 1;
        vlen = c.u16();
      }
      if (!c.ok(vlen)) return 1;
      uint16_t elem;
      std::memcpy(&elem, buf + start + 2, 2);
      if (elem == 0x0010) {  // TransferSyntaxUID
        const char* ts = reinterpret_cast<const char*>(buf + c.off);
        uint32_t n = vlen;
        while (n && (ts[n - 1] == '\0' || ts[n - 1] == ' ')) --n;
        if (n == 17 && std::memcmp(ts, "1.2.840.10008.1.2", 17) == 0) {
          explicit_vr = false;
        } else if (n == 19 &&
                   std::memcmp(ts, "1.2.840.10008.1.2.1", 19) == 0) {
          explicit_vr = true;
        } else {
          return 2;  // compressed / unsupported
        }
      }
      c.off += vlen;
    }
  }

  while (c.ok(8)) {
    uint16_t group = c.u16();
    uint16_t elem = c.u16();
    char vr[2] = {0, 0};
    uint32_t vlen;
    if (explicit_vr) {
      vr[0] = static_cast<char>(buf[c.off]);
      vr[1] = static_cast<char>(buf[c.off + 1]);
      c.off += 2;
      if (!is_valid_vr(vr)) return 1;  // garbage, not an explicit-VR stream
      if (is_long_vr(vr)) {
        c.off += 2;
        if (!c.ok(4)) return 1;
        vlen = c.u32();
      } else {
        if (!c.ok(2)) return 1;
        vlen = c.u16();
      }
    } else {
      vlen = c.u32();
    }

    bool is_sq = explicit_vr ? (vr[0] == 'S' && vr[1] == 'Q')
                             : (vlen == kUndefined);
    if (vlen == kUndefined) {
      if (!skip_sequence(c)) return 1;
      continue;
    }
    if (!c.ok(vlen)) return 1;
    const uint8_t* v = buf + c.off;

    if (group == 0x0028) {
      switch (elem) {
        case 0x0010: out->rows = *reinterpret_cast<const uint16_t*>(v); break;
        case 0x0011: out->cols = *reinterpret_cast<const uint16_t*>(v); break;
        case 0x0100:
          out->bits_allocated = *reinterpret_cast<const uint16_t*>(v);
          break;
        case 0x0103:
          out->pixel_representation = *reinterpret_cast<const uint16_t*>(v);
          break;
        case 0x1052: out->rescale_intercept = parse_ds(v, vlen); break;
        case 0x1053: out->rescale_slope = parse_ds(v, vlen); break;
        default: break;
      }
    } else if (group == 0x0020) {
      if (elem == 0x0013) {
        out->instance_number = static_cast<int32_t>(parse_is(v, vlen));
      } else if (elem == 0x1041) {
        out->slice_location = parse_ds(v, vlen);
      } else if (elem == 0x0032) {
        out->ipp_z = parse_ds_at(v, vlen, 2);
      }
    } else if (group == 0x7FE0 && elem == 0x0010) {
      out->pixel_offset = c.off;
      out->pixel_length = vlen;
      out->has_pixels = 1;
      return 0;  // pixel data is last in CT exports; stop here
    }
    (void)is_sq;
    c.off += vlen;
  }
  return 0;
}

}  // extern "C"
