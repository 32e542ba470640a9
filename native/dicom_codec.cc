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

// ---------------------------------------------------------------------------
// JPEG Lossless (ITU-T T.81 process 14, selection values 1-7) decoder —
// the native fast path behind ducosy_tpu/dicom/compressed.jpeg_sv1_decode
// (the pure-Python decoder is ~600 ms per 512^2 slice; this is ~milliseconds,
// which keeps compressed CT archives loader-bound friendly). Semantics are
// kept bit-identical to the Python reference implementation, including the
// truncation rule: consuming a synthetic pad bit (inserted at a marker /
// end-of-data) is an error, since a conforming scan never reads its own
// byte-boundary padding.

struct JBitReader {
  const uint8_t* d;
  size_t len;
  size_t pos;
  uint64_t acc = 0;
  int nbits = 0;
  int pad_bits = 0;
  int marker = -1;  // -1 = none pending

  void fill() {
    while (nbits <= 48) {
      if (marker >= 0 || pos >= len) {
        acc = (acc << 8) | 0xFF;
        nbits += 8;
        pad_bits += 8;
        continue;
      }
      uint8_t b = d[pos];
      if (b == 0xFF) {
        if (pos + 1 >= len) { marker = 0xFFFF; continue; }  // cut marker
        uint8_t m = d[pos + 1];
        if (m == 0x00) {  // stuffed data byte
          pos += 2;
          acc = (acc << 8) | 0xFF;
          nbits += 8;
          continue;
        }
        marker = 0xFF00 | m;  // leave pos at the 0xFF
        continue;
      }
      ++pos;
      acc = (acc << 8) | b;
      nbits += 8;
    }
  }

  // returns -1 on pad-bit consumption (truncated scan)
  int read(int n) {
    if (n == 0) return 0;
    if (nbits < n) fill();
    nbits -= n;
    int v = static_cast<int>((acc >> nbits) & ((1u << n) - 1));
    acc &= (nbits >= 64) ? ~0ull : ((1ull << nbits) - 1);
    if (nbits < pad_bits) return -1;
    return v;
  }

  // byte-align at a restart: drop buffered bits, scan to the next marker
  int seek_marker() {
    acc = 0;
    nbits = 0;
    pad_bits = 0;
    marker = -1;
    while (pos + 1 < len) {
      if (d[pos] == 0xFF && d[pos + 1] != 0x00) {
        marker = 0xFF00 | d[pos + 1];
        return marker;
      }
      ++pos;
    }
    return -1;
  }
};

// canonical Huffman (T.81 C.2 / F.16): mincode/maxcode/valptr per length
struct JHuffTable {
  int32_t mincode[17];
  int32_t maxcode[17];  // -1 when no codes of that length
  int32_t valptr[17];
  uint8_t values[256];
  bool present = false;

  void build(const uint8_t* counts, const uint8_t* symbols, int nsym) {
    int code = 0, k = 0;
    for (int l = 1; l <= 16; ++l) {
      valptr[l] = k;
      mincode[l] = code;
      for (int i = 0; i < counts[l - 1] && k < nsym && k < 256; ++i) {
        values[k] = symbols[k];
        ++k;
      }
      code += counts[l - 1];
      maxcode[l] = counts[l - 1] ? code - 1 : -1;
      code <<= 1;
    }
    present = true;
  }
};

// decode one Huffman symbol; -1 on invalid code / truncation
inline int jhuff_decode(JBitReader& br, const JHuffTable& t) {
  int code = 0;
  for (int l = 1; l <= 16; ++l) {
    int bit = br.read(1);
    if (bit < 0) return -1;
    code = (code << 1) | bit;
    if (t.maxcode[l] >= 0 && code <= t.maxcode[l] && code >= t.mincode[l])
      return t.values[t.valptr[l] + (code - t.mincode[l])];
  }
  return -1;
}

inline int jextend(int v, int s) {
  return (v < (1 << (s - 1))) ? v - (1 << s) + 1 : v;
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

// JPEG Lossless (T.81 process 14) decode, any Table H.1 predictor
// (selection values 1-7; covers DICOM .4.70 SV1 and the general .4.57
// syntax). Returns 0 ok; 1 malformed/truncated; 3 unsupported JPEG
// feature (other SOF process, multi-component, selection value 0/8+).
// out must hold rows*cols uint16s (capacity checked against the SOF3
// geometry).
int decode_jpeg_sv1(const uint8_t* data, uint64_t len, uint16_t* out,
                    uint64_t out_capacity, int32_t* rows_out,
                    int32_t* cols_out, int32_t* precision_out) {
  if (len < 4 || data[0] != 0xFF || data[1] != 0xD8) return 1;
  size_t pos = 2;
  int precision = -1, rows = 0, cols = 0;
  JHuffTable tables[4];
  int restart_interval = 0;
  int table_id = -1, al = 0, sel = 1;
  size_t entropy_start = 0;
  bool have_scan = false;
  while (pos + 4 <= len) {
    if (data[pos] != 0xFF) return 1;
    while (pos + 1 < len && data[pos + 1] == 0xFF) ++pos;  // fill bytes
    int marker = data[pos + 1];
    pos += 2;
    if (marker == 0xD9) break;  // EOI before any scan
    if (pos + 2 > len) return 1;
    size_t seg_len = (static_cast<size_t>(data[pos]) << 8) | data[pos + 1];
    if (seg_len < 2 || pos + seg_len > len) return 1;
    const uint8_t* seg = data + pos + 2;
    size_t seg_n = seg_len - 2;
    if (marker == 0xC3) {  // SOF3
      if (seg_n < 6) return 1;
      precision = seg[0];
      rows = (seg[1] << 8) | seg[2];
      cols = (seg[3] << 8) | seg[4];
      if (seg[5] != 1) return 3;  // multi-component
      if (precision < 2 || precision > 16 || rows <= 0 || cols <= 0)
        return 1;
    } else if ((marker >= 0xC0 && marker <= 0xCF) && marker != 0xC4 &&
               marker != 0xC8 && marker != 0xCC) {
      return 3;  // some other SOF process — not lossless process 14
    } else if (marker == 0xC4) {  // DHT
      size_t o = 0;
      while (o < seg_n) {
        if (o + 17 > seg_n) return 1;
        uint8_t tc_th = seg[o];
        int nsym = 0;
        for (int i = 0; i < 16; ++i) nsym += seg[o + 1 + i];
        if (o + 17 + nsym > seg_n || nsym > 256) return 1;
        if ((tc_th >> 4) == 0)  // DC-class: the lossless tables
          tables[tc_th & 0x03].build(seg + o + 1, seg + o + 17, nsym);
        o += 17 + nsym;
      }
    } else if (marker == 0xDD) {  // DRI
      if (seg_n < 2) return 1;
      restart_interval = (seg[0] << 8) | seg[1];
    } else if (marker == 0xDA) {  // SOS
      if (seg_n < 4) return 1;
      int ns = seg[0];
      if (ns != 1) return 3;
      if (seg_n < static_cast<size_t>(1 + 2 * ns + 3)) return 1;
      table_id = seg[2] >> 4;
      sel = seg[1 + 2 * ns];
      al = seg[3 + 2 * ns] & 0x0F;
      if (sel < 1 || sel > 7) return 3;  // hierarchical (0) / reserved
      entropy_start = pos + seg_len;
      have_scan = true;
      break;
    }
    pos += seg_len;
  }
  if (precision < 0 || !have_scan) return 1;
  if (table_id < 0 || table_id > 3 || !tables[table_id].present) return 1;
  uint64_t n = static_cast<uint64_t>(rows) * cols;
  if (n > out_capacity) return 1;
  *rows_out = rows;
  *cols_out = cols;
  *precision_out = precision;

  const JHuffTable& t = tables[table_id];
  JBitReader br{data, static_cast<size_t>(len), entropy_start};
  int def = 1 << (precision - 1 - al);
  int remaining = restart_interval ? restart_interval : -1;
  bool reset = true;  // start-of-scan behaves like a restart
  int first_line_row = 0;  // interval's first line uses Ra (T.81 H.2.2)
  uint64_t idx = 0;
  for (int r = 0; r < rows; ++r) {
    for (int c = 0; c < cols; ++c) {
      if (remaining == 0) {
        int m = br.seek_marker();
        br.marker = -1;
        if (m < 0xFFD0 || m > 0xFFD7) return 1;
        br.pos += 2;
        remaining = restart_interval;
        reset = true;
      }
      int s = jhuff_decode(br, t);
      if (s < 0 || s > 16) return 1;
      int diff;
      if (s == 16) {
        diff = 32768;  // category 16: no magnitude bits
      } else if (s) {
        int v = br.read(s);
        if (v < 0) return 1;
        diff = jextend(v, s);
      } else {
        diff = 0;
      }
      int pred;
      if (reset) {
        pred = def;
        reset = false;
        first_line_row = r;
      } else if (c == 0) {
        pred = out[idx - cols];  // Rb: first sample of the row
      } else if (r == first_line_row || sel == 1) {
        pred = out[idx - 1];  // Ra (predictor 1; mandated on first line)
      } else {
        int ra = out[idx - 1];
        int rb = out[idx - cols];
        int rc = out[idx - cols - 1];
        switch (sel) {
          case 2: pred = rb; break;
          case 3: pred = rc; break;
          case 4: pred = ra + rb - rc; break;
          case 5: pred = ra + ((rb - rc) >> 1); break;
          case 6: pred = rb + ((ra - rc) >> 1); break;
          default: pred = (ra + rb) >> 1; break;  // sel == 7
        }
      }
      out[idx++] = static_cast<uint16_t>((pred + diff) & 0xFFFF);
      if (remaining > 0) --remaining;
    }
  }
  if (al)
    for (uint64_t i = 0; i < n; ++i)
      out[i] = static_cast<uint16_t>(out[i] << al);
  return 0;
}

}  // extern "C"
