// rpf_native: C++ host-side runtime for rawphotoforge_tpu.
//
// The reference's host runtime is native Rust (PCHIP LUT expansion
// rust/photo-editor/src/interpolation.rs:11-123, CPU pyramid resize
// web/main.ts:958-1026, u8<->f32 sRGB conversion image.rs:375-383 and
// histogramming raw_photo_forge.py:1849-1862 via cv2). These are their
// C++ equivalents for the TPU framework's host path: curve expansion on
// slider moves, CPU-side image marshalling, and fallbacks when no device
// is attached. TPU-side equivalents live in ops/; these exist so the host
// runtime is native too, not a Python stand-in.
//
// Build: make -C rawphotoforge_tpu/native    (produces librpf_native.so)
// ABI: plain C, ctypes-friendly. All functions return 0 on success.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// PCHIP -> LUT expansion (f32 internals; harmonic-mean slopes; clamped
// extrapolation; truncate-toward-zero i32 cast — the exact semantics of the
// reference's curve setters).
// ---------------------------------------------------------------------------

// Error codes.
enum {
  RPF_OK = 0,
  RPF_ERR_ARGS = 1,
  RPF_ERR_NOT_INCREASING = 2,
};

int rpf_pchip_build_lut(const int32_t* xs, const int32_t* ys, int n,
                        int32_t lo, int32_t hi, int lut_size, int32_t* out) {
  if (n < 2 || lut_size <= 0 || !xs || !ys || !out) return RPF_ERR_ARGS;

  // f32 working copies (match the reference's f32 internals).
  float* x = new float[n];
  float* y = new float[n];
  float* h = new float[n - 1];
  float* del = new float[n - 1];
  float* slope = new float[n];
  for (int i = 0; i < n; ++i) {
    x[i] = static_cast<float>(xs[i]);
    y[i] = static_cast<float>(ys[i]);
  }
  for (int i = 0; i < n - 1; ++i) {
    h[i] = x[i + 1] - x[i];
    if (h[i] <= 0.0f) {
      delete[] x; delete[] y; delete[] h; delete[] del; delete[] slope;
      return RPF_ERR_NOT_INCREASING;
    }
    del[i] = (y[i + 1] - y[i]) / h[i];
  }
  slope[0] = del[0];
  slope[n - 1] = del[n - 2];
  for (int i = 1; i < n - 1; ++i) {
    if (del[i - 1] * del[i] <= 0.0f) {
      slope[i] = 0.0f;
    } else {
      float w1 = 2.0f * h[i] + h[i - 1];
      float w2 = h[i] + 2.0f * h[i - 1];
      slope[i] = (w1 + w2) / (w1 / del[i - 1] + w2 / del[i]);
    }
  }

#pragma omp parallel for schedule(static)
  for (int k = 0; k < lut_size; ++k) {
    float xv = static_cast<float>(k);
    float val;
    if (xv <= x[0]) {
      val = y[0];
    } else if (xv >= x[n - 1]) {
      val = y[n - 1];
    } else {
      // Binary search: largest i with x[i] <= xv.
      int loi = 0, hii = n - 1;
      while (hii - loi > 1) {
        int mid = (loi + hii) >> 1;
        if (x[mid] <= xv) loi = mid; else hii = mid;
      }
      int i = std::min(loi, n - 2);
      float hv = h[i];
      float t = (xv - x[i]) / hv;
      float t2 = t * t;
      float t3 = t2 * t;
      float h00 = 2.0f * t3 - 3.0f * t2 + 1.0f;
      float h10 = t3 - 2.0f * t2 + t;
      float h01 = -2.0f * t3 + 3.0f * t2;
      float h11 = t3 - t2;
      val = h00 * y[i] + h10 * hv * slope[i] + h01 * y[i + 1] +
            h11 * hv * slope[i + 1];
    }
    // Truncate toward zero (Rust `as i32`), then clamp.
    int32_t iv = static_cast<int32_t>(val);
    out[k] = std::min(std::max(iv, lo), hi);
  }

  delete[] x; delete[] y; delete[] h; delete[] del; delete[] slope;
  return RPF_OK;
}

// ---------------------------------------------------------------------------
// Bilinear resize, HWC float32, half-texel-centered, edge-clamped — the
// preview-pyramid resampler semantics.
// ---------------------------------------------------------------------------

int rpf_resize_bilinear_f32(const float* src, int sh, int sw, int ch,
                            float* dst, int dh, int dw) {
  if (!src || !dst || sh <= 0 || sw <= 0 || dh <= 0 || dw <= 0 || ch <= 0)
    return RPF_ERR_ARGS;
  const float scale_y = static_cast<float>(sh) / dh;
  const float scale_x = static_cast<float>(sw) / dw;

#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    float sy = (y + 0.5f) * scale_y - 0.5f;
    int y0 = std::max(static_cast<int>(std::floor(sy)), 0);
    int y1 = std::min(y0 + 1, sh - 1);
    float ty = sy - y0;
    for (int x = 0; x < dw; ++x) {
      float sx = (x + 0.5f) * scale_x - 0.5f;
      int x0 = std::max(static_cast<int>(std::floor(sx)), 0);
      int x1 = std::min(x0 + 1, sw - 1);
      float tx = sx - x0;
      const float* r0a = src + (static_cast<size_t>(y0) * sw + x0) * ch;
      const float* r0b = src + (static_cast<size_t>(y0) * sw + x1) * ch;
      const float* r1a = src + (static_cast<size_t>(y1) * sw + x0) * ch;
      const float* r1b = src + (static_cast<size_t>(y1) * sw + x1) * ch;
      float* d = dst + (static_cast<size_t>(y) * dw + x) * ch;
      for (int c = 0; c < ch; ++c) {
        float top = r0a[c] * (1.0f - tx) + r0b[c] * tx;
        float bot = r1a[c] * (1.0f - tx) + r1b[c] * tx;
        d[c] = top * (1.0f - ty) + bot * ty;
      }
    }
  }
  return RPF_OK;
}

// ---------------------------------------------------------------------------
// sRGB u8 <-> linear f32 (EOTF per wgpu_shader.wgsl:85-103; decode via a
// 256-entry table, encode truncating like image.rs:375-383).
// ---------------------------------------------------------------------------

static float srgb_decode_table[256];
static bool srgb_table_init = false;

static void init_srgb_table() {
  if (srgb_table_init) return;
  for (int i = 0; i < 256; ++i) {
    float c = i / 255.0f;
    srgb_decode_table[i] =
        (c <= 0.04045f) ? c / 12.92f : std::pow((c + 0.055f) / 1.055f, 2.4f);
  }
  srgb_table_init = true;
}

int rpf_srgb_u8_to_linear_f32(const uint8_t* src, float* dst, int64_t n) {
  if (!src || !dst || n < 0) return RPF_ERR_ARGS;
  init_srgb_table();
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) dst[i] = srgb_decode_table[src[i]];
  return RPF_OK;
}

int rpf_linear_f32_to_srgb_u8(const float* src, uint8_t* dst, int64_t n) {
  if (!src || !dst || n < 0) return RPF_ERR_ARGS;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    float c = src[i];
    float s = (c <= 0.0031308f)
                  ? c * 12.92f
                  : 1.055f * std::pow(std::max(c, 0.0f), 1.0f / 2.4f) - 0.055f;
    s = std::min(std::max(s, 0.0f), 1.0f);
    dst[i] = static_cast<uint8_t>(s * 255.0f);  // truncating, as reference
  }
  return RPF_OK;
}

// ---------------------------------------------------------------------------
// 256-bin RGB + gray histogram of an sRGB-encoded f32 HWC image
// (BT.601 gray weights — the reference feeds cv2 RGB2GRAY on the preview).
// ---------------------------------------------------------------------------

int rpf_histogram_rgbl_f32(const float* hwc, int h, int w, int32_t* out4x256) {
  if (!hwc || !out4x256 || h <= 0 || w <= 0) return RPF_ERR_ARGS;
  std::memset(out4x256, 0, sizeof(int32_t) * 4 * 256);
  const int64_t n = static_cast<int64_t>(h) * w;

#if defined(_OPENMP)
  int nthreads = omp_get_max_threads();
#else
  int nthreads = 1;
#endif
  // Per-thread local bins, merged at the end (avoids atomics).
  int32_t* locals = new int32_t[static_cast<size_t>(nthreads) * 4 * 256]();

#pragma omp parallel
  {
#if defined(_OPENMP)
    int tid = omp_get_thread_num();
#else
    int tid = 0;
#endif
    int32_t* bins = locals + static_cast<size_t>(tid) * 4 * 256;
#pragma omp for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
      const float* px = hwc + i * 3;
      float r = px[0], g = px[1], b = px[2];
      float gray = 0.299f * r + 0.587f * g + 0.114f * b;
      int ri = std::min(std::max(static_cast<int>(r * 255.0f), 0), 255);
      int gi = std::min(std::max(static_cast<int>(g * 255.0f), 0), 255);
      int bi = std::min(std::max(static_cast<int>(b * 255.0f), 0), 255);
      int yi = std::min(std::max(static_cast<int>(gray * 255.0f), 0), 255);
      bins[0 * 256 + ri]++;
      bins[1 * 256 + gi]++;
      bins[2 * 256 + bi]++;
      bins[3 * 256 + yi]++;
    }
  }
  for (int t = 0; t < nthreads; ++t)
    for (int k = 0; k < 4 * 256; ++k)
      out4x256[k] += locals[static_cast<size_t>(t) * 4 * 256 + k];
  delete[] locals;
  return RPF_OK;
}

// ---------------------------------------------------------------------------
// Lossless-JPEG (ITU-T.81 process 14) scan decoding — the per-sample
// Huffman hot loop behind io/ljpeg.py. One call decodes one restart
// segment (already 0xFF00-unstuffed by the Python layer) into the shared
// output plane; prediction state resets at segment entry per T.81 F.2.1.3.
// Semantics oracle: io/ljpeg._decode_scan_py (tested equal).
// ---------------------------------------------------------------------------

enum {
  RPF_ERR_BAD_HUFF = 3,
  RPF_ERR_TRUNCATED = 4,
};

namespace {

struct LjBitReader {
  const uint8_t* p;
  int64_t n;        // total bytes
  int64_t byte;     // next byte to load
  uint64_t cache;   // MSB-aligned bit cache
  int ncached;

  void fill() {
    if (byte + 8 <= n) {
      // Bulk refill: top up to a whole number of bytes from one load.
      uint64_t v;
      std::memcpy(&v, p + byte, 8);
#if defined(__GNUC__) || defined(__clang__)
      v = __builtin_bswap64(v);
#else
      v = ((v & 0xFFULL) << 56) | ((v & 0xFF00ULL) << 40) |
          ((v & 0xFF0000ULL) << 24) | ((v & 0xFF000000ULL) << 8) |
          ((v >> 8) & 0xFF000000ULL) | ((v >> 24) & 0xFF0000ULL) |
          ((v >> 40) & 0xFF00ULL) | (v >> 56);
#endif
      int k = (64 - ncached) >> 3;
      if (k) {
        uint64_t masked = (k >= 8) ? v : (v & (~0ULL << (64 - 8 * k)));
        cache |= masked >> ncached;
        byte += k;
        ncached += 8 * k;
      }
      return;
    }
    while (ncached <= 48) {
      uint64_t b = (byte < n) ? p[byte] : 0;  // zero-pad past end
      ++byte;
      cache |= b << (56 - ncached);
      ncached += 8;
    }
  }
  inline uint32_t peek16() {
    if (ncached < 16) fill();
    return static_cast<uint32_t>(cache >> 48);
  }
  inline void skip(int k) {
    cache <<= k;
    ncached -= k;
  }
  inline uint32_t get(int k) {
    if (k == 0) return 0;
    if (ncached < k) fill();
    uint32_t v = static_cast<uint32_t>(cache >> (64 - k));
    cache <<= k;
    ncached -= k;
    return v;
  }
};

}  // namespace

int rpf_ljpeg_decode_scan(
    const uint8_t* seg, int64_t seg_bytes,
    uint16_t* out,                 // [rows, mcus_per_row * ncomp]
    int rows, int mcus_per_row, int ncomp,
    const uint8_t* lut_sym,        // [ntab << 16] peek-16 symbol LUT
    const uint8_t* lut_len,        // [ntab << 16] peek-16 code lengths
    const uint8_t* comp_tab,       // [ncomp]
    int ntab,
    int predictor, int precision, int pt,
    int64_t mcu_start, int64_t mcu_count) {
  // The Huffman LUTs are built once per frame by the Python layer
  // (io/ljpeg._build_huffman_lut) and shared across restart segments.
  if (!seg || !out || !lut_sym || !lut_len || !comp_tab || rows <= 0 ||
      mcus_per_row <= 0 || ncomp <= 0 || ncomp > 4 || ntab <= 0 ||
      predictor < 1 || predictor > 7)
    return RPF_ERR_ARGS;

  LjBitReader br{seg, seg_bytes, 0, 0, 0};
  const int stride = mcus_per_row * ncomp;
  const int32_t dflt = 1 << (precision - pt - 1);
  bool seg_first[4] = {true, true, true, true};
  // T.81 H.1.2.1: the interval's first line predicts with 1-D Ra.
  const int first_row = static_cast<int>(mcu_start / mcus_per_row);
  int rc = RPF_OK;

  for (int64_t idx = mcu_start; idx < mcu_start + mcu_count; ++idx) {
    int row = static_cast<int>(idx / mcus_per_row);
    int col = static_cast<int>(idx % mcus_per_row);
    uint16_t* orow = out + static_cast<size_t>(row) * stride;
    for (int c = 0; c < ncomp; ++c) {
      const size_t toff = static_cast<size_t>(comp_tab[c]) << 16;
      uint32_t peek = br.peek16();
      int ssss = lut_sym[toff + peek];
      int ln = lut_len[toff + peek];
      if (ln == 0) return RPF_ERR_BAD_HUFF;
      br.skip(ln);
      int32_t diff;
      if (ssss == 16) {
        diff = 32768;
      } else if (ssss == 0) {
        diff = 0;
      } else {
        uint32_t v = br.get(ssss);
        diff = (v >= (1u << (ssss - 1)))
                   ? static_cast<int32_t>(v)
                   : static_cast<int32_t>(v) - (1 << ssss) + 1;
      }
      int x = col * ncomp + c;
      int32_t pred;
      if (seg_first[c]) {
        pred = dflt;
        seg_first[c] = false;
      } else if (row == first_row) {
        pred = orow[x - ncomp];  // 1-D Ra on the interval's first line
      } else if (col == 0) {
        pred = *(orow - stride + x);
      } else {
        int32_t ra = orow[x - ncomp];
        int32_t rb = *(orow - stride + x);
        int32_t rcn = *(orow - stride + x - ncomp);
        switch (predictor) {
          case 1: pred = ra; break;
          case 2: pred = rb; break;
          case 3: pred = rcn; break;
          case 4: pred = ra + rb - rcn; break;
          case 5: pred = ra + ((rb - rcn) >> 1); break;
          case 6: pred = rb + ((ra - rcn) >> 1); break;
          default: pred = (ra + rb) >> 1; break;
        }
      }
      orow[x] = static_cast<uint16_t>((pred + diff) & 0xFFFF);
    }
  }
  // Consumed more bits than the segment holds -> truncated stream.
  if (8 * br.byte - br.ncached > 8 * seg_bytes) rc = RPF_ERR_TRUNCATED;
  return rc;
}

// Lossless-JPEG bit packing (encoder hot loop): MSB-first concatenation
// of (value, nbits<=32) entries, final partial byte padded with 1s (the
// JPEG byte-align rule). Returns bytes written. Semantics oracle:
// io/ljpeg._pack_bits (numpy; tested byte-equal).
int64_t rpf_ljpeg_pack_bits(const int64_t* vals, const uint8_t* lens,
                            int64_t n, uint8_t* out) {
  if ((!vals || !lens || !out) && n > 0) return -1;
  uint64_t acc = 0;
  int nacc = 0;
  int64_t o = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int l = lens[i];
    const uint64_t mask = (l >= 64) ? ~0ULL : ((1ULL << l) - 1);
    acc = (acc << l) | (static_cast<uint64_t>(vals[i]) & mask);
    nacc += l;
    while (nacc >= 8) {
      out[o++] = static_cast<uint8_t>(acc >> (nacc - 8));
      nacc -= 8;
    }
  }
  if (nacc > 0) {
    const int pad = 8 - nacc;
    out[o++] = static_cast<uint8_t>(((acc << pad) | ((1u << pad) - 1)) & 0xFF);
  }
  return o;
}

// Mask binarization: v >= threshold -> 1.0 else 0.0 (lib.rs:481-499).
int rpf_binarize_mask_f32(const float* src, float* dst, int64_t n,
                          float threshold) {
  if (!src || !dst || n < 0) return RPF_ERR_ARGS;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) dst[i] = src[i] >= threshold ? 1.0f : 0.0f;
  return RPF_OK;
}

}  // extern "C"
