// Sparse wire packing for the hybrid JPEG decoder's AC planes.
//
// Quantized AC coefficients are mostly zero (q85 photographic content keeps
// ~4-7 nonzeros of the 15 low-frequency slots per block), yet the flat wire
// shipped all k*k-1 of them densely — 75% of host→device bytes. This pass
// compacts a dense per-block int8 plane into:
//   * mask: one uint16 per block, bit j set iff slot j is nonzero (block
//     order identical to the DC plane's flat layout), and
//   * vals: the nonzero int8 values, concatenated in slot order across all
//     blocks of the whole batch (self-describing: the device program
//     rebuilds positions from cumsum(popcount(mask)) — no offsets shipped).
//
// The device reconstruction lives in executor.py::_unsparse_boundary.
// Reference analogue: the nvJPEG hybrid wire also ships entropy-compacted
// coefficients rather than dense planes.
//
// SSSE3 path: one 16-byte load per block, pcmpeqb+movemask for the bitmap,
// two pshufb table-compactions (classic left-pack) for the values. Caller
// must size `vals` for worst case (n_blocks * nac) plus 16 slack bytes —
// each 8-byte store may overhang the current write position.

#include <cstdint>
#include <cstring>

#if defined(__SSSE3__)
#include <tmmintrin.h>
#endif

namespace {

struct CompTbl {
  alignas(16) uint8_t idx[256][8];
  uint8_t cnt[256];
  CompTbl() {
    for (int m = 0; m < 256; m++) {
      int t = 0;
      for (int b = 0; b < 8; b++)
        if (m >> b & 1) idx[m][t++] = (uint8_t)b;
      cnt[m] = (uint8_t)t;
      for (; t < 8; t++) idx[m][t] = 0x80;  // pshufb: high bit -> zero
    }
  }
};
const CompTbl kTbl;

}  // namespace

extern "C" {

// Returns the total number of packed values (== sum of popcounts of mask).
// nac must be <= 16 (one uint16 bitmap per block); callers gate on that.
long long dali_tpu_sparse_pack_i8(const signed char* dense, long long n_blocks,
                                  int nac, unsigned short* mask,
                                  signed char* vals) {
  if (nac < 1 || nac > 16) return -1;
  const unsigned lim = nac >= 16 ? 0xFFFFu : ((1u << nac) - 1);
  long long t = 0;
  long long b = 0;
#if defined(__SSSE3__)
  // blocks whose 16-byte load stays inside the dense buffer
  const long long n_sse =
      n_blocks - ((16 + nac - 1) / nac);  // conservative tail
  const __m128i zero = _mm_setzero_si128();
  const __m128i eight = _mm_set1_epi8(8);
  for (; b < n_sse; b++) {
    __m128i v = _mm_loadu_si128(
        reinterpret_cast<const __m128i*>(dense + b * nac));
    unsigned zm = (unsigned)_mm_movemask_epi8(_mm_cmpeq_epi8(v, zero));
    unsigned nz = ~zm & lim;
    mask[b] = (unsigned short)nz;
    unsigned mlo = nz & 0xFF, mhi = (nz >> 8) & 0xFF;
    __m128i slo =
        _mm_loadl_epi64(reinterpret_cast<const __m128i*>(kTbl.idx[mlo]));
    _mm_storel_epi64(reinterpret_cast<__m128i*>(vals + t),
                     _mm_shuffle_epi8(v, slo));
    t += kTbl.cnt[mlo];
    __m128i shi = _mm_add_epi8(
        _mm_loadl_epi64(reinterpret_cast<const __m128i*>(kTbl.idx[mhi])),
        eight);  // 0x80 stays >= 0x80 after +8, still zeroing
    _mm_storel_epi64(reinterpret_cast<__m128i*>(vals + t),
                     _mm_shuffle_epi8(v, shi));
    t += kTbl.cnt[mhi];
  }
#endif
  for (; b < n_blocks; b++) {
    const signed char* src = dense + b * nac;
    unsigned nz = 0;
    for (int j = 0; j < nac; j++)
      if (src[j]) {
        nz |= 1u << j;
        vals[t++] = src[j];
      }
    mask[b] = (unsigned short)nz;
  }
  return t;
}

// Nibble-pack a packed int8 value stream: each value becomes a signed
// 4-bit code in [-7, 7]; -8 (0x8) marks an escape whose full int8 value is
// appended to `escapes` in order. Self-describing like the mask stream —
// the device rebuilds escape positions from cumsum(code == -8). Two codes
// per output byte, little-nibble first; odd tail padded with 0.
// Returns the escape count. `escapes` must hold n + 16 bytes (worst case
// plus SIMD left-pack store slack).
long long dali_tpu_nib_pack_i8(const signed char* vals, long long n,
                               unsigned char* nibbles, signed char* escapes) {
  long long e = 0;
  long long i = 0;
#if defined(__SSSE3__)
  const __m128i lo7 = _mm_set1_epi8(7);
  const __m128i hi7 = _mm_set1_epi8(-7);
  const __m128i x0f = _mm_set1_epi8(0x0F);
  const __m128i x08 = _mm_set1_epi8(0x08);
  const __m128i evens =
      _mm_setr_epi8(0, 2, 4, 6, 8, 10, 12, 14, -1, -1, -1, -1, -1, -1, -1, -1);
  const __m128i odds =
      _mm_setr_epi8(1, 3, 5, 7, 9, 11, 13, 15, -1, -1, -1, -1, -1, -1, -1, -1);
  for (; i + 16 <= n; i += 16) {
    __m128i v = _mm_loadu_si128(reinterpret_cast<const __m128i*>(vals + i));
    __m128i esc = _mm_or_si128(_mm_cmpgt_epi8(v, lo7), _mm_cmpgt_epi8(hi7, v));
    __m128i nib = _mm_or_si128(_mm_andnot_si128(esc, _mm_and_si128(v, x0f)),
                               _mm_and_si128(esc, x08));
    __m128i ev = _mm_shuffle_epi8(nib, evens);
    __m128i od = _mm_shuffle_epi8(nib, odds);
    __m128i out = _mm_or_si128(ev, _mm_slli_epi16(_mm_and_si128(od, x0f), 4));
    _mm_storel_epi64(reinterpret_cast<__m128i*>(nibbles + (i >> 1)), out);
    unsigned em = (unsigned)_mm_movemask_epi8(esc);
    // compact escaped full values with the same two-level pshufb left-pack
    // as the block pack above (a scalar bit loop here costs ~5 ms/batch at
    // photo-content escape rates)
    unsigned mlo = em & 0xFF, mhi = (em >> 8) & 0xFF;
    __m128i slo =
        _mm_loadl_epi64(reinterpret_cast<const __m128i*>(kTbl.idx[mlo]));
    _mm_storel_epi64(reinterpret_cast<__m128i*>(escapes + e),
                     _mm_shuffle_epi8(v, slo));
    e += kTbl.cnt[mlo];
    __m128i shi = _mm_add_epi8(
        _mm_loadl_epi64(reinterpret_cast<const __m128i*>(kTbl.idx[mhi])),
        _mm_set1_epi8(8));
    _mm_storel_epi64(reinterpret_cast<__m128i*>(escapes + e),
                     _mm_shuffle_epi8(v, shi));
    e += kTbl.cnt[mhi];
  }
#endif
  unsigned char cur = 0;
  for (; i < n; i++) {
    int v = vals[i];
    unsigned nb;
    if (v < -7 || v > 7) {
      nb = 0x8;
      escapes[e++] = (signed char)v;
    } else {
      nb = (unsigned)v & 0xF;
    }
    if (i & 1) {
      nibbles[i >> 1] = (unsigned char)(cur | (nb << 4));
    } else {
      cur = (unsigned char)nb;
      if (i + 1 == n) nibbles[i >> 1] = cur;  // odd tail
    }
  }
  return e;
}

// Escape-pack an int16 stream (hybrid DC planes) to int8: values in
// [-127, 127] pass through; anything else becomes the marker -128 with the
// full int16 appended to `escapes` (typically ~1% of quantized DC terms).
// Returns the escape count. `escapes` must hold n values (worst case).
long long dali_tpu_esc_pack_i16(const short* vals, long long n,
                                signed char* out8, short* escapes) {
  long long e = 0;
  long long i = 0;
#if defined(__SSSE3__)
  const __m128i lo = _mm_set1_epi16(127);
  const __m128i hi = _mm_set1_epi16(-127);
  const __m128i mark = _mm_set1_epi8(-128);
  for (; i + 16 <= n; i += 16) {
    __m128i a = _mm_loadu_si128(reinterpret_cast<const __m128i*>(vals + i));
    __m128i b = _mm_loadu_si128(reinterpret_cast<const __m128i*>(vals + i + 8));
    __m128i ea = _mm_or_si128(_mm_cmpgt_epi16(a, lo), _mm_cmpgt_epi16(hi, a));
    __m128i eb = _mm_or_si128(_mm_cmpgt_epi16(b, lo), _mm_cmpgt_epi16(hi, b));
    __m128i esc8 = _mm_packs_epi16(ea, eb);  // lane masks survive packs
    __m128i sat = _mm_packs_epi16(a, b);
    __m128i out = _mm_or_si128(_mm_andnot_si128(esc8, sat),
                               _mm_and_si128(esc8, mark));
    _mm_storeu_si128(reinterpret_cast<__m128i*>(out8 + i), out);
    unsigned em = (unsigned)_mm_movemask_epi8(esc8);
    while (em) {
      int bpos = __builtin_ctz(em);
      escapes[e++] = vals[i + bpos];
      em &= em - 1;
    }
  }
#endif
  for (; i < n; i++) {
    int v = vals[i];
    if (v < -127 || v > 127) {
      out8[i] = -128;
      escapes[e++] = (short)v;
    } else {
      out8[i] = (signed char)v;
    }
  }
  return e;
}

}  // extern "C"
