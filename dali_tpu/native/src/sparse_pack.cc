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

}  // extern "C"
