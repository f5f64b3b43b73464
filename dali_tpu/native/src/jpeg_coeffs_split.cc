// Split-precision coefficient export for the hybrid JPEG decoder wire format:
// DC terms as int16 (differentially-coded DC has a wide range), AC terms
// saturated to int8 (quantized AC magnitudes are small by design of the quant
// tables; saturation is a no-op for typical photographic content at q<=95).
// Halves host→device traffic vs int16 planes — the wire is the bottleneck on
// bandwidth-constrained hosts.

#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <jpeglib.h>

extern "C" {

struct SplitErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

static void split_error_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<SplitErr*>(cinfo->err)->jb, 1);
}

static inline signed char sat8(int v) {
  return (signed char)(v < -128 ? -128 : v > 127 ? 127 : v);
}

// dc_out: per-plane [bh*bw] int16; ac_out: [bh*bw*(k*k-1)] int8.
// q_out layout matches jpeg_coeffs.cc: luma ky*ky then chroma kc*kc entries.
int dali_tpu_jpeg_read_coeffs_split_crop(const char* data, size_t len, int ky,
                                         int kc, short* y_dc, signed char* y_ac,
                                         short* cb_dc, signed char* cb_ac,
                                         short* cr_dc, signed char* cr_ac,
                                         unsigned short* q_out, int y_bh,
                                         int y_bw, int c_bh, int c_bw, int y_br0,
                                         int y_bc0, int c_br0, int c_bc0) {
  jpeg_decompress_struct cinfo;
  SplitErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = split_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, reinterpret_cast<const unsigned char*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jvirt_barray_ptr* coefs = jpeg_read_coefficients(&cinfo);
  if (!coefs) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  struct Plane {
    short* dc;
    signed char* ac;
    int bh, bw, k, br0, bc0;
  } planes[3] = {{y_dc, y_ac, y_bh, y_bw, ky, y_br0, y_bc0},
                 {cb_dc, cb_ac, c_bh, c_bw, kc, c_br0, c_bc0},
                 {cr_dc, cr_ac, c_bh, c_bw, kc, c_br0, c_bc0}};

  // grayscale: Y from the stream, ZERO chroma planes (Cb=Cr=128 after the
  // IDCT bias -> R=G=B=Y exactly; wire mode 1 / 4:4:4 geometry)
  const int ncomp_real = cinfo.num_components == 1 ? 1 : 3;
  if (ncomp_real == 1) {
    std::memset(cb_dc, 0, sizeof(short) * (size_t)c_bh * c_bw);
    std::memset(cr_dc, 0, sizeof(short) * (size_t)c_bh * c_bw);
    std::memset(cb_ac, 0, (size_t)c_bh * c_bw * (kc * kc - 1));
    std::memset(cr_ac, 0, (size_t)c_bh * c_bw * (kc * kc - 1));
    for (int i = 0; i < kc * kc; i++) q_out[ky * ky + i] = 1;
  }

  for (int comp = 0; comp < ncomp_real; comp++) {
    jpeg_component_info* ci = &cinfo.comp_info[comp];
    Plane& p = planes[comp];
    const int k = p.k;
    const int n_ac = k * k - 1;
    int sel[64];
    for (int r = 0; r < k; r++)
      for (int c = 0; c < k; c++) sel[r * k + c] = r * 8 + c;
    int real_bh = ci->height_in_blocks;
    int real_bw = ci->width_in_blocks;
    for (int br = 0; br < p.bh; br++) {
      JBLOCKARRAY rows = nullptr;
      if (br + p.br0 < real_bh) {
        rows = (cinfo.mem->access_virt_barray)(reinterpret_cast<j_common_ptr>(&cinfo),
                                               coefs[comp], br + p.br0, 1, FALSE);
      }
      for (int bc = 0; bc < p.bw; bc++) {
        long bidx = (long)br * p.bw + bc;
        signed char* ac_dst = p.ac + bidx * n_ac;
        if (rows != nullptr && bc + p.bc0 < real_bw) {
          JCOEF* blk = rows[0][bc + p.bc0];
          p.dc[bidx] = blk[0];
          for (int i = 1; i < k * k; i++) ac_dst[i - 1] = sat8(blk[sel[i]]);
        } else {
          p.dc[bidx] = 0;
          std::memset(ac_dst, 0, n_ac);
        }
      }
    }
    if (comp < 2) {
      JQUANT_TBL* qt = ci->quant_table ? ci->quant_table
                                       : cinfo.quant_tbl_ptrs[ci->quant_tbl_no];
      unsigned short* qdst = comp == 0 ? q_out : q_out + ky * ky;
      for (int i = 0; i < k * k; i++) qdst[i] = qt ? qt->quantval[sel[i]] : 1;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int dali_tpu_jpeg_read_coeffs_split(const char* data, size_t len, int ky, int kc,
                                    short* y_dc, signed char* y_ac,
                                    short* cb_dc, signed char* cb_ac,
                                    short* cr_dc, signed char* cr_ac,
                                    unsigned short* q_out, int y_bh, int y_bw,
                                    int c_bh, int c_bw) {
  return dali_tpu_jpeg_read_coeffs_split_crop(data, len, ky, kc, y_dc, y_ac,
                                              cb_dc, cb_ac, cr_dc, cr_ac, q_out,
                                              y_bh, y_bw, c_bh, c_bw, 0, 0, 0, 0);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Batch entry: read every sample's coefficient planes DIRECTLY into padded
// batch canvases (one Python call per batch; per-sample fan-out on the
// tasking pool, tasking.cc). Passing the canvas block dims as bh/bw makes the
// zero-fill above double as boundary-staging padding — decode and pad_stack
// fuse into one pass.

#include <cstdint>
#include <vector>

extern "C" int64_t dali_tpu_task_submit(void*, void (*)(void*), void*,
                                        const int64_t*, int);
extern "C" void dali_tpu_pool_wait_all(void*);
extern "C" int dali_tpu_pool_num_threads(void*);
// Fast from-scratch baseline Huffman decoder (jpeg_huff.cc); nonzero return
// means unsupported-or-corrupt-header and we fall back to libjpeg here.
extern "C" int dali_tpu_jpeg_huff_read_coeffs_split_crop(
    const char*, size_t, int, int, short*, signed char*, short*, signed char*,
    short*, signed char*, unsigned short*, int, int, int, int, int, int, int,
    int);
extern "C" int dali_tpu_jpeg_huff_progressive_read_coeffs_split_crop(
    const char*, size_t, int, int, short*, signed char*, short*, signed char*,
    short*, signed char*, unsigned short*, int, int, int, int, int, int, int,
    int);

#include <atomic>
#include <chrono>

namespace {

// Batch-call itemization (VERDICT r4 #1): where the in-pipeline native call
// spends time, split fast-path vs fallback vs the serial compaction pass.
struct BatchStats {
  std::atomic<long long> ns_fast{0};      // jpeg_huff pack decode (ok samples)
  std::atomic<long long> ns_fallback{0};  // progressive/libjpeg + re-pack
  std::atomic<long long> ns_compact{0};   // serial value-stream memmove pass
  std::atomic<long long> ns_batch{0};     // whole batch-call wall
  std::atomic<long long> n_fast{0};
  std::atomic<long long> n_fallback{0};
  std::atomic<long long> n_batches{0};
};
BatchStats g_bstats;

inline long long bnow_ns() {
  return std::chrono::duration_cast<std::chrono::nanoseconds>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

bool fast_huff_enabled() {
  static const bool on = [] {
    const char* e = getenv("DALI_TPU_DISABLE_FAST_HUFF");
    return !(e && e[0] && e[0] != '0');
  }();
  return on;
}
struct CoefSplitJob {
  const char* data;
  size_t len;
  int ky, kc, bh, bw, cbh, cbw;
  short* y_dc;
  signed char* y_ac;
  short* cb_dc;
  signed char* cb_ac;
  short* cr_dc;
  signed char* cr_ac;
  unsigned short* q;
  int* ok;
  int y_br0 = 0, y_bc0 = 0, c_br0 = 0, c_bc0 = 0;
};

void run_coef_split_job(void* p) {
  CoefSplitJob* j = static_cast<CoefSplitJob*>(p);
  int rc = 1;
  if (fast_huff_enabled()) {
    rc = dali_tpu_jpeg_huff_read_coeffs_split_crop(
        j->data, j->len, j->ky, j->kc, j->y_dc, j->y_ac, j->cb_dc, j->cb_ac,
        j->cr_dc, j->cr_ac, j->q, j->bh, j->bw, j->cbh, j->cbw, j->y_br0,
        j->y_bc0, j->c_br0, j->c_bc0);
    if (rc != 0) {  // SOF2 streams: from-scratch progressive decoder
      rc = dali_tpu_jpeg_huff_progressive_read_coeffs_split_crop(
          j->data, j->len, j->ky, j->kc, j->y_dc, j->y_ac, j->cb_dc, j->cb_ac,
          j->cr_dc, j->cr_ac, j->q, j->bh, j->bw, j->cbh, j->cbw, j->y_br0,
          j->y_bc0, j->c_br0, j->c_bc0);
    }
  }
  if (rc != 0) {
    rc = dali_tpu_jpeg_read_coeffs_split_crop(
        j->data, j->len, j->ky, j->kc, j->y_dc, j->y_ac, j->cb_dc, j->cb_ac,
        j->cr_dc, j->cr_ac, j->q, j->bh, j->bw, j->cbh, j->cbw, j->y_br0,
        j->y_bc0, j->c_br0, j->c_bc0);
  }
  *j->ok = rc == 0 ? 1 : 0;
}
}  // namespace

extern "C" int dali_tpu_jpeg_coeffs_split_batch(
    void* pool, const char** datas, const size_t* lens, int n, int ky, int kc,
    int BH, int BW, int CBH, int CBW, short* y_dc, signed char* y_ac,
    short* c_dc, signed char* c_ac, unsigned short* q, int* oks) {
  const long y_n = (long)BH * BW;
  const long c_n = (long)CBH * CBW;
  const int y_ac_k = ky * ky - 1;
  const int c_ac_k = kc * kc - 1;
  const int qn = ky * ky + kc * kc;
  std::vector<CoefSplitJob> jobs(n);
  // single-worker pools: run inline (256 submit/wait round-trips per batch
  // are pure mutex overhead on 1-core hosts)
  const bool inline_run = dali_tpu_pool_num_threads(pool) <= 1;
  for (int i = 0; i < n; i++) {
    jobs[i] = {datas[i],
               lens[i],
               ky,
               kc,
               BH,
               BW,
               CBH,
               CBW,
               y_dc + i * y_n,
               y_ac + i * y_n * y_ac_k,
               c_dc + i * 2 * c_n,
               c_ac + i * 2 * c_n * c_ac_k,
               c_dc + i * 2 * c_n + c_n,
               c_ac + i * 2 * c_n * c_ac_k + c_n * c_ac_k,
               q + i * qn,
               &oks[i]};
    if (inline_run) run_coef_split_job(&jobs[i]);
    else dali_tpu_task_submit(pool, run_coef_split_job, &jobs[i], nullptr, 0);
  }
  if (!inline_run) dali_tpu_pool_wait_all(pool);
  return 0;
}

// Flat variant: per-sample planes are written densely (each sample with its
// OWN block dims) at given element offsets of shared flat buffers — no padding
// bytes on the wire at all. The device program scatters flat → canvas with one
// gather per plane (executor.py flat-boundary reconstruction).
extern "C" int dali_tpu_jpeg_coeffs_split_flat_batch(
    void* pool, const char** datas, const size_t* lens, int n, int ky, int kc,
    const int* ybh, const int* ybw, const int* cbh, const int* cbw,
    const long* y_dc_off, const long* y_ac_off, const long* c_dc_off,
    const long* c_ac_off, short* y_dc, signed char* y_ac, short* c_dc,
    signed char* c_ac, unsigned short* q, int* oks) {
  const int c_ac_k = kc * kc - 1;
  const int qn = ky * ky + kc * kc;
  std::vector<CoefSplitJob> jobs(n);
  // single-worker pools: run inline (256 submit/wait round-trips per batch
  // are pure mutex overhead on 1-core hosts)
  const bool inline_run = dali_tpu_pool_num_threads(pool) <= 1;
  for (int i = 0; i < n; i++) {
    const long c_n = (long)cbh[i] * cbw[i];
    jobs[i] = {datas[i],
               lens[i],
               ky,
               kc,
               ybh[i],
               ybw[i],
               cbh[i],
               cbw[i],
               y_dc + y_dc_off[i],
               y_ac + y_ac_off[i],
               c_dc + c_dc_off[i],
               c_ac + c_ac_off[i],
               c_dc + c_dc_off[i] + c_n,
               c_ac + c_ac_off[i] + c_n * c_ac_k,
               q + (long)i * qn,
               &oks[i]};
    if (inline_run) run_coef_split_job(&jobs[i]);
    else dali_tpu_task_submit(pool, run_coef_split_job, &jobs[i], nullptr, 0);
  }
  if (!inline_run) dali_tpu_pool_wait_all(pool);
  return 0;
}


// Flat variant with per-sample BLOCK WINDOWS: only the crop's blocks are read
// and shipped (DCT-domain random crop — the luma window is 16px-aligned so the
// chroma window is exactly half of it).
extern "C" int dali_tpu_jpeg_coeffs_split_flat_crop_batch(
    void* pool, const char** datas, const size_t* lens, int n, int ky, int kc,
    const int* ybh, const int* ybw, const int* cbh, const int* cbw,
    const int* y_br0, const int* y_bc0,
    const int* c_br0, const int* c_bc0,  // explicit chroma window origins
    const long* y_dc_off, const long* y_ac_off, const long* c_dc_off,
    const long* c_ac_off, short* y_dc, signed char* y_ac, short* c_dc,
    signed char* c_ac, unsigned short* q, int* oks) {
  const int c_ac_k = kc * kc - 1;
  const int qn = ky * ky + kc * kc;
  std::vector<CoefSplitJob> jobs(n);
  // single-worker pools: run inline (256 submit/wait round-trips per batch
  // are pure mutex overhead on 1-core hosts)
  const bool inline_run = dali_tpu_pool_num_threads(pool) <= 1;
  for (int i = 0; i < n; i++) {
    const long c_n = (long)cbh[i] * cbw[i];
    jobs[i] = {datas[i],
               lens[i],
               ky,
               kc,
               ybh[i],
               ybw[i],
               cbh[i],
               cbw[i],
               y_dc + y_dc_off[i],
               y_ac + y_ac_off[i],
               c_dc + c_dc_off[i],
               c_ac + c_ac_off[i],
               c_dc + c_dc_off[i] + c_n,
               c_ac + c_ac_off[i] + c_n * c_ac_k,
               q + (long)i * qn,
               &oks[i],
               y_br0[i],
               y_bc0[i],
               c_br0[i],
               c_bc0[i]};
    if (inline_run) run_coef_split_job(&jobs[i]);
    else dali_tpu_task_submit(pool, run_coef_split_job, &jobs[i], nullptr, 0);
  }
  if (!inline_run) dali_tpu_pool_wait_all(pool);
  return 0;
}

// ---------------------------------------------------------------------------
// Pack-emit batch entry (VERDICT r3 #1): ONE native call goes from file
// bytes to the sparse wire — per-sample fan-out decodes Huffman and emits
// zigzag-convention masks + contiguous value streams directly (jpeg_huff.cc
// ..._crop_pack; no dense AC planes anywhere), the rare unsupported-header
// sample falls back to libjpeg + a permuted compaction into the same
// convention, and a final serial pass compacts the per-sample value streams
// (placed at worst-case offsets) into one contiguous stream per plane.

extern "C" int dali_tpu_jpeg_huff_read_coeffs_split_crop_pack_idx(
    const char*, size_t, int, int, short*, unsigned short*, signed char*,
    long long*, short*, short*, unsigned short*, signed char*, long long*,
    unsigned short*, int, int, int, int, int, int, int, int, unsigned char*,
    long long);
extern "C" long long dali_tpu_sparse_pack_i8_perm(
    const signed char*, long long, int, const unsigned char*, unsigned short*,
    signed char*);

namespace {

void zz_perm(int k, unsigned char* perm /*[16]*/) {
  // b-th selected coefficient in zigzag order -> slot (r*k + c - 1);
  // zigzag walk identical to jpeg_huff.cc's ZigzagTable
  std::memset(perm, 0x80, 16);
  int r = 0, c = 0, b = 0;
  for (int z = 0; z < 64; z++) {
    if (z > 0 && r < k && c < k) perm[b++] = (unsigned char)(r * k + c - 1);
    if (((r + c) & 1) == 0) {
      if (c == 7) r++;
      else if (r == 0) c++;
      else { r--; c++; }
    } else {
      if (r == 7) c++;
      else if (c == 0) r++;
      else { r++; c--; }
    }
  }
}

struct CoefPackJob {
  const char* data;
  size_t len;
  int ky, kc, bh, bw, cbh, cbw;
  int y_br0, y_bc0, c_br0, c_bc0;
  short* y_dc;
  short* cb_dc;
  short* cr_dc;
  unsigned short* y_mask;
  signed char* y_vals;
  unsigned short* c_mask;
  signed char* c_vals;
  unsigned short* q;
  long long* y_nnz;
  long long* c_nnz;
  int* ok;
  const unsigned char* perm_y;
  const unsigned char* perm_c;
  unsigned char* idx;    // per-file ROI decode index blob (nullable)
  long long idx_cap;
};

void run_coef_pack_job(void* p) {
  CoefPackJob* j = static_cast<CoefPackJob*>(p);
  int rc = 1;
  long long t0 = bnow_ns();
  if (fast_huff_enabled()) {
    rc = dali_tpu_jpeg_huff_read_coeffs_split_crop_pack_idx(
        j->data, j->len, j->ky, j->kc, j->y_dc, j->y_mask, j->y_vals,
        j->y_nnz, j->cb_dc, j->cr_dc, j->c_mask, j->c_vals, j->c_nnz, j->q,
        j->bh, j->bw, j->cbh, j->cbw, j->y_br0, j->y_bc0, j->c_br0, j->c_bc0,
        j->idx, j->idx_cap);
  }
  if (rc == 0) {
    g_bstats.ns_fast.fetch_add(bnow_ns() - t0, std::memory_order_relaxed);
    g_bstats.n_fast.fetch_add(1, std::memory_order_relaxed);
  }
  if (rc != 0) {
    // libjpeg fallback: dense scratch planes, then permuted compaction into
    // the same zigzag-bit wire convention
    const int nac_y = j->ky * j->ky - 1, nac_c = j->kc * j->kc - 1;
    const long y_n = (long)j->bh * j->bw;
    const long c_n = (long)j->cbh * j->cbw;
    thread_local std::vector<signed char> y_s, cb_s, cr_s;
    if ((long)y_s.size() < y_n * nac_y + 16) y_s.resize(y_n * nac_y + 16);
    if ((long)cb_s.size() < c_n * nac_c + 16) cb_s.resize(c_n * nac_c + 16);
    if ((long)cr_s.size() < c_n * nac_c + 16) cr_s.resize(c_n * nac_c + 16);
    rc = 1;
    if (fast_huff_enabled()) {
      rc = dali_tpu_jpeg_huff_progressive_read_coeffs_split_crop(
          j->data, j->len, j->ky, j->kc, j->y_dc, y_s.data(), j->cb_dc,
          cb_s.data(), j->cr_dc, cr_s.data(), j->q, j->bh, j->bw, j->cbh,
          j->cbw, j->y_br0, j->y_bc0, j->c_br0, j->c_bc0);
    }
    if (rc != 0) {
      rc = dali_tpu_jpeg_read_coeffs_split_crop(
          j->data, j->len, j->ky, j->kc, j->y_dc, y_s.data(), j->cb_dc,
          cb_s.data(), j->cr_dc, cr_s.data(), j->q, j->bh, j->bw, j->cbh,
          j->cbw, j->y_br0, j->y_bc0, j->c_br0, j->c_bc0);
    }
    if (rc == 0) {
      *j->y_nnz = dali_tpu_sparse_pack_i8_perm(y_s.data(), y_n, nac_y,
                                               j->perm_y, j->y_mask,
                                               j->y_vals);
      long long cb = dali_tpu_sparse_pack_i8_perm(cb_s.data(), c_n, nac_c,
                                                  j->perm_c, j->c_mask,
                                                  j->c_vals);
      long long cr = dali_tpu_sparse_pack_i8_perm(
          cr_s.data(), c_n, nac_c, j->perm_c, j->c_mask + c_n,
          j->c_vals + cb);
      *j->c_nnz = cb + cr;
    }
    g_bstats.ns_fallback.fetch_add(bnow_ns() - t0, std::memory_order_relaxed);
    g_bstats.n_fallback.fetch_add(1, std::memory_order_relaxed);
  }
  *j->ok = rc == 0 ? 1 : 0;
}

}  // namespace

// Snapshot (and optionally reset) the batch-call itemization. Layout:
// [ns_fast, ns_fallback, ns_compact, ns_batch, n_fast, n_fallback, n_batches].
extern "C" void dali_tpu_decode_batch_stats(long long out[7], int reset) {
  out[0] = g_bstats.ns_fast.load(std::memory_order_relaxed);
  out[1] = g_bstats.ns_fallback.load(std::memory_order_relaxed);
  out[2] = g_bstats.ns_compact.load(std::memory_order_relaxed);
  out[3] = g_bstats.ns_batch.load(std::memory_order_relaxed);
  out[4] = g_bstats.n_fast.load(std::memory_order_relaxed);
  out[5] = g_bstats.n_fallback.load(std::memory_order_relaxed);
  out[6] = g_bstats.n_batches.load(std::memory_order_relaxed);
  if (reset) {
    g_bstats.ns_fast.store(0, std::memory_order_relaxed);
    g_bstats.ns_fallback.store(0, std::memory_order_relaxed);
    g_bstats.ns_compact.store(0, std::memory_order_relaxed);
    g_bstats.ns_batch.store(0, std::memory_order_relaxed);
    g_bstats.n_fast.store(0, std::memory_order_relaxed);
    g_bstats.n_fallback.store(0, std::memory_order_relaxed);
    g_bstats.n_batches.store(0, std::memory_order_relaxed);
  }
}

extern "C" int dali_tpu_jpeg_coeffs_split_flat_crop_pack_batch(
    void* pool, const char** datas, const size_t* lens, int n, int ky, int kc,
    const int* ybh, const int* ybw, const int* cbh, const int* cbw,
    const int* y_br0, const int* y_bc0, const int* c_br0, const int* c_bc0,
    const long* y_dc_off, const long* y_ac_off, const long* c_dc_off,
    const long* c_ac_off, short* y_dc, unsigned short* y_mask,
    signed char* y_vals, short* c_dc, unsigned short* c_mask,
    signed char* c_vals, unsigned short* q, int* oks, long long* y_total,
    long long* c_total, unsigned char** idxs, const long long* idx_caps) {
  const int qn = ky * ky + kc * kc;
  long long t_batch0 = bnow_ns();
  unsigned char perm_y[16], perm_c[16];
  zz_perm(ky, perm_y);
  zz_perm(kc, perm_c);
  std::vector<CoefPackJob> jobs(n);
  std::vector<long long> y_nnz(n), c_nnz(n);
  const bool inline_run = dali_tpu_pool_num_threads(pool) <= 1;
  for (int i = 0; i < n; i++) {
    const long c_n = (long)cbh[i] * cbw[i];
    jobs[i] = {datas[i],      lens[i],
               ky,            kc,
               ybh[i],        ybw[i],
               cbh[i],        cbw[i],
               y_br0[i],      y_bc0[i],
               c_br0[i],      c_bc0[i],
               y_dc + y_dc_off[i],
               c_dc + c_dc_off[i],
               c_dc + c_dc_off[i] + c_n,
               y_mask + y_dc_off[i],
               y_vals + y_ac_off[i],
               c_mask + c_dc_off[i],
               c_vals + c_ac_off[i],
               q + (long)i * qn,
               &y_nnz[i],     &c_nnz[i],
               &oks[i],       perm_y,
               perm_c,
               idxs ? idxs[i] : nullptr,
               idxs && idx_caps ? idx_caps[i] : 0};
    if (inline_run) run_coef_pack_job(&jobs[i]);
    else dali_tpu_task_submit(pool, run_coef_pack_job, &jobs[i], nullptr, 0);
  }
  if (!inline_run) dali_tpu_pool_wait_all(pool);
  // compact per-sample value streams (at worst-case offsets) into one
  // contiguous stream per plane; dst <= src throughout, so forward memmove
  // in sample order is safe
  long long t_cmp0 = bnow_ns();
  long long yt = 0, ct = 0;
  for (int i = 0; i < n; i++) {
    if (y_vals + yt != y_vals + y_ac_off[i])
      std::memmove(y_vals + yt, y_vals + y_ac_off[i], y_nnz[i]);
    yt += y_nnz[i];
    if (c_vals + ct != c_vals + c_ac_off[i])
      std::memmove(c_vals + ct, c_vals + c_ac_off[i], c_nnz[i]);
    ct += c_nnz[i];
  }
  *y_total = yt;
  *c_total = ct;
  long long t_end = bnow_ns();
  g_bstats.ns_compact.fetch_add(t_end - t_cmp0, std::memory_order_relaxed);
  g_bstats.ns_batch.fetch_add(t_end - t_batch0, std::memory_order_relaxed);
  g_bstats.n_batches.fetch_add(1, std::memory_order_relaxed);
  return 0;
}
