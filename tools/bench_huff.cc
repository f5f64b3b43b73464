// Microbenchmark for the from-scratch JPEG Huffman coefficient decoder
// (native/src/jpeg_huff.cc). Feeds it the bench corpus and reports us/img
// for the crop-bounded coefficient read — the host-side hot loop of the
// hybrid decode path.
//
// Lanes (r4: reconcile the in-pipeline cost against the microbench, VERDICT
// r4 #1 — the pipeline runs the PACK entry on RRC-distributed windows and
// pays the MEAN, not a best-of-reps midrange number):
//   dense-mid : legacy lane (r2/r3 continuity) — dense entry, midrange
//               0.55-0.9 linear windows, no halo
//   dense-rrc : dense entry on pipeline-identical RRC windows (area
//               U(0.08,1), log-aspect 3/4..4/3, 10 attempts, center-crop
//               fallback) with the pipeline's MCU snap + 1-MCU halo
//   pack-rrc  : the pack-emit entry (what the pipeline actually calls) on
//               the same RRC windows
// Each lane prints best and mean us/img over reps.
//
// Build+run:
//   g++ -O3 -march=native -std=c++17 tools/bench_huff.cc \
//       dali_tpu/native/src/jpeg_huff.cc -o /tmp/bench_huff
//   /tmp/bench_huff /tmp/dali_tpu_bench_data/class0 256 12 [--pair]
#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dirent.h>
#include <string>
#include <vector>

extern "C" void dali_tpu_scan_syms(long long out[2], int reset);
extern "C" int dali_tpu_jpeg_huff_read_coeffs_split_crop(
    const char* data, size_t len, int ky, int kc, short* y_dc,
    signed char* y_ac, short* cb_dc, signed char* cb_ac, short* cr_dc,
    signed char* cr_ac, unsigned short* q_out, int y_bh, int y_bw, int c_bh,
    int c_bw, int y_br0, int y_bc0, int c_br0, int c_bc0);

extern "C" int dali_tpu_jpeg_huff_read_coeffs_split_crop_pack(
    const char* data, size_t len, int ky, int kc, short* y_dc,
    unsigned short* y_mask, signed char* y_vals, long long* y_nnz,
    short* cb_dc, short* cr_dc, unsigned short* c_mask, signed char* c_vals,
    long long* c_nnz, unsigned short* q_out, int y_bh, int y_bw, int c_bh,
    int c_bw, int y_br0, int y_bc0, int c_br0, int c_bc0);

extern "C" int dali_tpu_jpeg_huff_read_coeffs_split_crop_pack_idx(
    const char* data, size_t len, int ky, int kc, short* y_dc,
    unsigned short* y_mask, signed char* y_vals, long long* y_nnz,
    short* cb_dc, short* cr_dc, unsigned short* c_mask, signed char* c_vals,
    long long* c_nnz, unsigned short* q_out, int y_bh, int y_bw, int c_bh,
    int c_bw, int y_br0, int y_bc0, int c_br0, int c_bc0,
    unsigned char* idx_buf, long long idx_cap);

extern "C" void dali_tpu_jpeg_huff_read_coeffs_split_crop_pair(
    const char* a_data, size_t a_len, const char* b_data, size_t b_len,
    int ky, int kc,
    short* a_y_dc, signed char* a_y_ac, short* a_cb_dc, signed char* a_cb_ac,
    short* a_cr_dc, signed char* a_cr_ac, unsigned short* a_q,
    int a_y_bh, int a_y_bw, int a_c_bh, int a_c_bw,
    int a_y_br0, int a_y_bc0, int a_c_br0, int a_c_bc0,
    short* b_y_dc, signed char* b_y_ac, short* b_cb_dc, signed char* b_cb_ac,
    short* b_cr_dc, signed char* b_cr_ac, unsigned short* b_q,
    int b_y_bh, int b_y_bw, int b_c_bh, int b_c_bw,
    int b_y_br0, int b_y_bc0, int b_c_br0, int b_c_bc0,
    int* rc_a, int* rc_b);

namespace {
struct Img {
  std::vector<char> bytes;
  int h = 0, w = 0;
};

// minimal SOF scan for dims
bool dims(const std::vector<char>& b, int* h, int* w) {
  const auto* d = reinterpret_cast<const uint8_t*>(b.data());
  size_t n = b.size(), p = 2;
  while (p + 4 < n) {
    if (d[p] != 0xFF) { p++; continue; }
    uint8_t m = d[p + 1];
    p += 2;
    if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) continue;
    int L = (d[p] << 8) | d[p + 1];
    if (m == 0xC0 || m == 0xC1) {
      *h = (d[p + 3] << 8) | d[p + 4];
      *w = (d[p + 5] << 8) | d[p + 6];
      return true;
    }
    p += L;
  }
  return false;
}

struct Win { int ybh, ybw, cbh, cbw, ybr0, ybc0, cbr0, cbc0; };

uint64_t g_seed = 12345;
uint32_t rnd() {
  g_seed = g_seed * 6364136223846793005ull + 1442695040888963407ull;
  return (uint32_t)(g_seed >> 33);
}
double rnd01() { return (rnd() % 1000000) / 1000000.0; }

// Midrange window (r2/r3 legacy lane): ~0.55-0.9 linear, 16px-aligned, no halo
Win midrange_win(const Img& im) {
  int ch = (int)(im.h * (0.55 + 0.35 * rnd01())) / 16 * 16;
  int cw = (int)(im.w * (0.55 + 0.35 * rnd01())) / 16 * 16;
  if (ch < 16) ch = 16;
  if (cw < 16) cw = 16;
  int y0 = (int)((im.h - ch) * rnd01()) / 16 * 16;
  int x0 = (int)((im.w - cw) * rnd01()) / 16 * 16;
  return {ch / 8, cw / 8, ch / 16, cw / 16, y0 / 8, x0 / 8, y0 / 16, x0 / 16};
}

// Pipeline-identical RRC window: sample_rrc_windows_batch's rejection
// semantics (backend/decoders.py:301) + the decoder op's exact-margin MCU
// snap (decoders.py stage_batch_multi, mode 0, hybrid_scale=2 -> 4 px
// chroma-upsample margin; r4 replaced the legacy 1-MCU halo).
Win rrc_win(const Img& im) {
  const double area = (double)im.h * im.w;
  long ch = 0, cw = 0;
  bool ok = false;
  for (int a = 0; a < 10 && !ok; a++) {
    double ta = (0.08 + 0.92 * rnd01()) * area;
    double ar = std::exp(std::log(0.75) + (std::log(4.0 / 3) - std::log(0.75)) * rnd01());
    cw = lround(std::sqrt(ta * ar));
    ch = lround(std::sqrt(ta / ar));
    ok = cw > 0 && cw <= im.w && ch > 0 && ch <= im.h;
  }
  if (!ok) { ch = im.h; cw = im.w; }
  long y = (long)(rnd01() * std::max<long>(im.h - ch + 1, 1));
  long x = (long)(rnd01() * std::max<long>(im.w - cw + 1, 1));
  const int mcu = 16, m = 4;  // margin = 2*hybrid_scale(2)
  long y0 = (std::max(y - m, 0l) / mcu) * mcu;
  long x0 = (std::max(x - m, 0l) / mcu) * mcu;
  long y1 = ((y + ch + m + mcu - 1) / mcu) * mcu;
  long x1 = ((x + cw + m + mcu - 1) / mcu) * mcu;
  y1 = std::min(y1, ((long)(im.h + 7) / 8) * 8);  // full luma extent
  x1 = std::min(x1, ((long)(im.w + 7) / 8) * 8);
  y1 += (mcu - (y1 - y0) % mcu) % mcu;
  x1 += (mcu - (x1 - x0) % mcu) % mcu;
  return {(int)((y1 - y0) / 8), (int)((x1 - x0) / 8),
          (int)((y1 - y0) / 16), (int)((x1 - x0) / 16),
          (int)(y0 / 8), (int)(x0 / 8), (int)(y0 / 16), (int)(x0 / 16)};
}

struct Stat {
  double best = 1e30, sum = 0;
  int n = 0;
  void add(double us) { if (us < best) best = us; sum += us; n++; }
  double mean() const { return n ? sum / n : 0; }
};
}  // namespace

int main(int argc, char** argv) {
  const char* dir = argc > 1 ? argv[1] : "/tmp/dali_tpu_bench_data/class0";
  int nimg = argc > 2 ? atoi(argv[2]) : 256;
  int reps = argc > 3 ? atoi(argv[3]) : 12;
  bool run_pair = false;
  for (int i = 4; i < argc; i++)
    if (!strcmp(argv[i], "--pair")) run_pair = true;
  std::vector<Img> imgs;
  if (DIR* dp = opendir(dir)) {
    std::vector<std::string> names;
    while (dirent* e = readdir(dp))
      if (strstr(e->d_name, ".jpg")) names.push_back(e->d_name);
    closedir(dp);
    std::sort(names.begin(), names.end());
    for (auto& nm : names) {
      if ((int)imgs.size() >= nimg) break;
      std::string path = std::string(dir) + "/" + nm;
      FILE* f = fopen(path.c_str(), "rb");
      if (!f) continue;
      fseek(f, 0, SEEK_END);
      long sz = ftell(f);
      fseek(f, 0, SEEK_SET);
      Img im;
      im.bytes.resize(sz);
      if (fread(im.bytes.data(), 1, sz, f) != (size_t)sz) { fclose(f); continue; }
      fclose(f);
      if (dims(im.bytes, &im.h, &im.w)) imgs.push_back(std::move(im));
    }
  }
  if (imgs.empty()) { fprintf(stderr, "no images in %s\n", dir); return 1; }

  const int ky = 4, kc = 4;
  std::vector<short> ydc(1 << 16), cdc(1 << 15), crdc(1 << 15);
  std::vector<signed char> yac((1 << 16) * (ky * ky - 1)),
      cac((1 << 15) * (kc * kc - 1)), crac((1 << 15) * (kc * kc - 1));
  unsigned short q[128];
  std::vector<unsigned short> ymask(1 << 16), cmask(1 << 16);
  std::vector<signed char> yvals((1 << 16) * (ky * ky - 1)),
      cvals((1 << 16) * (kc * kc - 1));

  // per-image pre-sampled windows so every lane decodes identical work
  std::vector<Win> wins_mid(imgs.size()), wins_rrc(imgs.size());
  for (size_t i = 0; i < imgs.size(); i++) wins_mid[i] = midrange_win(imgs[i]);
  for (size_t i = 0; i < imgs.size(); i++) wins_rrc[i] = rrc_win(imgs[i]);

  auto chk_planes = [&](const Win& w, const short* dc, const signed char* ac) {
    long long s = 0;
    for (long i = 0; i < (long)w.ybh * w.ybw; i++) s += dc[i] * (i % 31 + 1);
    for (long i = 0; i < (long)w.ybh * w.ybw * (ky * ky - 1); i += 7) s += ac[i];
    return s;
  };

  auto dense_rep = [&](const std::vector<Win>& wins, long long* chk) {
    long long c = 0;
    auto t0 = std::chrono::steady_clock::now();
    for (size_t i = 0; i < imgs.size(); i++) {
      const Win& w = wins[i];
      int rc = dali_tpu_jpeg_huff_read_coeffs_split_crop(
          imgs[i].bytes.data(), imgs[i].bytes.size(), ky, kc, ydc.data(),
          yac.data(), cdc.data(), cac.data(), crdc.data(), crac.data(), q,
          w.ybh, w.ybw, w.cbh, w.cbw, w.ybr0, w.ybc0, w.cbr0, w.cbc0);
      if (rc) { fprintf(stderr, "decode rc=%d\n", rc); exit(1); }
      c += chk_planes(w, ydc.data(), yac.data());
    }
    *chk = c;
    return std::chrono::duration<double, std::micro>(
               std::chrono::steady_clock::now() - t0).count() / imgs.size();
  };

  // per-image ROI decode-index blobs for the idx lane (filled on first use)
  std::vector<std::vector<unsigned char>> idx_blobs(imgs.size());

  auto pack_rep = [&](const std::vector<Win>& wins, long long* chk,
                      bool use_idx) {
    long long c = 0;
    auto t0 = std::chrono::steady_clock::now();
    for (size_t i = 0; i < imgs.size(); i++) {
      const Win& w = wins[i];
      unsigned char* ib = nullptr;
      long long icap = 0;
      if (use_idx) {
        auto& blob = idx_blobs[i];
        if (blob.empty()) {
          long long mx = (imgs[i].w + 15) / 16, my = (imgs[i].h + 15) / 16;
          blob.assign(16 + (mx * my + 1) * 24, 0);
        }
        ib = blob.data();
        icap = (long long)blob.size();
      }
      long long ynnz = 0, cnnz = 0;
      int rc = dali_tpu_jpeg_huff_read_coeffs_split_crop_pack_idx(
          imgs[i].bytes.data(), imgs[i].bytes.size(), ky, kc, ydc.data(),
          ymask.data(), yvals.data(), &ynnz, cdc.data(), crdc.data(),
          cmask.data(), cvals.data(), &cnnz, q, w.ybh, w.ybw, w.cbh, w.cbw,
          w.ybr0, w.ybc0, w.cbr0, w.cbc0, ib, icap);
      if (rc) { fprintf(stderr, "pack rc=%d\n", rc); exit(1); }
      // dc checksum + value-stream checksum (mask-order values; different
      // convention than the dense lane so no cross-lane parity on AC)
      for (long j = 0; j < (long)w.ybh * w.ybw; j++)
        c += ydc[j] * (j % 31 + 1);
      for (long long j = 0; j < ynnz; j += 7) c += yvals[j];
      c += ynnz * 131 + cnnz * 17;
    }
    *chk = c;
    return std::chrono::duration<double, std::micro>(
               std::chrono::steady_clock::now() - t0).count() / imgs.size();
  };

  Stat mid, drrc, prrc, pidx;
  long long chk_mid = 0, chk_drrc = 0, chk_prrc = 0, chk_pidx = 0, c;
  long long idx_syms = 0, idx_blocks = 0;  // -DDALI_TPU_COUNT_SYMS builds
  for (int r = 0; r < reps; r++) {
    mid.add(dense_rep(wins_mid, &c));
    if (r == 0) chk_mid = c; else if (c != chk_mid) { fprintf(stderr, "mid chk drift\n"); return 1; }
    drrc.add(dense_rep(wins_rrc, &c));
    if (r == 0) chk_drrc = c; else if (c != chk_drrc) { fprintf(stderr, "drrc chk drift\n"); return 1; }
    prrc.add(pack_rep(wins_rrc, &c, false));
    if (r == 0) chk_prrc = c; else if (c != chk_prrc) { fprintf(stderr, "prrc chk drift\n"); return 1; }
    // idx lane: rep 0 fills the per-file index (cold, EXCLUDED from the
    // stat), later reps seek (warm — the steady state of epoch 2+
    // training). Checksum must match pack-rrc.
    {
      long long sc[2];
      dali_tpu_scan_syms(sc, 1);  // isolate this rep's store-phase count
      double us = pack_rep(wins_rrc, &c, true);
      dali_tpu_scan_syms(sc, 0);
      if (r > 0) pidx.add(us);
      if (sc[0]) idx_syms = sc[0], idx_blocks = sc[1];
    }
    if (c != chk_prrc) { fprintf(stderr, "pidx chk != prrc\n"); return 1; }
    if (r == 0) chk_pidx = c;
  }
  printf("%zu imgs, dense-mid best %.1f mean %.1f us/img (%.0f img/s/core) [chk %lld]\n",
         imgs.size(), mid.best, mid.mean(), 1e6 / mid.best, chk_mid);
  printf("%zu imgs, dense-rrc best %.1f mean %.1f us/img (%.0f img/s/core) [chk %lld]\n",
         imgs.size(), drrc.best, drrc.mean(), 1e6 / drrc.best, chk_drrc);
  printf("%zu imgs, pack-rrc  best %.1f mean %.1f us/img (%.0f img/s/core) [chk %lld]\n",
         imgs.size(), prrc.best, prrc.mean(), 1e6 / prrc.best, chk_prrc);
  if (pidx.n > 0) {
    printf("%zu imgs, pack-rrc-idx best %.1f warm-mean %.1f us/img (%.0f img/s/core) [chk %lld]\n",
           imgs.size(), pidx.best, pidx.mean(), 1e6 / pidx.best, chk_pidx);
    if (idx_syms)  // entropy-scan floor analysis (docs/performance.md r5)
      printf("  warm store-phase: %.0f syms/img, %.1f blocks/img, "
             "%.1f syms/block, best %.1f ns/sym\n",
             (double)idx_syms / imgs.size(), (double)idx_blocks / imgs.size(),
             (double)idx_syms / idx_blocks,
             pidx.best * 1e3 * imgs.size() / idx_syms);
  } else {
    printf("pack-rrc-idx: needs reps >= 2 (rep 0 builds the index cold; "
           "warm seeks are the stat)\n");
  }

  if (run_pair) {
    std::vector<short> ydc2(1 << 16), cdc2(1 << 15), crdc2(1 << 15);
    std::vector<signed char> yac2((1 << 16) * (ky * ky - 1)),
        cac2((1 << 15) * (kc * kc - 1)), crac2((1 << 15) * (kc * kc - 1));
    unsigned short q2[128];
    Stat pair;
    long long chk_pair = 0, chk_seq_mid = chk_mid;
    for (int r = 0; r < reps; r++) {
      long long c2 = 0;
      auto t0 = std::chrono::steady_clock::now();
      for (size_t i = 0; i + 1 < imgs.size(); i += 2) {
        auto &ia = imgs[i], &ib = imgs[i + 1];
        const Win &wa = wins_mid[i], &wb = wins_mid[i + 1];
        int ra, rb;
        dali_tpu_jpeg_huff_read_coeffs_split_crop_pair(
            ia.bytes.data(), ia.bytes.size(), ib.bytes.data(), ib.bytes.size(),
            ky, kc, ydc.data(), yac.data(), cdc.data(), cac.data(), crdc.data(),
            crac.data(), q, wa.ybh, wa.ybw, wa.cbh, wa.cbw, wa.ybr0, wa.ybc0,
            wa.cbr0, wa.cbc0, ydc2.data(), yac2.data(), cdc2.data(), cac2.data(),
            crdc2.data(), crac2.data(), q2, wb.ybh, wb.ybw, wb.cbh, wb.cbw,
            wb.ybr0, wb.ybc0, wb.cbr0, wb.cbc0, &ra, &rb);
        if (ra || rb) { fprintf(stderr, "pair rc=%d,%d\n", ra, rb); return 1; }
        c2 += chk_planes(wa, ydc.data(), yac.data());
        c2 += chk_planes(wb, ydc2.data(), yac2.data());
      }
      if (imgs.size() & 1) {
        size_t i = imgs.size() - 1;
        const Win& w = wins_mid[i];
        dali_tpu_jpeg_huff_read_coeffs_split_crop(
            imgs[i].bytes.data(), imgs[i].bytes.size(), ky, kc, ydc.data(),
            yac.data(), cdc.data(), cac.data(), crdc.data(), crac.data(), q,
            w.ybh, w.ybw, w.cbh, w.cbw, w.ybr0, w.ybc0, w.cbr0, w.cbc0);
        c2 += chk_planes(w, ydc.data(), yac.data());
      }
      pair.add(std::chrono::duration<double, std::micro>(
                   std::chrono::steady_clock::now() - t0).count() / imgs.size());
      chk_pair = c2;
    }
    printf("%zu imgs, pair(mid) best %.1f mean %.1f us/img [chk %lld]  %s\n",
           imgs.size(), pair.best, pair.mean(), chk_pair,
           chk_seq_mid == chk_pair ? "PARITY" : "MISMATCH");
  }
  return 0;
}
