// Microbenchmark for the from-scratch JPEG Huffman coefficient decoder
// (native/src/jpeg_huff.cc). Feeds it the bench corpus with RN50-style
// RandomResizedCrop windows and reports us/img for the crop-bounded
// coefficient read — the host-side hot loop of the hybrid decode path.
//
// Build+run:
//   g++ -O3 -march=native -std=c++17 tools/bench_huff.cc \
//       dali_tpu/native/src/jpeg_huff.cc -o /tmp/bench_huff
//   /tmp/bench_huff /tmp/dali_tpu_bench_data/class0 256 12
#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dirent.h>
#include <string>
#include <vector>

extern "C" int dali_tpu_jpeg_huff_read_coeffs_split_crop(
    const char* data, size_t len, int ky, int kc, short* y_dc,
    signed char* y_ac, short* cb_dc, signed char* cb_ac, short* cr_dc,
    signed char* cr_ac, unsigned short* q_out, int y_bh, int y_bw, int c_bh,
    int c_bw, int y_br0, int y_bc0, int c_br0, int c_bc0);

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
}  // namespace

int main(int argc, char** argv) {
  const char* dir = argc > 1 ? argv[1] : "/tmp/dali_tpu_bench_data/class0";
  int nimg = argc > 2 ? atoi(argv[2]) : 256;
  int reps = argc > 3 ? atoi(argv[3]) : 12;
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
  uint64_t seed = 12345;
  auto rnd = [&]() { seed = seed * 6364136223846793005ull + 1442695040888963407ull; return (uint32_t)(seed >> 33); };

  // per-image pre-sampled windows so both modes decode identical work
  struct Win { int ybh, ybw, cbh, cbw, ybr0, ybc0, cbr0, cbc0; };
  std::vector<Win> wins(imgs.size());
  for (size_t i = 0; i < imgs.size(); i++) {
    auto& im = imgs[i];
    // RN50 RRC-ish window: ~0.08-1.0 area, here mid-range 0.5-0.9 linear,
    // 16px-aligned origin (matches the decoder op's MCU snap)
    int ch = (int)(im.h * (0.55 + 0.35 * (rnd() % 1000) / 1000.0)) / 16 * 16;
    int cw = (int)(im.w * (0.55 + 0.35 * (rnd() % 1000) / 1000.0)) / 16 * 16;
    if (ch < 16) ch = 16;
    if (cw < 16) cw = 16;
    int y0 = (int)((im.h - ch) * (rnd() % 1000) / 1000.0) / 16 * 16;
    int x0 = (int)((im.w - cw) * (rnd() % 1000) / 1000.0) / 16 * 16;
    wins[i] = {ch / 8, cw / 8, ch / 16, cw / 16,
               y0 / 8, x0 / 8, y0 / 16, x0 / 16};
  }
  // second plane set for the pair path
  std::vector<short> ydc2(1 << 16), cdc2(1 << 15), crdc2(1 << 15);
  std::vector<signed char> yac2((1 << 16) * (ky * ky - 1)),
      cac2((1 << 15) * (kc * kc - 1)), crac2((1 << 15) * (kc * kc - 1));
  unsigned short q2[128];

  auto chk_planes = [&](const Win& w, const short* dc, const signed char* ac) {
    long long s = 0;
    for (long i = 0; i < (long)w.ybh * w.ybw; i++) s += dc[i] * (i % 31 + 1);
    for (long i = 0; i < (long)w.ybh * w.ybw * (ky * ky - 1); i += 7) s += ac[i];
    return s;
  };

  double best_seq = 1e30, best_pair = 1e30;
  long long chk_seq = 0, chk_pair = 0;
  for (int r = 0; r < reps; r++) {
    // sequential
    long long c1 = 0;
    auto t0 = std::chrono::steady_clock::now();
    for (size_t i = 0; i < imgs.size(); i++) {
      auto& im = imgs[i];
      const Win& w = wins[i];
      int rc = dali_tpu_jpeg_huff_read_coeffs_split_crop(
          im.bytes.data(), im.bytes.size(), ky, kc, ydc.data(), yac.data(),
          cdc.data(), cac.data(), crdc.data(), crac.data(), q, w.ybh, w.ybw,
          w.cbh, w.cbw, w.ybr0, w.ybc0, w.cbr0, w.cbc0);
      if (rc) { fprintf(stderr, "decode rc=%d\n", rc); return 1; }
      c1 += chk_planes(w, ydc.data(), yac.data());
    }
    double us = std::chrono::duration<double, std::micro>(
                    std::chrono::steady_clock::now() - t0)
                    .count() /
                imgs.size();
    if (us < best_seq) best_seq = us;
    chk_seq = c1;

    // pair-interleaved
    long long c2 = 0;
    t0 = std::chrono::steady_clock::now();
    for (size_t i = 0; i + 1 < imgs.size(); i += 2) {
      auto &ia = imgs[i], &ib = imgs[i + 1];
      const Win &wa = wins[i], &wb = wins[i + 1];
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
    if (imgs.size() & 1) {  // odd tail: single path
      size_t i = imgs.size() - 1;
      const Win& w = wins[i];
      dali_tpu_jpeg_huff_read_coeffs_split_crop(
          imgs[i].bytes.data(), imgs[i].bytes.size(), ky, kc, ydc.data(),
          yac.data(), cdc.data(), cac.data(), crdc.data(), crac.data(), q,
          w.ybh, w.ybw, w.cbh, w.cbw, w.ybr0, w.ybc0, w.cbr0, w.cbc0);
      c2 += chk_planes(w, ydc.data(), yac.data());
    }
    us = std::chrono::duration<double, std::micro>(
             std::chrono::steady_clock::now() - t0)
             .count() /
         imgs.size();
    if (us < best_pair) best_pair = us;
    chk_pair = c2;
  }
  printf("%zu imgs, seq  best %.1f us/img (%.0f img/s/core) [chk %lld]\n",
         imgs.size(), best_seq, 1e6 / best_seq, chk_seq);
  printf("%zu imgs, pair best %.1f us/img (%.0f img/s/core) [chk %lld]  %s\n",
         imgs.size(), best_pair, 1e6 / best_pair, chk_pair,
         chk_seq == chk_pair ? "PARITY" : "MISMATCH");
  return 0;
}
