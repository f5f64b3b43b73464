// ASAN/UBSAN harness over the native parsers (the BUILD_FUZZING analogue,
// reference dali/fuzzing/image_decoder_target.cc): deterministic xorshift
// mutation corpus driven through the from-scratch Huffman decoder, the
// libjpeg coefficient path, and the FFmpeg audio decode. Build + run via
// qa/asan_fuzz.sh; any sanitizer report is a failure.
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {
long dali_tpu_jpeg_encode_rgb(const unsigned char*, int, int, int, int, int,
                              int, unsigned char*, long);
int dali_tpu_jpeg_huff_progressive_read_coeffs_split_crop(
    const char*, size_t, int, int, short*, signed char*, short*, signed char*,
    short*, signed char*, unsigned short*, int, int, int, int, int, int, int,
    int);
int dali_tpu_jpeg_huff_read_coeffs_split_crop(const char*, size_t, int, int,
                                              short*, signed char*, short*,
                                              signed char*, short*,
                                              signed char*, unsigned short*,
                                              int, int, int, int, int, int,
                                              int, int);
int dali_tpu_jpeg_huff_read_coeffs_split_crop_pack(
    const char*, size_t, int, int, short*, unsigned short*, signed char*,
    long long*, short*, short*, unsigned short*, signed char*, long long*,
    unsigned short*, int, int, int, int, int, int, int, int);
int dali_tpu_jpeg_huff_read_coeffs_split_crop_pack_idx(
    const char*, size_t, int, int, short*, unsigned short*, signed char*,
    long long*, short*, short*, unsigned short*, signed char*, long long*,
    unsigned short*, int, int, int, int, int, int, int, int, unsigned char*,
    long long);
int dali_tpu_jpeg_read_coeffs_split_crop(const char*, size_t, int, int, short*,
                                         signed char*, short*, signed char*,
                                         short*, signed char*, unsigned short*,
                                         int, int, int, int, int, int, int,
                                         int);
void* dali_tpu_arena_create(long long, int);
void dali_tpu_arena_destroy(void*);
void* dali_tpu_arena_alloc(void*, long long);
int dali_tpu_arena_free(void*, void*);
void dali_tpu_arena_trim(void*, long long);
void dali_tpu_arena_stats(void*, long long*);
#ifdef HAVE_AUDIO
long dali_tpu_audio_encode(const float*, long, int, int, const char*,
                           unsigned char*, long);
int dali_tpu_audio_decode(const unsigned char*, size_t, float**, long*, int*,
                          double*);
void dali_tpu_audio_buffer_free(float*);
#endif
#ifdef HAVE_VIDEO
void* dali_tpu_video_open(const char*);
int dali_tpu_video_info(void*, int*, int*, long*, double*);
int dali_tpu_video_pixfmt_class(void*);
int dali_tpu_video_read_frames(void*, long, int, int, unsigned char*);
int dali_tpu_video_read_frames_yuv(void*, long, int, int, unsigned char*,
                                   unsigned char*, unsigned char*);
void dali_tpu_video_close(void*);
#endif
}

static uint64_t rng_state = 0x9E3779B97F4A7C15ull;
static uint64_t xrand() {
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 7;
  rng_state ^= rng_state << 17;
  return rng_state;
}

static void mutate(std::vector<unsigned char>& buf,
                   const std::vector<unsigned char>& base, int kind) {
  buf = base;
  size_t n = buf.size();
  switch (kind % 4) {
    case 0:  // truncate
      buf.resize(xrand() % (n + 1));
      break;
    case 1:  // flip bytes
      for (int i = 0; i < 8; i++) buf[xrand() % n] ^= (unsigned char)(xrand() & 0xFF);
      break;
    case 2: {  // stomp a dword
      size_t pos = xrand() % (n > 4 ? n - 4 : 1);
      uint32_t v = (uint32_t)xrand();
      std::memcpy(buf.data() + pos, &v, 4);
      break;
    }
    default: {  // duplicate a slice
      size_t lo = xrand() % n, len = xrand() % 64;
      if (lo + len > n) len = n - lo;
      buf.insert(buf.end(), buf.begin() + lo, buf.begin() + lo + len);
    }
  }
}

int main() {
  // base JPEG
  int H = 96, W = 112;
  std::vector<unsigned char> img(H * W * 3);
  for (size_t i = 0; i < img.size(); i++) img[i] = (unsigned char)(xrand() & 0xFF);
  std::vector<unsigned char> jpg(H * W * 3 + 65536);
  long n = dali_tpu_jpeg_encode_rgb(img.data(), H, W, 85, 0, 4, 0, jpg.data(),
                                    (long)jpg.size());
  if (n <= 0) { printf("encode failed\n"); return 1; }
  jpg.resize(n);

  int ybh = 12, ybw = 14, cbh = 6, cbw = 7;
  std::vector<short> ydc(ybh * ybw), cbdc(cbh * cbw), crdc(cbh * cbw);
  std::vector<signed char> yac(ybh * ybw * 15), cbac(cbh * cbw * 15),
      crac(cbh * cbw * 15);
  std::vector<unsigned short> q(32);
  std::vector<unsigned char> mut;
  const int N = 4000;
  for (int i = 0; i < N; i++) {
    mutate(mut, jpg, i);
    dali_tpu_jpeg_huff_read_coeffs_split_crop(
        (const char*)mut.data(), mut.size(), 4, 4, ydc.data(), yac.data(),
        cbdc.data(), cbac.data(), crdc.data(), crac.data(), q.data(), ybh, ybw,
        cbh, cbw, 2, 2, 1, 1);
    if (i % 3 == 0) {  // pack-emit entry (zigzag masks + value streams)
      std::vector<unsigned short> ym(ybh * ybw), cm(2 * cbh * cbw);
      std::vector<signed char> yv(ybh * ybw * 15 + 16), cv(2 * cbh * cbw * 15 + 16);
      long long ynnz = 0, cnnz = 0;
      dali_tpu_jpeg_huff_read_coeffs_split_crop_pack(
          (const char*)mut.data(), mut.size(), 4, 4, ydc.data(), ym.data(),
          yv.data(), &ynnz, cbdc.data(), crdc.data(), cm.data(), cv.data(),
          &cnnz, q.data(), ybh, ybw, cbh, cbw, 2, 2, 1, 1);
      // ROI decode-index path: decode a mutated stream cold (records index
      // entries from corrupt data), then again warm (SEEKS through them),
      // and once with the blob itself stomped — every seek must stay
      // bounds-checked regardless of blob content.
      long long mx = (W + 15) / 16, my = (H + 15) / 16;
      std::vector<unsigned char> blob(16 + (mx * my + 1) * 24, 0);
      for (int pass = 0; pass < 3; pass++) {
        if (pass == 2)
          for (int s = 0; s < 16; s++)
            blob[xrand() % blob.size()] ^= (unsigned char)(xrand() & 0xFF);
        dali_tpu_jpeg_huff_read_coeffs_split_crop_pack_idx(
            (const char*)mut.data(), mut.size(), 4, 4, ydc.data(), ym.data(),
            yv.data(), &ynnz, cbdc.data(), crdc.data(), cm.data(), cv.data(),
            &cnnz, q.data(), ybh, ybw, cbh, cbw, 2, 2, 1, 1, blob.data(),
            (long long)blob.size());
      }
    }
    if (i % 5 == 0) {
      dali_tpu_jpeg_read_coeffs_split_crop(
          (const char*)mut.data(), mut.size(), 4, 4, ydc.data(), yac.data(),
          cbdc.data(), cbac.data(), crdc.data(), crac.data(), q.data(), ybh,
          ybw, cbh, cbw, 0, 0, 0, 0);
    }
  }
  printf("jpeg fuzz: %d mutations OK\n", N);

  // progressive (SOF2) base: the multi-scan walker + AC refine state machine
  std::vector<unsigned char> pjpg(H * W * 3 + 65536);
  long pn = dali_tpu_jpeg_encode_rgb(img.data(), H, W, 85, 0, 4, 1,
                                     pjpg.data(), (long)pjpg.size());
  if (pn > 0) {
    pjpg.resize(pn);
    for (int i = 0; i < 2000; i++) {
      mutate(mut, pjpg, i);
      dali_tpu_jpeg_huff_progressive_read_coeffs_split_crop(
          (const char*)mut.data(), mut.size(), 4, 4, ydc.data(), yac.data(),
          cbdc.data(), cbac.data(), crdc.data(), crac.data(), q.data(), ybh,
          ybw, cbh, cbw, 2, 2, 1, 1);
    }
    printf("progressive fuzz: 2000 mutations OK\n");
  }

  // arena torture: randomized alloc/free/trim interleave across size classes,
  // full-block writes (ASan redzones catch header/bounds bugs), leak check via
  // detect_leaks=1 at exit plus the arena's own in_use counter.
  {
    void* arena = dali_tpu_arena_create(1 << 20 /* tight cap forces OS frees */, 1);
    std::vector<void*> live;
    for (int i = 0; i < 20000; i++) {
      uint64_t r = xrand();
      if ((r % 3) != 0 || live.empty()) {
        long long sz = (long long)(1 + (r >> 8) % 300000);
        void* p = dali_tpu_arena_alloc(arena, sz);
        if (p) {
          std::memset(p, (int)(r & 0xFF), (size_t)sz);
          live.push_back(p);
        }
      } else {
        size_t k = (size_t)(r >> 16) % live.size();
        if (dali_tpu_arena_free(arena, live[k])) { printf("arena free failed\n"); return 1; }
        live[k] = live.back();
        live.pop_back();
      }
      if (i % 4096 == 0) dali_tpu_arena_trim(arena, (long long)(r % 65536));
    }
    for (void* p : live) dali_tpu_arena_free(arena, p);
    long long st[9];
    dali_tpu_arena_stats(arena, st);
    if (st[0] != 0 || st[1] != 0) { printf("arena leak: %lld bytes\n", st[0]); return 1; }
    dali_tpu_arena_trim(arena, 0);
    dali_tpu_arena_destroy(arena);
    printf("arena fuzz: 20000 ops OK\n");
  }

#ifdef HAVE_AUDIO
  std::vector<float> pcm(16000);
  for (size_t i = 0; i < pcm.size(); i++)
    pcm[i] = (float)((int64_t)(xrand() & 0xFFFF) - 0x8000) / 65536.0f;
  std::vector<unsigned char> flac(1 << 20);
  long fn_ = dali_tpu_audio_encode(pcm.data(), (long)pcm.size(), 1, 16000,
                                   "flac", flac.data(), (long)flac.size());
  if (fn_ > 0) {
    flac.resize(fn_);
    for (int i = 0; i < 600; i++) {
      mutate(mut, flac, i);
      float* out = nullptr;
      long frames;
      int ch;
      double rate;
      if (dali_tpu_audio_decode(mut.data(), mut.size(), &out, &frames, &ch,
                                &rate) == 0)
        dali_tpu_audio_buffer_free(out);
    }
    printf("audio fuzz: 600 mutations OK\n");
  }
#endif
#ifdef HAVE_VIDEO
  // video decoder torture (reference dali/fuzzing/image_decoder_target.cc
  // pattern, applied to the container path): mutated mp4s from the
  // checked-in corpus driven through open -> info -> random seek patterns
  // over BOTH read entries (RGB via yuv420/sws fallback, and the planar
  // YUV wire path). The handle/seek/plane-copy logic around FFmpeg is the
  // repo's own (video_decode.cc) — corrupt metadata must never turn into
  // out-of-bounds plane copies, null-sws derefs, or UB int casts.
  {
    FILE* bf = fopen("qa/corpus/video_base.mp4", "rb");
    if (!bf) { printf("video corpus missing\n"); return 1; }
    std::vector<unsigned char> mp4;
    unsigned char tmp[4096];
    size_t r;
    while ((r = fread(tmp, 1, sizeof tmp, bf)) > 0)
      mp4.insert(mp4.end(), tmp, tmp + r);
    fclose(bf);
    const char* path = "/tmp/dali_tpu_video_fuzz.mp4";
    int opened = 0;
    for (int i = 0; i < 300; i++) {
      mutate(mut, mp4, i);
      FILE* wf = fopen(path, "wb");
      if (!wf) { printf("video fuzz tmp write failed\n"); return 1; }
      fwrite(mut.data(), 1, mut.size(), wf);
      fclose(wf);
      void* h = dali_tpu_video_open(path);
      if (!h) continue;  // rejected: exactly what corrupt input should do
      opened++;
      int w = 0, hh = 0;
      long nf = 0;
      double fps = 0;
      dali_tpu_video_info(h, &w, &hh, &nf, &fps);
      if (w > 0 && hh > 0 && w <= 4096 && hh <= 4096) {
        const int SEQ = 4;
        std::vector<unsigned char> rgb((size_t)SEQ * hh * w * 3);
        std::vector<unsigned char> y((size_t)SEQ * hh * w);
        std::vector<unsigned char> u((size_t)SEQ * ((hh + 1) / 2) * ((w + 1) / 2));
        std::vector<unsigned char> vpl(u.size());
        for (int s = 0; s < 4; s++) {
          // random start incl. far past EOF and backwards (forces seeks),
          // strides 1-3
          // modulus in uint64 (2*nf+4 in signed long is UB when mutated
          // metadata inflates nf), capped so `start` stays a sane long
          // while still reaching far past EOF
          uint64_t mod = nf > 0 ? (uint64_t)nf * 2 + 4 : 8;
          if (mod > (1ULL << 32)) mod = 1ULL << 32;
          long start = (long)(xrand() % mod);
          int stride = 1 + (int)(xrand() % 3);
          dali_tpu_video_read_frames(h, start, SEQ, stride, rgb.data());
          if (dali_tpu_video_pixfmt_class(h) != 0)
            dali_tpu_video_read_frames_yuv(h, start, SEQ, stride, y.data(),
                                           u.data(), vpl.data());
        }
      }
      dali_tpu_video_close(h);
    }
    remove(path);
    printf("video fuzz: 300 mutations OK (%d opened)\n", opened);
  }
#endif

  printf("NATIVE FUZZ OK\n");
  return 0;
}
