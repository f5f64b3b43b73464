// Host-side batch staging helpers — the analogue of the reference's C++ batch
// copy paths (dali/pipeline/data/tensor_list.cc contiguous copies, pinned
// staging) minus CUDA: one memcpy pass that pads ragged HWC samples into the
// staging canvas.

#include <algorithm>
#include <atomic>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// samples: n pointers to HWC uint8 buffers; shapes: n*3 longs (h, w, c).
// out: n * ch * cw * cc canvas (pre-filled with `fill` by the caller or here).
int dali_tpu_pad_stack_u8(void** samples, const long* shapes, int n,
                          unsigned char* out, long ch, long cw, long cc,
                          int fill, int num_threads) {
  const long sample_bytes = ch * cw * cc;
  auto work = [&](int i) {
    const long h = shapes[3 * i], w = shapes[3 * i + 1], c = shapes[3 * i + 2];
    if (h > ch || w > cw || c > cc) return false;
    unsigned char* dst = out + (long)i * sample_bytes;
    const unsigned char* src = static_cast<const unsigned char*>(samples[i]);
    const long row_bytes = w * c;
    const long dst_stride = cw * cc;
    if (c == cc) {
      for (long y = 0; y < h; ++y) {
        std::memcpy(dst + y * dst_stride, src + y * row_bytes, row_bytes);
      }
    } else {
      for (long y = 0; y < h; ++y) {
        for (long x = 0; x < w; ++x) {
          std::memcpy(dst + y * dst_stride + x * cc, src + y * row_bytes + x * c, c);
        }
      }
    }
    return true;
  };
  if (num_threads <= 1) {
    for (int i = 0; i < n; ++i)
      if (!work(i)) return -1;
    return 0;
  }
  std::atomic<int> next(0), bad(0);
  std::vector<std::thread> threads;
  int t = std::min(num_threads, n);
  threads.reserve(t);
  for (int k = 0; k < t; ++k) {
    threads.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < n) {
        if (!work(i)) bad.store(1);
      }
    });
  }
  for (auto& th : threads) th.join();
  return bad.load() ? -1 : 0;
}

}  // extern "C"
