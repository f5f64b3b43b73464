// Host staging arena — the mm::* analogue.
//
// Reference: include/dali/core/mm/memory_resource.h (memory_resource
// concept, upstream/pinned kinds) + include/dali/core/mm/pool_resource.h
// (free-list pooling over an upstream resource) + mm::alloc_raw_unique's
// pinned staging use in the reader/transfer path. CUDA pinned memory has
// no TPU meaning, but the problem it solves is identical on a TPU host:
// multi-MB per-batch staging buffers (the packed coefficient wire, padded
// canvases) must not pay mmap/munmap churn and first-touch page-fault
// storms every iteration, and their pages should stay resident while an
// async H2D writer (PCIe DMA engine / tunnel client thread) reads them.
//
// Design: size-class free lists (power-of-two classes from 4 KiB) over
// aligned OS blocks, a pooled-bytes cap with LRU-free trimming, optional
// best-effort mlock() of every block ("pinned"), and counters exposed to
// Python (executor_statistics()["staging_arena"]). Thread-safe: one mutex
// — alloc/free are microseconds-rare (per batch, not per sample).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <new>
#include <unordered_map>
#include <vector>

#if defined(__unix__) || defined(__APPLE__)
#include <sys/mman.h>
#define DALI_TPU_HAVE_MLOCK 1
#endif

namespace {

constexpr uint64_t kMagic = 0x44414c49415245ull;  // "DALIARE"
constexpr size_t kMinClass = 4096;
constexpr size_t kHeader = 64;  // keeps user pointers 64-byte aligned

struct BlockHdr {
  uint64_t magic;
  uint64_t cls_bytes;  // size-class payload capacity (excl. header)
};

size_t round_class(size_t bytes) {
  size_t c = kMinClass;
  while (c < bytes) c <<= 1;
  return c;
}

struct Arena {
  std::mutex mu;
  long long max_pooled;
  bool pin;
  // free lists per size class (key = class bytes)
  std::unordered_map<size_t, std::vector<void*>> free_lists;  // base ptrs
  long long pooled_bytes = 0;
  long long in_use_bytes = 0;
  long long in_use_blocks = 0;
  long long pinned_bytes = 0;
  long long alloc_calls = 0;
  long long reuse_hits = 0;
  long long os_allocs = 0;
  long long os_frees = 0;

  ~Arena() {
    for (auto& kv : free_lists)
      for (void* base : kv.second) release(base, kv.first);
  }

  void release(void* base, size_t cls) {
#ifdef DALI_TPU_HAVE_MLOCK
    if (pin) munlock(base, kHeader + cls);
#endif
    std::free(base);
    os_frees++;
  }

  void* alloc(size_t bytes) {
    size_t cls = round_class(bytes);
    std::lock_guard<std::mutex> g(mu);
    alloc_calls++;
    void* base = nullptr;
    auto it = free_lists.find(cls);
    if (it != free_lists.end() && !it->second.empty()) {
      base = it->second.back();
      it->second.pop_back();
      pooled_bytes -= (long long)cls;
      reuse_hits++;
    } else {
      // C11: size must be a multiple of alignment — kHeader (64) + cls
      // (multiple of 4 KiB) is a multiple of 64, the alignment we promise.
      base = std::aligned_alloc(kHeader, kHeader + cls);
      if (!base) return nullptr;
      os_allocs++;
#ifdef DALI_TPU_HAVE_MLOCK
      if (pin && mlock(base, kHeader + cls) == 0)
        pinned_bytes += (long long)(kHeader + cls);
#endif
      auto* h = new (base) BlockHdr{kMagic, (uint64_t)cls};
      (void)h;
    }
    in_use_bytes += (long long)cls;
    in_use_blocks++;
    return (char*)base + kHeader;
  }

  int free_block(void* p) {
    if (!p) return 1;
    void* base = (char*)p - kHeader;
    BlockHdr h;
    std::memcpy(&h, base, sizeof(h));
    if (h.magic != kMagic) return 1;  // not ours / double-offset
    size_t cls = (size_t)h.cls_bytes;
    std::lock_guard<std::mutex> g(mu);
    in_use_bytes -= (long long)cls;
    in_use_blocks--;
    if (pooled_bytes + (long long)cls > max_pooled) {
      release(base, cls);
      return 0;
    }
    free_lists[cls].push_back(base);
    pooled_bytes += (long long)cls;
    return 0;
  }

  // Drop pooled blocks until pooled_bytes <= keep_bytes.
  void trim(long long keep_bytes) {
    std::lock_guard<std::mutex> g(mu);
    for (auto& kv : free_lists) {
      while (!kv.second.empty() && pooled_bytes > keep_bytes) {
        release(kv.second.back(), kv.first);
        kv.second.pop_back();
        pooled_bytes -= (long long)kv.first;
      }
    }
  }
};

}  // namespace

extern "C" {

void* dali_tpu_arena_create(long long max_pooled_bytes, int pin) {
  auto* a = new Arena();
  a->max_pooled = max_pooled_bytes;
  a->pin = pin != 0;
  return a;
}

void dali_tpu_arena_destroy(void* arena) { delete (Arena*)arena; }

void* dali_tpu_arena_alloc(void* arena, long long bytes) {
  if (!arena || bytes <= 0) return nullptr;
  return ((Arena*)arena)->alloc((size_t)bytes);
}

int dali_tpu_arena_free(void* arena, void* p) {
  if (!arena) return 1;
  return ((Arena*)arena)->free_block(p);
}

void dali_tpu_arena_trim(void* arena, long long keep_bytes) {
  if (arena) ((Arena*)arena)->trim(keep_bytes);
}

// out[9]: in_use_bytes, in_use_blocks, pooled_bytes, pinned_bytes,
//         alloc_calls, reuse_hits, os_allocs, os_frees, max_pooled
void dali_tpu_arena_stats(void* arena, long long* out) {
  if (!arena) return;
  auto* a = (Arena*)arena;
  std::lock_guard<std::mutex> g(a->mu);
  out[0] = a->in_use_bytes;
  out[1] = a->in_use_blocks;
  out[2] = a->pooled_bytes;
  out[3] = a->pinned_bytes;
  out[4] = a->alloc_calls;
  out[5] = a->reuse_hits;
  out[6] = a->os_allocs;
  out[7] = a->os_frees;
  out[8] = a->max_pooled;
}

}  // extern "C"
