// Box-speed yardstick for the host-CPU perf gates (qa/perf_gate.py).
//
// The host-CPU lanes measure THREAD-CPU time of framework code, which removes
// descheduling but still couples to the box's effective per-cycle speed:
// frequency throttling, SMT siblings, cache pressure and hypervisor steal all
// move the same native code's cpu-time by up to ~22% day-over-day (measured:
// tools/bench_huff pack-rrc-idx best 240.9 -> 293.8 us/img on byte-identical
// jpeg_huff.cc; docs/performance.md "Box-speed normalization"). This program
// measures that box speed with a FIXED workload so the gate can compare
// framework numbers across regimes instead of widening its bands to cover
// them.
//
// The workload models the mechanism the flagship lanes are bound by — the
// entropy scan's serial dependent chain (L1 table load -> shift by the loaded
// length -> next index; see docs/performance.md "Entropy-scan attack") — as a
// pointer-chase over a 16 KB table (the kFastAc working set) with a short ALU
// tail per step. It is deliberately framework-independent and FROZEN: a
// regression in the live library cannot hide in the yardstick.
//
// Output: one JSON line {"chase_ns_cpu": best-of-reps ns/step on the thread
// CPU clock, "chase_ns_wall": same on the wall clock}.
//
// Build: g++ -O3 -march=native -std=c++17 qa/yardstick.cc -o yardstick

#include <cstdint>
#include <cstdio>
#include <ctime>

namespace {

constexpr int kTabBits = 12;  // 4096 x uint32 = 16 KB, the kFastAc footprint
constexpr uint32_t kTabMask = (1u << kTabBits) - 1;
constexpr int64_t kSteps = 1 << 23;  // ~25 ms per rep at ~3 ns/step
constexpr int kReps = 9;

double now_cpu_ns() {
  timespec ts;
  clock_gettime(CLOCK_THREAD_CPUTIME_ID, &ts);
  return ts.tv_sec * 1e9 + ts.tv_nsec;
}

double now_wall_ns() {
  timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec * 1e9 + ts.tv_nsec;
}

}  // namespace

int main() {
  // fixed pseudo-random table (xorshift32, seed pinned) — every run chases
  // the same sequence, so the step count per dependent load is identical
  static uint32_t tab[1u << kTabBits];
  uint32_t s = 0x9E3779B9u;
  for (auto& v : tab) {
    s ^= s << 13;
    s ^= s >> 17;
    s ^= s << 5;
    v = s;
  }

  double best_cpu = 1e30, best_wall = 1e30;
  volatile uint32_t sink = 0;
  for (int rep = 0; rep < kReps; rep++) {
    uint32_t idx = 1, acc = 0x85EBCA6Bu;
    double c0 = now_cpu_ns(), w0 = now_wall_ns();
    for (int64_t i = 0; i < kSteps; i++) {
      // the scan chain: L1 load -> consume a loaded-value-dependent shift ->
      // derive the next table index from the loaded value
      uint32_t v = tab[idx];
      acc += v >> (idx & 7);
      idx = (v ^ (acc >> 9)) & kTabMask;
    }
    double c1 = now_cpu_ns(), w1 = now_wall_ns();
    sink += idx + acc;
    double cpu = (c1 - c0) / kSteps, wall = (w1 - w0) / kSteps;
    if (cpu < best_cpu) best_cpu = cpu;
    if (wall < best_wall) best_wall = wall;
  }
  (void)sink;
  printf("{\"chase_ns_cpu\": %.4f, \"chase_ns_wall\": %.4f}\n", best_cpu,
         best_wall);
  return 0;
}
