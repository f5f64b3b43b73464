#!/usr/bin/env bash
# Tiered QA entry point (the reference's qa/TL0..TL3 shell-tier analogue).
# Each tier fails fast; later tiers assume earlier ones are green.
#
#   TL0  unit + integration tests (virtual CPU mesh, no TPU needed)
#   TL1  native sanitizer fuzz gate (ASan + UBSan, mutation corpora)
#   TL2  executed examples (docs/examples/* on synthetic data)
#   TL3  multichip dry-run + performance gate (monotonic thresholds)
#
# Usage: bash qa/run_all.sh [max_tier]   (default 3)
set -euo pipefail
cd "$(dirname "$0")/.."
MAX=${1:-3}

echo "=== TL0: test suite ==="
python -m pytest tests/ -x -q

if [ "$MAX" -ge 1 ]; then
  echo "=== TL1: sanitizer fuzz gate ==="
  bash qa/asan_fuzz.sh
fi

if [ "$MAX" -ge 2 ]; then
  echo "=== TL2: examples gate ==="
  bash qa/run_examples.sh
fi

if [ "$MAX" -ge 3 ]; then
  echo "=== TL3: multi-process JAX iterator (2 procs x 4 devices) ==="
  PALLAS_AXON_POOL_IPS= python tools/multiprocess_test.py
  echo "=== TL3: multichip dry-run ==="
  XLA_FLAGS="--xla_force_host_platform_device_count=8" JAX_PLATFORMS=cpu \
    PALLAS_AXON_POOL_IPS= \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('multichip ok')"
  echo "=== TL3: perf gate ==="
  python qa/perf_gate.py
fi

echo "ALL QA TIERS GREEN (<= TL$MAX)"
