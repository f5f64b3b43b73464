#!/usr/bin/env bash
# Examples gate (reference qa/TL0_jupyter runs all docs/examples notebooks):
# every script in docs/examples/ must execute end-to-end with its synthetic
# fallback on tiny configs. Runs on the CPU backend so the gate is hermetic
# (no TPU tunnel dependency) and under `timeout` per CLAUDE.md.
set -u
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=cpu
# Skip axon TPU plugin registration in every spawned interpreter: plugin init
# dials the shared tunnel, which is a hard hang when the tunnel is wedged.
export PALLAS_AXON_POOL_IPS=
# NOTE: virtual multi-device CPU (xla_force_host_platform_device_count) makes
# some XLA compiles pathologically slow (video resize: 33s -> 433s at n=2 on
# this box), so only the example that actually uses a mesh gets it.

fail=0
run() {
  local name="$1"; shift
  echo "== example: $name"
  if timeout 1200 python "docs/examples/$name" "$@" >/tmp/example_"$name".log 2>&1; then
    echo "   OK"
  else
    echo "   FAIL (tail of log):"
    tail -15 /tmp/example_"$name".log
    fail=1
  fi
}

XLA_FLAGS="--xla_force_host_platform_device_count=2" \
  run imagenet_training.py --batch-size 8 --steps 2
run asr_frontend.py
run ssd_detection.py --batch-size 4 --iters 2
run video_training.py --batch-size 2 --iters 2
run efficientnet_autoaugment.py --batch-size 4 --image-size 64 --steps 2 --augment auto
run pytorch_proxy_training.py
run webdataset_ingest.py --batch-size 4 --iters 2
run dynamic_mode.py
run conditionals.py
run expressions.py
run reductions_join.py
run checkpointing.py
run serialization.py
run external_input.py
run augmentation_gallery.py
run transforms_3d.py
run custom_operators.py
run debug_and_optical_flow.py
run audio_processing.py
run segmentation_training.py --batch-size 4 --iters 2
XLA_FLAGS="--xla_force_host_platform_device_count=2" \
  run framework_iterators.py

if [ "$fail" -ne 0 ]; then
  echo "EXAMPLES GATE: FAIL"
  exit 1
fi
echo "EXAMPLES GATE: OK"
