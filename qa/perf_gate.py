#!/usr/bin/env python
"""Performance gate (reference qa/TL1_decoder_perf/test.sh:52-68): runs the
headline benchmarks and FAILS (exit 1) below the thresholds.

Thresholds live in qa/thresholds.json, calibrated per host class (this dev
box has 1 CPU core and a bandwidth-constrained TPU tunnel; a production v5e
host would carry much higher gates — see docs/performance.md). Set to 0.9x
the measured steady-state numbers at calibration time.

Usage:
  python qa/perf_gate.py                # run bench.py, check thresholds
  python qa/perf_gate.py --from FILE    # check pre-recorded bench JSON lines
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def load_thresholds():
    with open(os.path.join(HERE, "thresholds.json")) as f:
        return json.load(f)


def collect_metrics(args):
    if len(args) >= 2 and args[0] == "--from":
        lines = open(args[1]).read().splitlines()
    else:
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             capture_output=True, text=True, timeout=1800)
        if out.returncode != 0:
            print(out.stderr, file=sys.stderr)
            print("FAIL: bench.py crashed")
            sys.exit(1)
        lines = out.stdout.splitlines()
    metrics = {}
    for line in lines:
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
                metrics[d["metric"]] = float(d["value"])
            except (ValueError, KeyError):
                pass
    return metrics


def main():
    thresholds = load_thresholds()
    metrics = collect_metrics(sys.argv[1:])
    failed = False
    for name, spec in thresholds.items():
        gate = float(spec["min"])
        got = metrics.get(name)
        if got is None:
            print(f"FAIL: metric '{name}' missing from bench output")
            failed = True
            continue
        status = "OK" if got >= gate else "FAIL"
        print(f"{status}: {name} = {got:.1f} (gate >= {gate:.1f} {spec.get('unit', '')})")
        if got < gate:
            failed = True
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
