#!/usr/bin/env python
"""Performance gate (reference qa/TL1_decoder_perf/test.sh:52-68): runs the
headline benchmarks and FAILS (exit 1) below the thresholds.

Thresholds live in qa/thresholds.json. The gate is MONOTONIC: each metric
records `best` (best steady-state measurement ever seen) alongside `min`,
and the effective gate is max(min, BAND * best). `best` may only go UP —
`--record` raises it after an improvement and refuses to lower it, so the
gate can never be recalibrated downward to follow a regression (the
reference keeps fixed hard gates the same way, TL1_decoder_perf/test.sh:64-66).

BAND is calibrated to this shared dev box's measured cross-run variance on
IDENTICAL code: image 1,891-2,186 img/s and audio 256-360 clips/s across
same-day runs (the torch-cpu yardstick itself swings 153-195 clips/s, so
the swing is the box, not the code). BAND = 0.75 keeps the gate above
every pre-improvement plateau while not flagging the box's own weather;
the monotone `best` still catches multi-round drift.

This dev box has 1 CPU core and a bandwidth-constrained TPU tunnel; a
production v5e host would carry much higher numbers — see docs/performance.md.

BOX-SPEED NORMALIZATION (round 5): the host-CPU lanes remove tunnel weather
but still couple to the box's per-cycle speed — hypervisor throttle/steal
moved byte-identical native decode code 240.9 → 293.8 µs/img (22%) between
same-week idle-box runs (docs/performance.md "Box-speed normalization").
Lanes marked `normalize_box_speed` are therefore CHECKED against the gate
after scaling by a same-run yardstick (qa/yardstick.cc — a frozen dependent-
load chase modeling the entropy scan's serial chain): factor =
chase_ns_now / chase_ns_cal, clamped to [1.0, 1.3]. The clamp bounds the
maximum leniency; the RAW value is what `--record` ratchets (a fast box or a
mis-tracking yardstick can never inflate `best`), and raw values are always
printed alongside. The yardstick is frozen source, so a regression in the
live library cannot hide in it.

Usage:
  python qa/perf_gate.py                # run bench.py, check thresholds
  python qa/perf_gate.py --from FILE    # check pre-recorded bench JSON lines
  python qa/perf_gate.py --record --from FILE   # also ratchet `best` upward
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


def measure_box_speed(spec):
    """Run the shared yardstick measurement (qa/boxspeed.py, one protocol for
    the gate and bench.py's context line); return the normalization factor
    chase_ns_now / chase_ns_cal clamped to [1.0, 1.3], plus the raw chase_ns.
    Returns (1.0, None) if the yardstick cannot run (no compiler) — the gate
    then degrades to raw checking, never to a looser one."""
    import importlib.util

    mod_spec = importlib.util.spec_from_file_location(
        "dali_tpu_qa_boxspeed", os.path.join(HERE, "boxspeed.py"))
    boxspeed = importlib.util.module_from_spec(mod_spec)
    mod_spec.loader.exec_module(boxspeed)
    chase = boxspeed.chase_ns()
    if chase is None:
        print("note: box-speed yardstick unavailable; checking raw")
        return 1.0, None
    cal = float(spec["chase_ns_cal"])
    return min(max(chase / cal, 1.0), 1.3), chase


def collect_metrics(args):
    if "--from" in args:
        lines = open(args[args.index("--from") + 1]).read().splitlines()
    else:
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             capture_output=True, text=True, timeout=2700)
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
    argv = [a for a in sys.argv[1:]]
    record = "--record" in argv
    thresholds = load_thresholds()
    metrics = collect_metrics(argv)
    failed = False
    dirty = False
    factor, chase = 1.0, None
    if "_yardstick" in thresholds and any(
            spec.get("normalize_box_speed")
            for name, spec in thresholds.items() if not name.startswith("_")):
        factor, chase = measure_box_speed(thresholds["_yardstick"])
        if chase is not None:
            print(f"box-speed yardstick: chase {chase:.3f} ns/step "
                  f"(cal {thresholds['_yardstick']['chase_ns_cal']}) -> "
                  f"normalization factor {factor:.3f}")
    for name, spec in thresholds.items():
        if name.startswith("_"):
            continue
        floor = float(spec["min"])
        best = float(spec.get("best", floor))
        band = float(spec.get("band", 0.75))
        gate = max(floor, band * best)
        got = metrics.get(name)
        if got is None:
            print(f"FAIL: metric '{name}' missing from bench output")
            failed = True
            continue
        checked = got * factor if spec.get("normalize_box_speed") else got
        status = "OK" if checked >= gate else "FAIL"
        norm = (f", box-normalized {checked:.1f}"
                if checked != got else "")
        print(f"{status}: {name} = {got:.1f}{norm} (gate >= {gate:.1f} "
              f"{spec.get('unit', '')}; best-ever {best:.1f})")
        if checked < gate:
            failed = True
        elif got > best:  # ratchet on the RAW value only — normalization can
            if record:    # relax a slow-day check but never inflate `best`
                spec["best"] = round(got, 1)
                dirty = True
                print(f"  ratchet: best {best:.1f} -> {got:.1f} (gate is now "
                      f"{max(floor, band * got):.1f})")
            else:
                print(f"  note: beats best-ever {best:.1f}; run with --record "
                      "to ratchet the gate up")
    if dirty:
        path = os.path.join(HERE, "thresholds.json")
        with open(path, "w") as f:
            json.dump(thresholds, f, indent=2)
            f.write("\n")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
