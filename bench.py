"""Headline benchmarks.

1. LibriSpeech-style mel frontend (BASELINE.json config 3): FLAC decode →
   preemphasis → spectrogram → mel → dB → normalize, clips/sec. vs_baseline
   is measured against a torch-cpu implementation of the same frontend on
   this host (the reference publishes no absolute — BASELINE.md "Audio
   absolute target" records the derivation).
2. ImageNet-style JPEG → train-ready images/sec/chip. Mirrors the reference
   methodology (``internal_tools/hw_decoder_bench.py -p rn50``: warmup then
   steady-state frames/sec; reference gate 19k fps on H100 with 70 CPU
   threads). Baseline for vs_baseline is the BASELINE.json north star:
   10,000 images/sec/chip on TPU v5e.

Prints one JSON line per metric; the HEADLINE metric (ImageNet images/sec)
is the LAST line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_IMGS_PER_SEC = 10_000.0
_FALLBACK_NOTE = None  # set when the TPU tunnel is unusable (see _guard_backend)


def _guard_backend(probe_timeout_s: float = 240.0) -> None:
    """Fail fast instead of hanging when the TPU tunnel is wedged.

    Creating the axon PJRT client dials a shared tunnel; when that tunnel is
    down the dial blocks FOREVER inside ``make_c_api_client`` (observed on
    this box), which would turn the whole bench into a silent hang. Probe
    backend init in a SUBPROCESS with a timeout; on failure, drop the axon
    factory and pin jax to the CPU backend so the bench still reports an
    honest (annotated, host-competing) end-to-end number.
    """
    global _FALLBACK_NOTE
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return  # explicit CPU run: nothing to probe
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=probe_timeout_s, capture_output=True,
        )
        if r.returncode == 0:
            return
        reason = f"probe exited {r.returncode}"
    except subprocess.TimeoutExpired:
        reason = f"probe hung >{probe_timeout_s:.0f}s"
    import jax
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")
    _FALLBACK_NOTE = (
        f"tpu tunnel unavailable ({reason}); CPU-device fallback — device "
        f"stage competes with the host stage for this box's single core"
    )
    print(f"bench: {_FALLBACK_NOTE}", file=sys.stderr, flush=True)


DATA_DIR = "/tmp/dali_tpu_bench_data"
REALSTAT_DIR = "/tmp/dali_tpu_bench_realstat"
N_IMAGES = 512
BATCH = 256
WARMUP = 6
ITERS = 24

# ImageNet-ish size distribution (typical ~500x375)
SIZES = [(375, 500), (500, 375), (333, 500), (480, 640), (500, 500), (400, 600)]


def ensure_dataset():
    import cv2

    marker = os.path.join(DATA_DIR, ".complete")
    if os.path.exists(marker):
        return
    os.makedirs(os.path.join(DATA_DIR, "class0"), exist_ok=True)
    rng = np.random.default_rng(1234)
    for i in range(N_IMAGES):
        h, w = SIZES[i % len(SIZES)]
        # low-frequency content compresses like natural images (not pure noise)
        small = rng.integers(0, 256, (h // 8, w // 8, 3), np.uint8)
        img = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(
            os.path.join(DATA_DIR, "class0", f"img_{i:05d}.jpg"),
            img,
            [cv2.IMWRITE_JPEG_QUALITY, 85],
        )
    with open(marker, "w") as f:
        f.write("ok")


def ensure_dataset_realstat() -> float:
    """Textured corpus pinned at real-photo entropy (~3.5-4 bits/px measured;
    ImageNet JPEGs run ~2-5). The headline corpus sits at ~2.1 bits/px, which
    flatters decode (cost scales ~linearly with bits/px — docs/performance.md);
    this lane carries the honest real-statistics number (VERDICT r3 weak #5;
    reference methodology: internal_tools/hw_decoder_bench.py on real data).
    Returns the corpus's measured bits/px."""
    import cv2

    marker = os.path.join(REALSTAT_DIR, ".complete")
    if os.path.exists(marker):
        with open(marker) as f:
            return float(f.read().strip() or "0")
    os.makedirs(os.path.join(REALSTAT_DIR, "class0"), exist_ok=True)
    rng = np.random.default_rng(4321)
    tot_bits = tot_px = 0
    for i in range(N_IMAGES):
        h, w = SIZES[i % len(SIZES)]
        # three noise octaves (1/8, 1/2, full-res) sum to photo-like spectral
        # content; gain calibrated so q85 encodes at ~3.8 bits/px
        acc = np.zeros((h, w, 3), np.float32)
        for scale, amp in ((8, 1.0), (2, 0.45), (1, 0.3)):
            hh, ww = max(1, h // scale), max(1, w // scale)
            n = rng.standard_normal((hh, ww, 3)).astype(np.float32)
            acc += amp * cv2.resize(n, (w, h), interpolation=cv2.INTER_CUBIC)
        img = np.clip(128 + 45.0 * acc / acc.std(), 0, 255).astype(np.uint8)
        path = os.path.join(REALSTAT_DIR, "class0", f"img_{i:05d}.jpg")
        cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 85])
        tot_bits += os.path.getsize(path) * 8
        tot_px += h * w
    bpp = tot_bits / tot_px
    with open(marker, "w") as f:
        f.write(f"{bpp:.3f}")
    return bpp


def build_pipeline(data_dir=DATA_DIR):
    from dali_tpu import fn, pipeline_def, types

    @pipeline_def(
        batch_size=BATCH,
        num_threads=max(os.cpu_count() or 1, 1),
        seed=42,
        prefetch_queue_depth=2,
    )
    def rn50_train():
        # RN50 training recipe with the hybrid TPU decoder fused with the RRC
        # window: the host samples the crop, entropy-copies ONLY its DCT
        # blocks (flat-packed int8 wire), the device runs IDCT/chroma/color at
        # 1/2 DCT scale and resizes the crop to 224 — wire and device work
        # scale with the crop, not the image.
        jpegs, labels = fn.readers.file(file_root=data_dir, random_shuffle=True, name="Reader")
        images = fn.decoders.image_random_crop(
            jpegs, device="mixed", hybrid_device_decode=True, hybrid_scale=2,
        )
        images = fn.resize(images, resize_x=224, resize_y=224)
        mirror = fn.random.coin_flip(probability=0.5)
        images = fn.crop_mirror_normalize(
            images,
            mirror=mirror,
            dtype=types.FLOAT,
            output_layout="CHW",
            mean=[0.485 * 255, 0.456 * 255, 0.406 * 255],
            std=[0.229 * 255, 0.224 * 255, 0.225 * 255],
        )
        return images, labels

    return rn50_train()


AUDIO_DIR = "/tmp/dali_tpu_bench_audio"
N_CLIPS = 128
AUDIO_BATCH = 32
AUDIO_RATE = 16000


def ensure_audio_dataset():
    from dali_tpu import native

    marker = os.path.join(AUDIO_DIR, ".complete")
    if os.path.exists(marker):
        return True
    if not (native.available() and native.has_audio()):
        return False
    os.makedirs(os.path.join(AUDIO_DIR, "clips"), exist_ok=True)
    rng = np.random.default_rng(99)
    for i in range(N_CLIPS):
        # speech-like: harmonics with a wandering f0 over colored noise,
        # LibriSpeech-like durations (~4-10 s, 16 kHz mono)
        dur = float(rng.uniform(4.0, 10.0))
        n = int(dur * AUDIO_RATE)
        t = np.arange(n, dtype=np.float32) / AUDIO_RATE
        f0 = 110.0 + 40.0 * np.sin(2 * np.pi * 0.7 * t + rng.uniform(0, 6))
        phase = np.cumsum(2 * np.pi * f0 / AUDIO_RATE)
        x = sum(np.sin(k * phase) / k for k in range(1, 5))
        x = x.astype(np.float32) * 0.2
        x += rng.standard_normal(n).astype(np.float32) * 0.01
        enc = native.audio_encode(x, AUDIO_RATE, "flac")
        with open(os.path.join(AUDIO_DIR, "clips", f"c{i:04d}.flac"), "wb") as f:
            f.write(enc)
    with open(marker, "w") as f:
        f.write("ok")
    return True


def build_audio_pipeline():
    from dali_tpu import fn, pipeline_def, types

    @pipeline_def(batch_size=AUDIO_BATCH, num_threads=max(os.cpu_count() or 1, 1),
                  seed=7, prefetch_queue_depth=2)
    def asr_frontend():
        enc, _ = fn.readers.file(file_root=AUDIO_DIR, file_filters=["*.flac"],
                                 random_shuffle=True, name="R")
        # mixed decode: 16-bit PCM rides the wire as int16, floats on device
        audio, _rate = fn.decoders.audio(enc, dtype=types.FLOAT, downmix=True,
                                         device="mixed")
        audio = fn.preemphasis_filter(audio, preemph_coeff=0.97)
        spec = fn.spectrogram(audio, nfft=512, window_length=320, window_step=160)
        mel = fn.mel_filter_bank(spec, sample_rate=float(AUDIO_RATE), nfilter=80)
        db = fn.to_decibels(mel, multiplier=10.0, cutoff_db=-80.0)
        out = fn.normalize(db, axes=[1])
        return out

    return asr_frontend()


def torch_frontend_reference(paths):
    """Same frontend on torch-cpu (stft/matmul ride MKL-class C++ kernels) —
    the defensible ABSOLUTE yardstick the r2 review asked for: what a tuned
    production CPU framework achieves for the identical DSP chain on this
    host's single core. Decode goes through the same native decoder as the
    pipeline (torch cannot read FLAC), so the comparison isolates the
    framework, not the codec. BASELINE.md records the measured rate."""
    import torch

    from dali_tpu.backend.audio import decode_audio
    from dali_tpu.kernels.signal import mel_filter_bank_matrix

    win, hop, nfft = 320, 160, 512
    w = torch.from_numpy(
        mel_filter_bank_matrix(80, nfft, float(AUDIO_RATE)).astype(np.float32))
    hann = torch.hann_window(win, periodic=True)
    feats = []
    for p in paths:
        with open(p, "rb") as f:
            x, rate = decode_audio(f.read())
        t = torch.from_numpy(np.ascontiguousarray(x))
        t = torch.cat([t[:1], t[1:] - 0.97 * t[:-1]])
        spec = torch.stft(t, n_fft=nfft, hop_length=hop, win_length=win,
                          window=hann, center=True, return_complex=True)
        power = spec.real**2 + spec.imag**2  # [freq, frames]
        mel = w @ power
        db = 10.0 * torch.log10(torch.clamp(mel, min=1e-20))
        db = torch.clamp(db, min=db.max() - 80.0)
        feats.append(((db - db.mean(1, keepdim=True))
                      / (db.std(1, keepdim=True) + 1e-8)).numpy())
    return feats


def bench_audio():
    if not ensure_audio_dataset():
        return
    pipe = build_audio_pipeline()
    pipe.build()
    pipe._prefetch()  # iterator-style driving (see bench_image)
    for _ in range(3):
        out = pipe.outputs()
        pipe.schedule_run()
        out[0].as_tensor().block_until_ready()
    # ORDER-INDEPENDENT measurement (VERDICT r3 #3): the image bench drains
    # the tunnel's ~400 MB burst-credit bucket, which halves a naive
    # audio number taken right after it (measured: 74.6 clips/s immediately
    # after vs ~319/285 after 30 s idle — docs/performance.md audio budget).
    # Three passes, each preceded by a credit-recovery idle; report the
    # median pass rate and print every pass for transparency.
    stats0 = dict(pipe._executor._stats)
    snaps = [stats0]
    passes = []
    for _ in range(3):
        time.sleep(30)  # burst-credit refill (measured recovery ~30 s)
        times = []
        for _ in range(10):
            t0 = time.perf_counter()
            out = pipe.outputs()
            pipe.schedule_run()
            out[0].as_tensor().block_until_ready()
            times.append(time.perf_counter() - t0)
        passes.append(AUDIO_BATCH / float(np.median(times)))
        snaps.append(dict(pipe._executor._stats))
    clips_per_sec = float(np.median(passes))
    line = _host_cpu_line(pipe, stats0, AUDIO_BATCH,
                          "librispeech_host_cpu_clips_per_sec_per_core",
                          "clips/s of host-stage thread CPU (no tunnel)",
                          snaps=snaps)
    if line:
        print(line, flush=True)
    extra = {"note": _FALLBACK_NOTE} if _FALLBACK_NOTE else {}
    extra["passes"] = [round(p, 1) for p in passes]

    # absolute yardstick: torch-cpu mel frontend on the same clips
    # (BASELINE.md "audio absolute target"; numpy yardstick retired in r3 —
    # it measured interpreter overhead, not a tuned framework)
    clip_dir = os.path.join(AUDIO_DIR, "clips")
    paths = sorted(os.path.join(clip_dir, f) for f in os.listdir(clip_dir))[:24]
    torch_frontend_reference(paths[:2])  # warm torch kernels
    t0 = time.perf_counter()
    torch_frontend_reference(paths)
    torch_clips_per_sec = len(paths) / (time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "metric": "librispeech_mel_frontend_clips_per_sec",
                "value": round(clips_per_sec, 1),
                "unit": "clips/s (16kHz FLAC, ~7s avg)",
                "vs_baseline": round(clips_per_sec / torch_clips_per_sec, 4),
                "baseline_torch_cpu_clips_per_sec": round(torch_clips_per_sec, 1),
                **extra,
            }
        ),
        flush=True,
    )


def _host_cpu_line(pipe, stats0, n_per_batch, metric, unit,
                   snaps=None) -> str | None:
    """Weather-immune host companion metric (VERDICT r4 #1): host-stage
    THREAD-CPU seconds per item over the measured window. CPU time does not
    advance while the thread is descheduled or blocked, and the host phase
    performs no H2D, so this number is independent of tunnel weather and
    mostly load-immune — the tight regression tripwire the e2e lanes (which
    ride the shared tunnel's credit bucket) cannot be. On this 1-core box
    the 1-thread sample pool runs inline on the host-stage thread, so the
    thread-CPU twin covers ALL host work; on multi-core hosts it would
    undercount pool-fanned work (the e2e lanes cover that regime)."""
    st = pipe._executor._stats
    batches = st["host_batches"] - stats0.get("host_batches", 0)
    cpu = st["host_phase_cpu_seconds"] - stats0.get("host_phase_cpu_seconds", 0.0)
    if batches <= 0 or cpu <= 0:
        return None
    rate = batches * n_per_batch / cpu
    extra = {}
    if snaps and len(snaps) >= 2:
        # per-pass diagnostic rates (NOT the gated value): the gated value
        # stays the whole-window mean; these quantify within-run spread so
        # future band calibration has per-pass evidence (round-5 finding:
        # even thread-CPU/item swings with tunnel weather on this 1-core box
        # via cross-thread cache/timeslice coupling — docs/performance.md)
        per_pass = []
        for a, b in zip(snaps, snaps[1:]):
            db = b["host_batches"] - a["host_batches"]
            dc = b["host_phase_cpu_seconds"] - a["host_phase_cpu_seconds"]
            if db > 0 and dc > 0:
                per_pass.append(round(db * n_per_batch / dc, 1))
        if per_pass:
            extra["host_cpu_passes"] = per_pass
    return json.dumps({
        "metric": metric,
        "value": round(rate, 1),
        "unit": unit,
        "vs_baseline": 0.0,
        "host_cpu_us_per_item": round(cpu / (batches * n_per_batch) * 1e6, 1),
        **extra,
    })


def bench_image(data_dir=DATA_DIR,
                metric="imagenet_jpeg_to_train_ready_images_per_sec_per_chip",
                n_passes=1, recover_s=0, iters=ITERS, host_metric=None,
                **extra_fields) -> str:
    """One image lane. The headline runs a single window on fresh burst
    credits; secondary lanes (realstat) run ``n_passes`` windows, each after a
    ``recover_s`` credit-refill idle, and report the MEDIAN pass rate — the
    tunnel right after a heavy lane can crawl at <10% of its recovered rate
    (measured: 74.6 clips/s vs ~319 after 30 s idle, docs/performance.md)."""
    if data_dir == DATA_DIR:
        ensure_dataset()
    pipe = build_pipeline(data_dir)
    pipe.build()
    # drive like the framework iterators do (share_outputs -> schedule_run,
    # reference base_iterator.py / hw_decoder_bench.py): keep the prefetch
    # queue full so the host stage never idles between batches
    pipe._prefetch()
    # warmup (includes XLA compilation of the device stage)
    for _ in range(WARMUP):
        out = pipe.outputs()
        pipe.schedule_run()
        out[0].as_tensor().block_until_ready()
    stats0 = dict(pipe._executor._stats)
    snaps = [stats0]
    passes = []
    for _ in range(n_passes):
        if recover_s:
            time.sleep(recover_s)  # burst-credit refill
        times = []
        for _ in range(iters):
            # consume each batch as a training step would
            t0 = time.perf_counter()
            out = pipe.outputs()
            pipe.schedule_run()
            out[0].as_tensor().block_until_ready()
            times.append(time.perf_counter() - t0)
        # steady-state throughput: median per-batch latency (robust to
        # transient tunnel stalls; the reference bench reports steady-state)
        passes.append(BATCH / float(np.median(times)))
        snaps.append(dict(pipe._executor._stats))
    imgs_per_sec = float(np.median(passes))
    if host_metric:
        line = _host_cpu_line(pipe, stats0, BATCH, host_metric,
                              "images/s of host-stage thread CPU (no tunnel)",
                              snaps=snaps)
        if line:
            print(line, flush=True)
    extra = {"note": _FALLBACK_NOTE} if _FALLBACK_NOTE else {}
    if n_passes > 1:
        extra["passes"] = [round(p, 1) for p in passes]
    return json.dumps(
        {
            "metric": metric,
            "value": round(imgs_per_sec, 1),
            "unit": "images/s",
            "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 4),
            **extra_fields,
            **extra,
        }
    )


def bench_ndd() -> None:
    """Dynamic-mode (ndd) rn50 recipe: eager reader stepping + a captured
    (compiled) frontend — the reference gates eager mode the same way
    (ndd_rn50 >= ~74% of the pipeline rate, qa/TL1_decoder_perf/test.sh:65,68).
    Eager mode is synchronous: no host/device overlap, so the delta vs the
    headline is the cost of dynamic dispatch + lost pipelining."""
    import dali_tpu.experimental.dynamic as ndd
    from dali_tpu import types

    ensure_dataset()

    def read_batch():
        return ndd.readers.file(file_root=DATA_DIR, random_shuffle=True,
                                batch_size=BATCH, name="R")

    @ndd.capture
    def frontend(jpegs):
        images = ndd.decoders.image_random_crop(
            jpegs, device="mixed", hybrid_device_decode=True, hybrid_scale=2)
        images = ndd.resize(images, resize_x=224, resize_y=224)
        mirror = ndd.random.coin_flip(probability=0.5)
        return ndd.crop_mirror_normalize(
            images, mirror=mirror, dtype=types.FLOAT, output_layout="CHW",
            mean=[0.485 * 255, 0.456 * 255, 0.406 * 255],
            std=[0.229 * 255, 0.224 * 255, 0.225 * 255])

    def step():
        jpegs, _labels = read_batch()
        return frontend(jpegs)

    def _captured_host_cpu():
        """host-stage thread CPU of the CAPTURED pipeline's executor (where
        the decode actually runs) — the eager loop's own thread only feeds
        inputs and converts batches."""
        return sum(p._executor._stats["host_phase_cpu_seconds"]
                   for p in frontend._captured_pipelines.values())

    for _ in range(3):  # warmup (incl. capture + XLA compile)
        step()._device_data.block_until_ready()
    passes = []
    host_cpu_passes = []
    n_steps = 0
    for _ in range(3):
        time.sleep(30)  # burst-credit recovery (see bench_image docstring)
        times = []
        pass_cpu = -_captured_host_cpu()
        for _ in range(6):
            # host companion (VERDICT r4 #1): thread-CPU of the eager read +
            # feed + batch conversion, with the device WAIT outside the CPU
            # timer — weather-immune by construction (CPU time ignores
            # blocking); the captured pipeline's executor host CPU (decode)
            # is added from its own stats after the loop
            t0 = time.perf_counter()
            c0 = time.thread_time()
            out = step()
            pass_cpu += time.thread_time() - c0
            n_steps += 1
            out._device_data.block_until_ready()
            times.append(time.perf_counter() - t0)
        pass_cpu += _captured_host_cpu()
        host_cpu_passes.append(pass_cpu)
        passes.append(BATCH / float(np.median(times)))
    imgs_per_sec = float(np.median(passes))
    host_cpu = float(sum(host_cpu_passes))
    if host_cpu > 0:
        print(json.dumps({
            "metric": "imagenet_ndd_host_cpu_images_per_sec_per_core",
            "value": round(n_steps * BATCH / host_cpu, 1),
            "unit": "images/s of eager-loop + captured-executor thread CPU (no tunnel)",
            "vs_baseline": 0.0,
            "host_cpu_us_per_item": round(host_cpu / (n_steps * BATCH) * 1e6, 1),
            # per-pass diagnostics (see _host_cpu_line): 6 steps per pass
            "host_cpu_passes": [round(6 * BATCH / c, 1)
                                for c in host_cpu_passes if c > 0],
        }), flush=True)
    extra = {"note": _FALLBACK_NOTE} if _FALLBACK_NOTE else {}
    print(json.dumps({
        "metric": "imagenet_ndd_eager_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 1),
        "unit": "images/s",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 4),
        "passes": [round(p, 1) for p in passes],
        **extra,
    }), flush=True)


VIDEO_DIR = "/tmp/dali_tpu_bench_video"
VIDEO_BATCH = 4
VIDEO_SEQ = 16


def ensure_video_dataset():
    import cv2

    marker = os.path.join(VIDEO_DIR, ".complete")
    if os.path.exists(marker):
        return True
    os.makedirs(os.path.join(VIDEO_DIR, "class0"), exist_ok=True)
    rng = np.random.default_rng(77)
    for v in range(12):
        path = os.path.join(VIDEO_DIR, "class0", f"v{v:02d}.mp4")
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24,
                             (320, 180))
        if not wr.isOpened():
            return False
        # textured content with motion: pan + per-frame noise so inter-frame
        # prediction works (like camera footage), not a static card
        base = cv2.resize(
            rng.integers(0, 256, (45, 80, 3), np.uint8), (640, 180),
            interpolation=cv2.INTER_CUBIC)
        for f in range(192):
            x = (3 * f) % 320
            frame = np.ascontiguousarray(base[:, x:x + 320])
            wr.write(frame)
        wr.release()
    with open(marker, "w") as f:
        f.write("ok")
    return True


def _wait_for_burst_credits(min_rate_mibs=300.0, probe_mib=8,
                            max_wait_s=180, settle_s=15):
    """Idle until a small H2D probe clears ``min_rate_mibs`` — i.e. the
    tunnel's burst-credit bucket has refilled enough that the next timing
    window measures the recovered regime, not the tail of the previous
    lane's drain. Fixed sleeps under-recover when several wire-heavy lanes
    run back-to-back: the in-suite video capture collapsed to 1,100
    frames/s (vs 3,434 isolated) behind four draining lanes with plain 30 s
    sleeps. Returns (probe_MiB/s, seconds_waited); gives up after
    ``max_wait_s`` so a genuinely slow day still produces a number."""
    import jax
    import jax.numpy as jnp

    # A bare device_put can ack before the bytes actually cross the tunnel
    # (CLAUDE.md: acks are async) — a put-only probe reads "fast" while real
    # work queues behind the deficit. Blocking on a COMPUTED scalar over the
    # transferred buffer forces the wall clock to cover the transfer, the
    # same way the lanes' block-on-output timings do.
    reduce1 = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    buf = np.empty(probe_mib << 20, np.uint8)
    reduce1(buf).block_until_ready()  # warm put path + compile (timing discarded)
    waited = 0.0
    while True:
        t0 = time.perf_counter()
        reduce1(buf).block_until_ready()
        rate = probe_mib / max(time.perf_counter() - t0, 1e-9)
        if rate >= min_rate_mibs or waited >= max_wait_s:
            return rate, waited
        time.sleep(settle_s)
        waited += settle_s


def _video_host_decode_rate():
    """Host-only video decode rate (demux + codec decode + plane memcpy via
    read_yuv, random sequence starts like the reader) — the part of the
    video lane the FRAMEWORK controls, measured without the tunnel. This is
    the lane's weather-immune regression gate: the e2e number below spans
    284-3,434 frames/s for IDENTICAL code depending on the shared tunnel's
    cumulative credit deficit, while this one is stable on one core."""
    import glob

    from dali_tpu import native

    paths = sorted(glob.glob(os.path.join(VIDEO_DIR, "class0", "*.mp4")))[:4]
    vfs = [native.VideoFile(p) for p in paths]
    rng = np.random.default_rng(5)
    for vf in vfs:  # warm page cache / codec
        vf.read_yuv(0, VIDEO_SEQ, 1)
    rates = []
    for _ in range(5):
        n = 0
        # thread-CPU clock (r5): the decode runs on THIS thread, so CPU time
        # measures the framework's cost and ignores box-load descheduling —
        # wall-clock windows read 2.3x low under a concurrent test run on
        # this 1-core box (the r4 band-0.65 "load spread" was exactly this)
        c0 = time.thread_time()
        for _ in range(6):
            for vf in vfs:
                s = int(rng.integers(0, vf.num_frames - VIDEO_SEQ))
                vf.read_yuv(s, VIDEO_SEQ, 1)
                n += VIDEO_SEQ
        rates.append(n / (time.thread_time() - c0))
    for vf in vfs:
        vf.close()
    return float(np.median(rates))


def bench_video():
    """Video pipeline throughput in frames/s (VERDICT r3 #9; the reference
    carries video in its benchmark tiers, dali/benchmark/ video benches):
    readers.video mixed (FFmpeg demux+decode) -> device resize -> CMN. The
    wire ships flat-packed PLANAR YUV 4:2:0 (1.5 B/px: 320x180x1.5 x 64
    frames/batch = ~5.3 MiB — HALF the r4a RGB24 wire) with the BT.601
    conversion on device (executor._yuv420_boundary); on this box the lane
    is tunnel-bound, so the wire diet is the lever and each pass waits for
    an adaptive credit probe (not a fixed sleep — this lane runs LAST,
    behind four draining lanes). FFmpeg decode itemization lives in
    docs/performance.md."""
    from dali_tpu import fn, pipeline_def, types

    if not ensure_video_dataset():
        return

    @pipeline_def(batch_size=VIDEO_BATCH, num_threads=max(os.cpu_count() or 1, 1),
                  seed=3, prefetch_queue_depth=2)
    def vpipe():
        frames, labels = fn.readers.video(
            file_root=VIDEO_DIR, sequence_length=VIDEO_SEQ, stride=1,
            random_shuffle=True, device="mixed", name="VR")
        frames = fn.resize(frames, resize_x=224, resize_y=224)
        mirror = fn.random.coin_flip(probability=0.5)
        frames = fn.crop_mirror_normalize(
            frames, mirror=mirror, dtype=types.FLOAT, output_layout="FCHW",
            mean=[0.45 * 255] * 3, std=[0.225 * 255] * 3)
        return frames, labels

    host_fps = _video_host_decode_rate()
    print(json.dumps({
        "metric": "video_host_decode_frames_per_sec",
        "value": round(host_fps, 1),
        "unit": "frames/s of thread CPU (host demux+decode+plane memcpy, no tunnel)",
        "vs_baseline": 0.0,
    }), flush=True)

    pipe = vpipe()
    pipe.build()
    pipe._prefetch()
    for _ in range(3):
        out = pipe.outputs()
        pipe.schedule_run()
        out[0].as_tensor().block_until_ready()
    passes, probes = [], []
    for _ in range(3):
        rate, waited = _wait_for_burst_credits()
        probes.append([round(rate, 1), round(waited, 1)])
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            out = pipe.outputs()
            pipe.schedule_run()
            out[0].as_tensor().block_until_ready()
            times.append(time.perf_counter() - t0)
        passes.append(VIDEO_BATCH * VIDEO_SEQ / float(np.median(times)))
    fps = float(np.median(passes))
    extra = {"note": _FALLBACK_NOTE} if _FALLBACK_NOTE else {}
    print(json.dumps({
        "metric": "video_reader_pipeline_frames_per_sec",
        "value": round(fps, 1),
        "unit": "frames/s (320x180 mp4 -> 224x224 CMN)",
        "vs_baseline": 0.0,
        "passes": [round(p, 1) for p in passes],
        "credit_probes_mibs_waited": probes,
        **extra,
    }), flush=True)


def _box_chase_ns():
    """Box-speed yardstick: the frozen dependent-load chase that
    qa/perf_gate.py normalizes host-CPU checks with — ONE shared measurement
    protocol (qa/boxspeed.py), so this context can never diverge from the
    factor the gate actually applies. Attached to the headline line because
    this box's per-cycle speed moves ±22% day-over-day under hypervisor
    throttle (docs/performance.md "Box-speed normalization"), making a raw
    headline uninterpretable round-over-round without it. Returns None if
    the yardstick cannot build/run."""
    import importlib.util

    try:
        spec = importlib.util.spec_from_file_location(
            "dali_tpu_qa_boxspeed",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "qa", "boxspeed.py"))
        boxspeed = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(boxspeed)
        return boxspeed.chase_ns()
    except Exception:  # noqa: BLE001 — context is best-effort
        return None


def main():
    _guard_backend()
    chase_start = _box_chase_ns()
    # The headline image benchmark RUNS first (fresh burst credits); the
    # realstat lane runs after a credit-recovery idle so both image lanes
    # measure the same regime; audio manages its own recovery idles
    # (bench_audio). The headline PRINTS last — the driver reads the last line.
    image_line = bench_image(
        host_metric="imagenet_jpeg_host_cpu_images_per_sec_per_core")
    # audio runs SECOND: it is the most tunnel-drain-sensitive lane (its
    # number halves when measured behind the wire-heavy image lanes even
    # with recovery idles — measured in docs/performance.md)
    try:
        bench_audio()
    except Exception as e:  # secondary lanes must never break the headline
        print(f"audio bench skipped: {type(e).__name__}: {e}", file=sys.stderr)
    try:
        bpp = ensure_dataset_realstat()
        print(bench_image(REALSTAT_DIR,
                          "imagenet_jpeg_realstat_images_per_sec_per_chip",
                          n_passes=3, recover_s=45, iters=8,
                          host_metric="imagenet_realstat_host_cpu_images_per_sec_per_core",
                          corpus_bits_per_px=round(bpp, 2)), flush=True)
    except Exception as e:
        print(f"realstat bench skipped: {type(e).__name__}: {e}", file=sys.stderr)
    try:
        time.sleep(30)  # burst-credit recovery
        bench_ndd()
    except Exception as e:
        print(f"ndd bench skipped: {type(e).__name__}: {e}", file=sys.stderr)
    try:
        time.sleep(30)  # burst-credit recovery
        bench_video()
    except Exception as e:
        print(f"video bench skipped: {type(e).__name__}: {e}", file=sys.stderr)
    try:
        d = json.loads(image_line)
        # chase_start is the regime the headline MEASURED in (it runs first);
        # chase_end shows drift across the ~25 min run. cal + factor as in
        # qa/thresholds.json _yardstick / qa/perf_gate.py.
        if chase_start is not None:
            d["box_chase_ns_start"] = round(chase_start, 3)
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "qa", "thresholds.json")) as f:
                cal = float(json.load(f)["_yardstick"]["chase_ns_cal"])
            d["box_speed_factor_vs_cal"] = round(
                min(max(chase_start / cal, 1.0), 1.3), 3)
        chase_end = _box_chase_ns()
        if chase_end is not None:
            d["box_chase_ns_end"] = round(chase_end, 3)
        image_line = json.dumps(d)
    except Exception:  # noqa: BLE001 — never let context break the headline
        pass
    print(image_line, flush=True)


if __name__ == "__main__":
    main()
