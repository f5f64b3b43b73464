"""Audio chain tests — the LibriSpeech-style mel frontend (BASELINE.json config 3),
cpu↔gpu parity and formula checks against librosa-equivalent math."""

import io
import struct

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types


def make_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    pcm = np.clip(np.round(samples * 32767), -32768, 32767).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    data = b"data" + struct.pack("<I", len(pcm)) + pcm
    return hdr + fmt + data


@pytest.fixture(scope="module")
def wav_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(7)
    lengths = [16000, 12000, 20000, 8000]
    for i, n in enumerate(lengths):
        t = np.arange(n) / 16000
        sig = 0.5 * np.sin(2 * np.pi * (200 + 100 * i) * t) + 0.05 * rng.standard_normal(n)
        (root / f"a{i}.wav").write_bytes(make_wav(sig.astype(np.float32)))
    return str(root)


def test_audio_decode(wav_files):
    import os

    files = sorted(os.path.join(wav_files, f) for f in os.listdir(wav_files))

    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def pipe():
        enc, _ = fn.readers.file(files=files, name="R")
        audio, rate = fn.decoders.audio(enc, dtype=types.FLOAT)
        return audio, rate

    audio, rate = pipe().run()
    assert audio.at(0).shape == (16000,)
    assert audio.at(3).shape == (8000,)
    assert float(rate.at(0)) == 16000.0
    assert np.abs(audio.at(0)).max() <= 1.0


def test_asr_frontend_cpu_gpu_parity(wav_files):
    """decode → preemphasis → spectrogram → mel → to_db: host vs device."""
    import os

    files = sorted(os.path.join(wav_files, f) for f in os.listdir(wav_files))

    def make(device):
        @pipeline_def(batch_size=4, num_threads=1, seed=1)
        def pipe():
            enc, _ = fn.readers.file(files=files, name="R")
            audio, rate = fn.decoders.audio(enc, dtype=types.FLOAT)
            if device == "gpu":
                audio = audio.gpu()
            audio = fn.preemphasis_filter(audio, preemph_coeff=0.97)
            spec = fn.spectrogram(audio, nfft=512, window_length=400, window_step=160)
            mel = fn.mel_filter_bank(spec, sample_rate=16000.0, nfilter=64)
            db = fn.to_decibels(mel, multiplier=10.0, cutoff_db=-80.0)
            return db

        return pipe()

    cpu = make("cpu").run()[0]
    gpu_tl = make("gpu").run()[0]
    gpu = gpu_tl.as_cpu()
    for i in range(4):
        c, g = cpu.at(i), gpu.at(i)
        assert c.shape == g.shape, (c.shape, g.shape)
        np.testing.assert_allclose(c, g, atol=1e-2, rtol=1e-3)


def test_spectrogram_shape_and_energy(wav_files):
    import os

    files = sorted(os.path.join(wav_files, f) for f in os.listdir(wav_files))

    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def pipe():
        enc, _ = fn.readers.file(files=files, name="R")
        audio, _ = fn.decoders.audio(enc, dtype=types.FLOAT)
        return fn.spectrogram(audio, nfft=512, window_length=400, window_step=160)

    out = pipe().run()[0]
    s0 = out.at(0)
    assert s0.shape == (257, 16000 // 160 + 1)
    # 200 Hz tone → bin 200/ (16000/512) = 6.4: peak near bin 6
    peak_bin = int(np.argmax(s0.mean(axis=1)))
    assert 5 <= peak_bin <= 8


def test_mel_matrix_matches_librosa_formula():
    from dali_tpu.kernels.signal import mel_filter_bank_matrix

    w = mel_filter_bank_matrix(nfilter=40, nfft=512, sample_rate=16000.0)
    assert w.shape == (40, 257)
    assert (w >= 0).all()
    # every filter nonzero, unimodal
    assert (w.sum(axis=1) > 0).all()


def test_mfcc(wav_files):
    import os

    files = sorted(os.path.join(wav_files, f) for f in os.listdir(wav_files))

    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def pipe():
        enc, _ = fn.readers.file(files=files, name="R")
        audio, _ = fn.decoders.audio(enc, dtype=types.FLOAT)
        spec = fn.spectrogram(audio, nfft=512, window_length=400, window_step=160)
        mel = fn.mel_filter_bank(spec, sample_rate=16000.0, nfilter=64)
        db = fn.to_decibels(mel, multiplier=10.0, cutoff_db=-80.0)
        return fn.mfcc(db, n_mfcc=13, normalize=True)

    out = pipe().run()[0]
    assert out.at(0).shape[0] == 13


def test_nonsilent_region():
    sig = np.zeros(16000, np.float32)
    sig[4000:8000] = 0.5

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        audio = fn.external_source(source=lambda: [sig], batch=True)
        begin, length = fn.nonsilent_region(audio, cutoff_db=-10, window_length=512)
        return begin, length

    begin, length = pipe().run()
    b, ln = int(begin.at(0)), int(length.at(0))
    # resolution limited by the moving window (reference behavior)
    assert 3400 <= b <= 4100, b
    assert 3900 <= ln <= 5200, ln


def test_audio_resample(wav_files):
    import os

    files = sorted(os.path.join(wav_files, f) for f in os.listdir(wav_files))

    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def pipe():
        enc, _ = fn.readers.file(files=files, name="R")
        audio, _ = fn.decoders.audio(enc, dtype=types.FLOAT)
        return fn.experimental.audio_resample(audio, in_rate=16000.0, out_rate=8000.0)

    out = pipe().run()[0]
    assert out.at(0).shape == (8000,)


def test_audio_resample_gpu_vs_cpu():
    """GPU sinc resampler tracks the CPU polyphase resampler on a band-limited
    signal (reference resample GPU/CPU parity tests)."""
    from .test_utils import to_samples

    t = np.arange(4000, dtype=np.float32) / 16000.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 1220 * t)).astype(
        np.float32
    )
    outs = {}
    for dev in ("cpu", "gpu"):
        @pipeline_def(batch_size=2, num_threads=1, seed=1)
        def pipe():
            x = fn.external_source(source=lambda: [sig, sig[:3000]], batch=True, cycle=True)
            if dev == "gpu":
                x = x.gpu()
            return fn.experimental.audio_resample(x, in_rate=16000.0, out_rate=8000.0,
                                                  quality=80.0)

        p = pipe()
        p.build()
        (o,) = p.run()
        outs[dev] = to_samples(o)
    for c, g in zip(outs["cpu"], outs["gpu"]):
        assert abs(len(c) - len(g)) <= 1
        n = min(len(c), len(g))
        # ignore the filter-edge transients at both ends
        err = np.abs(c[32:n-32] - g[32:n-32])
        assert err.mean() < 5e-3, err.mean()


@pytest.mark.parametrize("fmt", ["flac", "mp3", "ogg"])
def test_audio_decode_compressed_formats(fmt, tmp_path):
    """FLAC (LibriSpeech's format), MP3 and OGG/Vorbis decode through
    fn.decoders.audio via the native FFmpeg path (reference uses libsndfile:
    dali/operators/decoder/audio/generic_decoder.cc:16)."""
    from dali_tpu import native

    if not (native.available() and native.has_audio()):
        pytest.skip("native audio decoder not built")
    rate = 16000
    t = np.arange(rate, dtype=np.float32) / rate
    mono = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    pcm = np.stack([mono, mono], 1) if fmt == "ogg" else mono  # vorbis enc needs 2ch
    enc = native.audio_encode(pcm, rate, fmt)
    if enc is None:
        pytest.skip(f"no native {fmt} encoder in this ffmpeg build")
    path = tmp_path / f"clip.{fmt}"
    path.write_bytes(enc)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        data, _ = fn.readers.file(files=[str(path)], name="R")
        audio, srate = fn.decoders.audio(data, dtype=types.FLOAT, downmix=True)
        return audio, srate

    audio, srate = pipe().run()
    x = audio.at(0)
    assert float(srate.at(0)) == rate
    assert x.ndim == 1 and len(x) >= rate - 2048
    # dominant frequency must survive the codec
    spec = np.abs(np.fft.rfft(x[: rate // 2]))
    peak = np.argmax(spec) * rate / (rate // 2)
    assert abs(peak - 440) < 15, peak


def test_audio_decode_flac_bit_depth_and_downmix(tmp_path):
    from dali_tpu import native

    if not (native.available() and native.has_audio()):
        pytest.skip("native audio decoder not built")
    rate = 8000
    rng = np.random.default_rng(3)
    st = (rng.standard_normal((rate, 2)) * 0.2).astype(np.float32)
    enc = native.audio_encode(st, rate, "flac")
    path = tmp_path / "c.flac"
    path.write_bytes(enc)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        data, _ = fn.readers.file(files=[str(path)], name="R")
        a2, _r = fn.decoders.audio(data, dtype=types.FLOAT)
        a1, _r1 = fn.decoders.audio(data, dtype=types.FLOAT, downmix=True)
        return a2, a1

    a2, a1 = pipe().run()
    assert a2.at(0).shape == (rate, 2)
    np.testing.assert_allclose(a1.at(0), a2.at(0).mean(1), atol=1e-4)


def test_mixed_audio_decode_matches_cpu(tmp_path):
    """device='mixed' audio decode (int16 wire + device float conversion,
    backend/audio.py _AudioStage/_AudioToOutput) is bit-exact vs the cpu
    decoder for 16-bit sources."""
    from dali_tpu import native

    if not (native.available() and native.has_audio()):
        pytest.skip("native audio decoder not built")
    d = tmp_path / "c0"
    d.mkdir()
    rng = np.random.default_rng(3)
    for i in range(4):
        x = (rng.standard_normal(8000).astype(np.float32) * 0.3)
        (d / f"{i}.flac").write_bytes(native.audio_encode(x, 16000, "flac"))

    def build(dev):
        @pipeline_def(batch_size=4, num_threads=1, seed=5)
        def p():
            enc, _ = fn.readers.file(file_root=str(tmp_path),
                                     file_filters=["*.flac"], name="R")
            audio, rate = fn.decoders.audio(enc, dtype=types.FLOAT,
                                            downmix=True, device=dev)
            if dev != "mixed":
                audio = audio.gpu()
            return audio, rate

        pipe = p()
        pipe.build()
        a, _ = pipe.run()
        return np.asarray(a.as_tensor())

    np.testing.assert_array_equal(build("mixed"), build(None))
