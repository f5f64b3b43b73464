"""LibriSpeech-style ASR frontend (BASELINE config 3): FLAC decode ->
preemphasis -> spectrogram -> mel -> dB -> normalize, with the spectral
chain running as one jitted XLA program on the TPU.

Usage: python docs/examples/asr_frontend.py <dir with .flac/.wav files>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from dali_tpu import fn, pipeline_def, types


@pipeline_def(batch_size=32, num_threads=4, seed=7, prefetch_queue_depth=2)
def asr_frontend(data_dir):
    enc, _ = fn.readers.file(file_root=data_dir,
                             file_filters=["*.flac", "*.wav"],
                             random_shuffle=True, name="Reader")
    audio, _rate = fn.decoders.audio(enc, dtype=types.FLOAT, downmix=True)
    audio = audio.gpu()
    audio = fn.preemphasis_filter(audio, preemph_coeff=0.97)
    spec = fn.spectrogram(audio, nfft=512, window_length=320, window_step=160)
    mel = fn.mel_filter_bank(spec, sample_rate=16000.0, nfilter=80)
    db = fn.to_decibels(mel, multiplier=10.0, cutoff_db=-80.0)
    return fn.normalize(db, axes=[1])


def synth_dataset(root, n=16):
    import numpy as np

    from dali_tpu import native

    sub = os.path.join(root, "clips")  # readers.file labels by subdir
    os.makedirs(sub, exist_ok=True)
    rng = np.random.default_rng(3)
    for i in range(n):
        dur = float(rng.uniform(2.0, 5.0))
        t = np.arange(int(dur * 16000), dtype=np.float32) / 16000
        x = (0.3 * np.sin(2 * np.pi * (180 + 40 * i) * t)).astype(np.float32)
        with open(os.path.join(sub, f"c{i:03d}.flac"), "wb") as f:
            f.write(native.audio_encode(x, 16000, "flac"))
    return root


if __name__ == "__main__":
    data_dir = sys.argv[1] if len(sys.argv) > 1 else synth_dataset(
        "/tmp/dali_tpu_asr_example")
    pipe = asr_frontend(data_dir)
    pipe.build()
    feats = pipe.run()[0]
    print("mel features:", feats.shape()[:4], "...")
