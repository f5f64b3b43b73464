"""LibriSpeech-style ASR frontend (BASELINE config 3): FLAC decode ->
preemphasis -> spectrogram -> mel -> dB -> normalize, with the spectral
chain running as one jitted XLA program on the TPU.

Usage: python docs/examples/asr_frontend.py <dir with .flac/.wav files>
"""

import sys

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


if __name__ == "__main__":
    pipe = asr_frontend(sys.argv[1])
    pipe.build()
    feats = pipe.run()[0]
    print("mel features:", feats.shape()[:4], "...")
