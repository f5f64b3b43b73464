"""Audio processing beyond the ASR frontend: trim, resample, MFCC — both modes.

The dali_tpu analogue of the reference's
`docs/examples/audio_processing/{audio_decoder,spectrogram}/{pipeline_mode,
dynamic_mode}.ipynb`: decode, nonsilent-region trimming, sample-rate
conversion, MFCC extraction — first as a compiled pipeline, then the same
chain imperatively in dynamic (ndd) mode on the same data, asserting the
two modes agree.

Run:
    python docs/examples/audio_processing.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import dali_tpu.experimental.dynamic as ndd
import dali_tpu.fn as fn
import dali_tpu.types as types
from dali_tpu import pipeline_def

BATCH = 4
RATE = 16000


def synth_clips():
    """Tones padded with leading/trailing silence (for nonsilent trimming)."""
    rng = np.random.default_rng(5)
    clips = []
    for i in range(BATCH):
        dur = float(rng.uniform(1.0, 2.0))
        t = np.arange(int(dur * RATE), dtype=np.float32) / RATE
        tone = 0.4 * np.sin(2 * np.pi * (200 + 60 * i) * t).astype(np.float32)
        pad = np.zeros(int(0.25 * RATE), np.float32)
        clips.append(np.concatenate([pad, tone, pad]))
    return clips


def main():
    clips = synth_clips()

    @pipeline_def(batch_size=BATCH, num_threads=1, seed=2)
    def audio_pipe():
        x = fn.external_source(source=lambda: clips, batch=True, cycle=True)
        # trim silence (reference NonsilentRegion + Slice pattern)
        begin, length = fn.nonsilent_region(x, cutoff_db=-60)
        trimmed = fn.slice(x, begin, length, axes=[0],
                           normalized_anchor=False, normalized_shape=False)
        # resample 16 kHz -> 8 kHz (windowed sinc)
        resampled = fn.audio_resample(trimmed, in_rate=float(RATE),
                                      out_rate=float(RATE) / 2)
        # MFCC chain on the device
        spec = fn.spectrogram(trimmed.gpu(), nfft=512, window_length=400,
                              window_step=160)
        mel = fn.mel_filter_bank(spec, sample_rate=float(RATE), nfilter=40)
        db = fn.to_decibels(mel, multiplier=10.0, cutoff_db=-80.0)
        mfcc = fn.mfcc(db, n_mfcc=13)
        return begin, length, trimmed, resampled, mfcc

    p = audio_pipe()
    p.build()
    begin, length, trimmed, resampled, mfcc = p.run()

    for i, clip in enumerate(clips):
        b = int(np.asarray(begin.at(i)).reshape(-1)[0])
        ln = int(np.asarray(length.at(i)).reshape(-1)[0])
        # trimming found the tone: the region begins where the moving-mean-
        # square window (default 2048 samples) first touches it, i.e. up to
        # one window before the 0.25 s pad ends, and spans the whole tone
        pad = int(0.25 * RATE)
        assert pad - 2048 - 64 <= b <= pad + 64, (i, b)
        assert b + ln >= len(clip) - pad - 64, (i, b, ln)
        tr = np.asarray(trimmed.at(i))
        assert tr.shape == (ln,)
        rs = np.asarray(resampled.at(i))
        assert abs(len(rs) - ln / 2) <= 2
        m = np.asarray(mfcc.at(i))
        assert m.shape[0] == 13 and np.isfinite(m).all()  # (mfcc, frames)
    print(f"pipeline mode: trim [{b} +{ln}] / resample 2:1 / MFCC "
          f"{np.asarray(mfcc.at(0)).shape} per clip")

    # -- the same chain, imperatively --------------------------------------
    xb = ndd.as_batch(clips)
    nb, nl = ndd.nonsilent_region(xb, cutoff_db=-60)
    ntr = ndd.slice(xb, nb, nl, axes=[0], normalized_anchor=False,
                    normalized_shape=False)
    nspec = ndd.spectrogram(ntr.gpu(), nfft=512, window_length=400,
                            window_step=160)
    nmel = ndd.mel_filter_bank(nspec, sample_rate=float(RATE), nfilter=40)
    ndb = ndd.to_decibels(nmel, multiplier=10.0, cutoff_db=-80.0)
    nmfcc = ndd.mfcc(ndb, n_mfcc=13)
    for i in range(BATCH):
        np.testing.assert_allclose(np.asarray(nmfcc.cpu().at(i)),
                                   np.asarray(mfcc.at(i)), atol=1e-3)
    print("dynamic mode: identical MFCCs from the imperative chain")


if __name__ == "__main__":
    main()
