"""Variable-batch-size sweep (reference test_dali_variable_batch_size.py).

The targeted cases live in test_variable_batch.py; this sweep runs EVERY
public 1-input all-optional-args cpu op through a pipeline whose
external_source changes the batch size each iteration, asserting

1. the op tracks the per-iteration batch size (no stale-canvas carryover), and
2. per-sample independence: sample i of a 3-sample batch equals the same
   sample fed alone as a singleton batch (deterministic, batch-decoupled
   ops only — the reference's core variable-batch invariant).

Ops whose semantics are legitimately batch-coupled or whose input contract
the generic image harness can't satisfy are excluded with stated reasons.
"""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def
from dali_tpu._schema import _registry

from .test_utils import to_samples

# Schema name -> reason. An empty reason fails the test.
EXCLUDE = {
    # input contracts the image harness can't satisfy (same set as the
    # ndd_vs_fn sweep — both modes reject the generic HWC uint8 input):
    "CoordFlip": "expects coordinate [n, ndim] float input, not images",
    "BbFlip": "expects normalized bbox [n, 4] input",
    "OpticalFlow": "requires a sequence pair (F dim)",
    "DumpImage": "writes files as a side effect",
    "io.file.Read": "input is a filename batch, not tensors",
    "ElementExtract": "requires sequence layout with element_map",
    "PerFrame": "requires F-dim sequence input",
    "SequenceRearrange": "requires new_order and F-dim input",
    "LookupTable": "needs keys/values tables to be meaningful",
    "PeekImageShape": "input must be an ENCODED image byte stream",
    "experimental.Inflate": "input must be a compressed byte stream",
    "experimental.Debayer": "input must be a single-channel Bayer mosaic",
    "MelFilterBank": "expects a spectrogram [freq, t] input",
    "MFCC": "expects a mel-spectrogram input",
    "NonsilentRegion": "audio input; variable batch covered by audio tests",
    "PreemphasisFilter": "audio input; variable batch covered by audio tests",
    "Spectrogram": "audio input; variable batch covered by audio tests",
    "ToDecibels": "audio input; variable batch covered by audio tests",
    "AudioResample": "audio input; variable batch covered by audio tests",
    "PowerSpectrum": "audio input; variable batch covered by audio tests",
}

# Deterministic ops whose output for sample i legitimately depends on the
# REST of the batch — size tracking is asserted, singleton equality is not.
BATCH_COUPLED = {
    "Pad": "default pads every sample to the batch max extent",
    "PermuteBatch": "reorders samples across the batch by definition",
}


def _sweep_ops():
    out = []
    for name, schema in sorted(_registry.items()):
        if schema.is_internal or schema.is_reader:
            continue
        if schema.min_inputs != 1 or "cpu" not in schema.devices:
            continue
        if any(a.required for a in schema.args.values()):
            continue
        out.append(name)
    return out


def test_exclusions_have_reasons():
    for k, v in {**EXCLUDE, **BATCH_COUPLED}.items():
        assert isinstance(v, str) and len(v) > 10, k


def test_variable_batch_sweep():
    from dali_tpu import _op_call

    rng = np.random.default_rng(7)
    samples = [rng.integers(0, 256, (12, 14, 3), np.uint8) for _ in range(3)]
    # iteration 0: full batch of 3; iterations 1..3: singleton per sample
    schedule = [samples, [samples[0]], [samples[1]], [samples[2]]]

    tested, eq_checked, harness_skips, failures = [], [], [], []
    for name in _sweep_ops():
        if name in EXCLUDE:
            continue
        is_rng = "seed" in _registry[name].args

        it = [0]

        def src():
            b = schedule[it[0] % len(schedule)]
            it[0] += 1
            return b

        try:
            @pipeline_def(batch_size=3, num_threads=1, seed=11)
            def pipe():
                x = fn.external_source(source=src, batch=True, layout="HWC")
                out = _op_call(name, device="cpu", inputs=(x,))
                return out[0] if isinstance(out, (tuple, list)) else out

            p = pipe()
            p.build()
            outs = [to_samples(p.run()[0]) for _ in range(len(schedule))]
        except Exception as e:
            harness_skips.append((name, str(e)[:60]))
            continue

        try:
            for i, batch in enumerate(schedule):
                assert len(outs[i]) == len(batch), (
                    f"iteration {i}: got {len(outs[i])} samples for a "
                    f"{len(batch)}-sample batch")
            if not is_rng and name not in BATCH_COUPLED:
                # sample i of the full batch == the same sample fed alone
                for i in range(3):
                    a = np.asarray(outs[0][i])
                    b = np.asarray(outs[i + 1][0])
                    assert a.shape == b.shape, (a.shape, b.shape)
                    np.testing.assert_array_equal(a, b)
                eq_checked.append(name)
            tested.append(name)
        except AssertionError as e:
            failures.append((name, str(e)[:140]))

    assert not failures, failures
    assert len(tested) >= 50, (len(tested), harness_skips[:15])
    assert len(eq_checked) >= 40, len(eq_checked)


def test_variable_batch_rng_ops_track_size_and_keep_streams():
    """RNG ops under variable batch: size tracks, and the per-sample stream
    for (iteration, sample-index) does not depend on the batch size of OTHER
    iterations (reference rng_base per-sample Philox streams)."""
    sizes_a = [3, 1, 2]
    sizes_b = [3, 3, 3]

    def run(sizes):
        it = [0]

        def src():
            n = sizes[it[0] % len(sizes)]
            it[0] += 1
            return [np.zeros((4, 4), np.float32) for _ in range(n)]

        @pipeline_def(batch_size=3, num_threads=1, seed=99)
        def p():
            x = fn.external_source(source=src, batch=True)
            return fn.random.uniform(shape=[5]), x

        pipe = p()
        pipe.build()
        return [to_samples(pipe.run()[0]) for _ in range(len(sizes))]

    a = run(sizes_a)
    b = run(sizes_b)
    for i, n in enumerate(sizes_a):
        assert len(a[i]) == n
        for j in range(n):
            np.testing.assert_array_equal(a[i][j], b[i][j])
