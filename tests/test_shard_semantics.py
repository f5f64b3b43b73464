"""Sharding edge semantics (VERDICT r2 #4).

Asserts the reference shard-size formula and the epoch-boundary behavior of
``stick_to_shard`` / ``pad_last_batch`` / LastBatchPolicy, matching
``/root/reference/docs/advanced_topics_sharding.rst:63-74`` and
``reader/loader/loader.h:84-103``:

    start(shard) = floor(shard_id * N / num_shards)
    end(shard)   = floor((shard_id+1) * N / num_shards)

with shard rotation ``(shard_id + epoch) % num_shards`` unless
``stick_to_shard``, and ``pad_last_batch`` repeating each shard's LAST sample
until every shard steps ceil(max_shard / batch) * batch samples per epoch.
"""

import os

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def
from dali_tpu.plugin.base_iterator import LastBatchPolicy
from dali_tpu.plugin.jax import DALIGenericIterator


@pytest.fixture(scope="module")
def indexed_dataset(tmp_path_factory):
    """N files whose content encodes their sorted index (1 byte each)."""
    root = tmp_path_factory.mktemp("shard_sem")
    n = 11  # deliberately prime: uneven shards for every num_shards in tests
    d = root / "data"
    d.mkdir()
    for i in range(n):
        (d / f"f_{i:03d}.bin").write_bytes(bytes([i]))
    return str(root), n


def _seq_pipe(root, shard_id, num_shards, batch, stick=False, pad=False):
    @pipeline_def(batch_size=batch, num_threads=1, seed=5)
    def p():
        data, _ = fn.readers.file(
            file_root=root, shard_id=shard_id, num_shards=num_shards,
            random_shuffle=False, stick_to_shard=stick, pad_last_batch=pad,
            file_filters=["*.bin"],
            name="Reader",
        )
        return data

    return p()


def _drain(pipe, iters, batch):
    """Run ``iters`` batches, return the flat list of sample indices."""
    out = []
    for _ in range(iters):
        (data,) = pipe.run()
        for i in range(batch):
            out.append(int(np.asarray(data.at(i))[0]))
    return out


def _bounds(shard, num_shards, n):
    return shard * n // num_shards, (shard + 1) * n // num_shards


@pytest.mark.parametrize("num_shards", [2, 3, 4])
def test_shard_formula_covers_dataset(indexed_dataset, num_shards):
    """Shards partition [0, N) disjointly with the floor formula sizes."""
    root, n = indexed_dataset
    all_seen = []
    for sid in range(num_shards):
        start, end = _bounds(sid, num_shards, n)
        pipe = _seq_pipe(root, sid, num_shards, batch=1)
        got = _drain(pipe, end - start, 1)
        assert got == list(range(start, end)), f"shard {sid}"
        all_seen += got
    assert sorted(all_seen) == list(range(n))


def test_epoch_rotation_without_stick(indexed_dataset):
    """Epoch e reads shard (shard_id + e) % num_shards (sharding.rst formula)."""
    root, n = indexed_dataset
    num_shards, sid = 3, 1
    pipe = _seq_pipe(root, sid, num_shards, batch=1)
    got = _drain(pipe, n + 2, 1)  # enough to cross two epoch boundaries
    expect = []
    epoch = 0
    while len(expect) < len(got):
        s = (sid + epoch) % num_shards
        a, b = _bounds(s, num_shards, n)
        expect += list(range(a, b))
        epoch += 1
    assert got == expect[: len(got)]


def test_stick_to_shard_pins_the_shard(indexed_dataset):
    root, n = indexed_dataset
    num_shards, sid = 3, 2
    a, b = _bounds(sid, num_shards, n)
    pipe = _seq_pipe(root, sid, num_shards, batch=1, stick=True)
    got = _drain(pipe, (b - a) * 3, 1)
    assert got == list(range(a, b)) * 3  # same shard every epoch


@pytest.mark.parametrize("sid", [0, 1, 2])
def test_pad_last_batch_repeats_last_sample(indexed_dataset, sid):
    """Every shard steps ceil(max_shard/batch)*batch samples; the filler is
    the shard's LAST sample (loader.h pad semantics)."""
    root, n = indexed_dataset
    num_shards, batch = 3, 2
    a, b = _bounds(sid, num_shards, n)
    max_shard = -(-n // num_shards)
    padded = -(-max_shard // batch) * batch
    pipe = _seq_pipe(root, sid, num_shards, batch, stick=True, pad=True)
    got = _drain(pipe, padded // batch, batch)
    expect = list(range(a, b)) + [b - 1] * (padded - (b - a))
    assert got == expect
    # epoch 2 must start fresh at the shard start (stick_to_shard)
    got2 = _drain(pipe, padded // batch, batch)
    assert got2 == expect


def test_pad_last_batch_epoch_size_uniform(indexed_dataset):
    """All shards report the same padded epoch_size so lockstep shards never
    desync (the distributed-correctness property pad_last_batch exists for)."""
    root, n = indexed_dataset
    num_shards, batch = 4, 3
    metas = []
    for sid in range(num_shards):
        pipe = _seq_pipe(root, sid, num_shards, batch, pad=True)
        pipe.build()
        metas.append(pipe.reader_meta()["Reader"])
    sizes = {m["epoch_size_padded"] for m in metas}
    assert len(sizes) == 1
    max_shard = -(-n // num_shards)
    assert sizes.pop() == -(-max_shard // batch) * batch * num_shards


def _iter_pipe(root, sid, num_shards, batch, pad):
    @pipeline_def(batch_size=batch, num_threads=1, seed=5)
    def p():
        data, _ = fn.readers.file(
            file_root=root, shard_id=sid, num_shards=num_shards,
            random_shuffle=False, pad_last_batch=pad, file_filters=["*.bin"],
            name="Reader",
        )
        return data

    return p()


@pytest.mark.parametrize("policy,pad", [
    (LastBatchPolicy.FILL, True),
    (LastBatchPolicy.DROP, True),
    (LastBatchPolicy.PARTIAL, True),
    (LastBatchPolicy.DROP, False),
])
def test_last_batch_policy_epoch_lengths(indexed_dataset, policy, pad):
    """reader_name autosizing x LastBatchPolicy: per-epoch batch count and
    the final batch's valid extent match the reference base_iterator rules."""
    root, n = indexed_dataset
    num_shards, sid, batch = 2, 0, 4
    a, b = _bounds(sid, num_shards, n)  # shard 0 of 11 -> 5 samples
    shard = b - a
    pipe = _iter_pipe(root, sid, num_shards, batch, pad)
    it = DALIGenericIterator(
        [pipe], ["data"], reader_name="Reader", last_batch_policy=policy,
        auto_reset=True,
    )
    batches = [bt for bt in it]  # one epoch
    if policy == LastBatchPolicy.DROP:
        assert len(batches) == shard // batch  # tail dropped
        for bt in batches:
            assert bt["data"].shape[0] == batch
    elif policy == LastBatchPolicy.FILL:
        assert len(batches) == -(-shard // batch)
        for bt in batches:
            assert bt["data"].shape[0] == batch  # filler kept
    else:  # PARTIAL
        assert len(batches) == -(-shard // batch)
        assert batches[-1]["data"].shape[0] == shard - (len(batches) - 1) * batch
    # second epoch (auto_reset) sees the identical count — no drift
    assert len([bt for bt in it]) == len(batches)


def test_unsharded_reader_meta_consistency(indexed_dataset):
    """num_shards=1: epoch_size == N and padding is a no-op multiple of batch."""
    root, n = indexed_dataset
    pipe = _seq_pipe(root, 0, 1, batch=4, pad=True)
    pipe.build()
    m = pipe.reader_meta()["Reader"]
    assert m["epoch_size"] == n
    assert m["epoch_size_padded"] == -(-n // 4) * 4
