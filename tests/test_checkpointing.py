"""Checkpoint/resume determinism suite, mirroring the reference's dedicated
checkpointing tests (dali/test/python/checkpointing/test_dali_checkpointing.py;
contract: docs/advanced_topics_checkpointing.rst — a restored pipeline
produces the exact continuation of the original stream).

Pattern for every test: run K iterations, checkpoint, run M more ("expected"),
then rebuild a fresh pipeline from the checkpoint and compare its first M
iterations bit-exactly.
"""

import os

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types

from .test_utils import to_samples


def drain(pipe, iters):
    """Collect all outputs of `iters` runs as nested numpy lists."""
    out = []
    for _ in range(iters):
        res = pipe.run()
        out.append([to_samples(tl) for tl in res])
    return out


def assert_streams_equal(a, b):
    assert len(a) == len(b)
    for ita, itb in zip(a, b):
        assert len(ita) == len(itb)
        for ta, tb in zip(ita, itb):
            for sa, sb in zip(ta, tb):
                np.testing.assert_array_equal(sa, sb)


def roundtrip(make_pipe, k=3, m=4):
    """Checkpoint after k iterations; compare m continuation iterations."""
    p1 = make_pipe()
    p1.build()
    drain(p1, k)
    state = p1.checkpoint()
    expected = drain(p1, m)
    p2 = make_pipe(checkpoint=state)
    p2.build()
    got = drain(p2, m)
    assert_streams_equal(expected, got)


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("ckpt_imgs")
    rng = np.random.default_rng(0)
    os.makedirs(root / "c0", exist_ok=True)
    for i in range(14):
        h, w = int(rng.integers(40, 90)), int(rng.integers(40, 90))
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        cv2.imwrite(str(root / "c0" / f"i{i}.jpg"), img, [cv2.IMWRITE_JPEG_QUALITY, 90])
    return str(root)


def test_reader_resume_mid_epoch(image_root):
    def make(checkpoint=None):
        @pipeline_def(batch_size=4, num_threads=1, seed=11,
                      enable_checkpointing=True, checkpoint=checkpoint)
        def p():
            data, labels = fn.readers.file(file_root=image_root, random_shuffle=True,
                                           name="R")
            return data, labels

        return p()

    roundtrip(make)  # 3+4 iters of batch 4 over 14 files: crosses epochs


def test_rng_ops_resume_bit_identical():
    """Counter-keyed RNG: random ops resume to the identical stream
    (reference: per-op Philox snapshots in OperatorCheckpoint)."""
    def make(checkpoint=None):
        @pipeline_def(batch_size=5, num_threads=1, seed=1234,
                      enable_checkpointing=True, checkpoint=checkpoint)
        def p():
            u = fn.random.uniform(range=[0.0, 10.0], shape=[8])
            c = fn.random.coin_flip(probability=0.4, shape=[16])
            g = fn.random.normal(mean=2.0, stddev=3.0, shape=[4, 4])
            x = types.Constant(np.full((6, 6), 100.0, np.float32))
            n = fn.noise.gaussian(x, stddev=5.0)
            return u, c, g, n

        return p()

    roundtrip(make)


def test_random_resized_crop_resume(image_root):
    def make(checkpoint=None):
        @pipeline_def(batch_size=4, num_threads=1, seed=5,
                      enable_checkpointing=True, checkpoint=checkpoint)
        def p():
            data, _ = fn.readers.file(file_root=image_root, random_shuffle=True, name="R")
            img = fn.decoders.image(data, device="cpu")
            out = fn.random_resized_crop(img, size=[32, 32])
            mirror = fn.random.coin_flip(probability=0.5)
            out = fn.crop_mirror_normalize(out, mirror=mirror, dtype=types.FLOAT,
                                           output_layout="CHW")
            return out

        return p()

    roundtrip(make)


def test_external_source_indexed_callable_resume():
    """Per-sample indexed callable (source(SampleInfo)) — the reference's
    supported external_source checkpoint case."""
    def make(checkpoint=None):
        def src(info):
            rng = np.random.default_rng(info.idx_in_epoch + 1000 * info.epoch_idx)
            return rng.integers(0, 255, (4,), np.uint8)

        @pipeline_def(batch_size=3, num_threads=1, seed=3,
                      enable_checkpointing=True, checkpoint=checkpoint)
        def p():
            return fn.external_source(source=src, batch=False)

        return p()

    roundtrip(make)


def test_external_source_batch_callable_resume():
    def make(checkpoint=None):
        def src(info):
            rng = np.random.default_rng(info.iteration)
            return [rng.integers(0, 255, (3, 2), np.uint8) for _ in range(4)]

        @pipeline_def(batch_size=4, num_threads=1, seed=3,
                      enable_checkpointing=True, checkpoint=checkpoint)
        def p():
            return fn.external_source(source=src, batch=True)

        return p()

    roundtrip(make)


def test_checkpoint_file_roundtrip(tmp_path, image_root):
    """checkpoint(filename=...) + Pipeline(checkpoint=<file contents>)."""
    path = str(tmp_path / "ckpt.json")

    def make(checkpoint=None):
        @pipeline_def(batch_size=2, num_threads=1, seed=7,
                      enable_checkpointing=True, checkpoint=checkpoint)
        def p():
            data, labels = fn.readers.file(file_root=image_root, name="R")
            u = fn.random.uniform(range=[0, 1], shape=[2])
            return labels, u

        return p()

    p1 = make()
    p1.build()
    drain(p1, 2)
    p1.checkpoint(filename=path)
    expected = drain(p1, 3)
    with open(path) as f:
        payload = f.read()
    p2 = make(checkpoint=payload)
    p2.build()
    assert_streams_equal(expected, drain(p2, 3))


def test_epoch_boundary_resume(image_root):
    """Checkpoint exactly at an epoch boundary: the restored pipeline starts
    the next epoch with the same shuffle order."""
    def make(checkpoint=None):
        @pipeline_def(batch_size=7, num_threads=1, seed=21,
                      enable_checkpointing=True, checkpoint=checkpoint)
        def p():
            _, labels = fn.readers.file(file_root=image_root, random_shuffle=True,
                                        shuffle_after_epoch=True, name="R")
            return labels,

        return p()

    roundtrip(make, k=2, m=4)  # 14 files / batch 7 -> k=2 is exactly one epoch


def test_iterator_checkpoint_roundtrip(image_root):
    """Iterator-level checkpoint: pipeline states + counter restore
    (reference iterator checkpointing via ExternalContextCheckpoint)."""
    from dali_tpu.plugin.base_iterator import DALIGenericIterator, LastBatchPolicy

    def make(checkpoint=None):
        @pipeline_def(batch_size=4, num_threads=1, seed=13,
                      enable_checkpointing=True, checkpoint=checkpoint)
        def p():
            _, labels = fn.readers.file(file_root=image_root, random_shuffle=True,
                                        name="R")
            return labels,

        return p()

    def make_it(pipes):
        return DALIGenericIterator(pipes, ["label"], reader_name="R",
                                   last_batch_policy=LastBatchPolicy.FILL)

    # 14 files / batch 4, FILL -> 4 iterations per epoch (iterator raises
    # StopIteration at the epoch boundary, like the reference)
    p1 = make()
    p1.build()
    it1 = make_it([p1])
    for _ in range(2):
        next(it1)
    state = it1.checkpoints()
    expected = [next(it1) for _ in range(2)]

    p2 = make(checkpoint=state["pipelines"][0])
    p2.build()
    it2 = make_it([p2])
    it2.restore_counter(state["counter"])
    got = [next(it2) for _ in range(2)]
    for e, g in zip(expected, got):
        ea, ga = e[0]["label"], g[0]["label"]
        np.testing.assert_array_equal(np.asarray(ea.as_array()), np.asarray(ga.as_array()))


def test_cross_process_resume_bit_identical(image_root, tmp_path):
    """The strongest resume contract: checkpoint in one PROCESS, resume in a
    fresh one, outputs bit-identical to the uninterrupted run (reference
    checkpointing docs promise exactly this)."""
    import json
    import subprocess
    import sys
    import textwrap

    script = tmp_path / "resume.py"
    script.write_text(textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {repr(str(__import__('os').path.dirname(__import__('os').path.dirname(__file__))))})
        import json
        import numpy as np
        import jax
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        from dali_tpu import fn, pipeline_def, types

        mode, ckpt_file, out_file = sys.argv[1], sys.argv[2], sys.argv[3]
        ckpt = open(ckpt_file).read() if mode == "resume" else None

        @pipeline_def(batch_size=4, num_threads=1, seed=77,
                      enable_checkpointing=True, checkpoint=ckpt)
        def p():
            data, labels = fn.readers.file(file_root={repr(image_root)},
                                           random_shuffle=True, name="R")
            img = fn.decoders.image(data, device="cpu")
            img = fn.random_resized_crop(img, size=[24, 24])
            coin = fn.random.coin_flip(probability=0.5, shape=[4])
            return img, labels, coin

        pipe = p()
        pipe.build()
        outs = []
        if mode == "full":
            for _ in range(3):
                pipe.run()
            open(ckpt_file, "w").write("unused")
            for _ in range(2):
                o = pipe.run()
                outs.append([np.asarray(t.as_array()).tolist() for t in o])
        elif mode == "head":
            for _ in range(3):
                pipe.run()
            open(ckpt_file, "w").write(pipe.checkpoint())
        else:  # resume
            for _ in range(2):
                o = pipe.run()
                outs.append([np.asarray(t.as_array()).tolist() for t in o])
        open(out_file, "w").write(json.dumps(outs))
    """))

    def run(mode, ckpt, out):
        r = subprocess.run([sys.executable, str(script), mode, str(ckpt), str(out)],
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]

    full_out = tmp_path / "full.json"
    run("full", tmp_path / "ck_unused.txt", full_out)
    run("head", tmp_path / "ck.txt", tmp_path / "head_out.json")
    resume_out = tmp_path / "resume.json"
    run("resume", tmp_path / "ck.txt", resume_out)
    a = json.loads(full_out.read_text())
    b = json.loads(resume_out.read_text())
    assert a == b  # bit-identical continuation across processes


def test_generator_source_checkpoint_refused():
    """Reference contract: external_source checkpoints only indexed
    callables — a consumed iterator/generator source cannot be rewound, so
    checkpoint() must refuse instead of silently replaying a different
    stream (advanced_topics_checkpointing.rst)."""
    def gen():
        i = 0
        while True:
            yield [np.full((2, 2), i, np.int32)]
            i += 1

    @pipeline_def(batch_size=1, num_threads=1, seed=3,
                  enable_checkpointing=True)
    def pipe():
        return fn.external_source(source=gen, batch=True)

    p = pipe()
    p.build()
    p.run()
    with pytest.raises(ValueError, match="iterator/generator"):
        p.checkpoint()
