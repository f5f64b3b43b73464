"""Video stack: readers.Video (file sequences) and experimental.inputs.Video
(feed-driven; reference video/input/video_input.h batch outline)."""

import numpy as np
import pytest

import dali_tpu.fn as fn
from dali_tpu.pipeline import pipeline_def

from .test_utils import to_samples

cv2 = pytest.importorskip("cv2")


def _write_video(path, num_frames=30, w=48, h=32, fps=25):
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert wr.isOpened(), "cv2 cannot write mp4"
    for i in range(num_frames):
        frame = np.full((h, w, 3), i * 8 % 256, np.uint8)
        wr.write(frame)
    wr.release()
    return str(path)


def test_video_reader(tmp_path):
    path = _write_video(tmp_path / "a.mp4", num_frames=24)

    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def pipe():
        return fn.readers.video(filenames=[path], sequence_length=4, name="v")

    p = pipe()
    p.build()
    (seqs,) = p.run()
    s = to_samples(seqs)
    assert s[0].shape == (4, 32, 48, 3)
    # frame brightness increases monotonically within a sequence
    m = s[0].reshape(4, -1).mean(axis=1)
    assert (np.diff(m) > 0).all()


def test_video_input_outline(tmp_path):
    # 14 frames, sequence_length=4, batch=2 → batches of sequence counts:
    # [2 (8 frames), 2 (frames 8..14: one full + one 2-frame partial)]
    path = _write_video(tmp_path / "b.mp4", num_frames=14)
    blob = open(path, "rb").read()

    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def pipe():
        return fn.experimental.inputs.video(sequence_length=4, name="vin",
                                            last_sequence_policy="partial")

    p = pipe()
    p.build()
    p.feed_input("vin", blob)
    b1 = to_samples(p.run()[0])
    assert [x.shape[0] for x in b1] == [4, 4]
    b2 = to_samples(p.run()[0])
    assert [x.shape[0] for x in b2] == [4, 2]  # partial tail

    # next run needs a new feed
    with pytest.raises(RuntimeError):
        p.run()

    # pad policy fills the tail sequence with zero frames
    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def pipe_pad():
        return fn.experimental.inputs.video(sequence_length=4, name="vin",
                                            last_sequence_policy="pad")

    p2 = pipe_pad()
    p2.build()
    p2.feed_input("vin", blob)
    p2.run()
    tail = to_samples(p2.run()[0])
    assert tail[1].shape[0] == 4
    assert (tail[1][2:] == 0).all()  # padded frames are zeros


def test_video_reader_stride_and_step(tmp_path):
    """stride skips frames WITHIN a sequence; step spaces sequence STARTS
    (reference readers__Video args)."""
    path = _write_video(tmp_path / "c.mp4", num_frames=30)

    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def pipe():
        return fn.readers.video(filenames=[path], sequence_length=3,
                                stride=2, step=6, name="v")

    p = pipe()
    p.build()
    (seqs,) = p.run()
    s = to_samples(seqs)
    # frames are flat fills of (i*8 % 256): recover indices from brightness
    def idx(frame):
        return int(round(frame.mean() / 8.0))

    first = [idx(f) for f in s[0]]
    second = [idx(f) for f in s[1]]
    assert first == [0, 2, 4]       # stride 2 inside the sequence
    assert second == [6, 8, 10]     # next start = step 6


def test_video_reader_labels_and_shuffle(tmp_path):
    a = _write_video(tmp_path / "a.mp4", num_frames=12)
    b = _write_video(tmp_path / "b.mp4", num_frames=12)

    @pipeline_def(batch_size=4, num_threads=1, seed=9)
    def pipe():
        seqs, labels = fn.readers.video(filenames=[a, b], labels=[7, 9],
                                        sequence_length=4, random_shuffle=True,
                                        name="v")
        return seqs, labels

    p = pipe()
    p.build()
    seen = set()
    for _ in range(3):
        _, labels = p.run()
        for lab in to_samples(labels):
            seen.add(int(np.asarray(lab).reshape(-1)[0]))
    assert seen == {7, 9}


def test_video_resize_reader(tmp_path):
    path = _write_video(tmp_path / "d.mp4", num_frames=10, w=64, h=48)

    @pipeline_def(batch_size=1, num_threads=1, seed=2)
    def pipe():
        return fn.readers.video_resize(filenames=[path], sequence_length=4,
                                       resize_x=32, resize_y=24, name="v")

    p = pipe()
    p.build()
    (seqs,) = p.run()
    s = to_samples(seqs)
    assert s[0].shape == (4, 24, 32, 3)
