"""Deterministic corpus-mutation fuzzing of the hand-written binary parsers.

Every parser that consumes untrusted bytes (LMDB B+tree walker, protobuf wire
scanner, TFRecord framing, RIFF/WAV, JPEG marker scan — both the Python
header peek and the native Huffman decoder, FLAC/OGG via the native FFmpeg
path) must fail CLEANLY on malformed input: a Python exception or an error
return, never a crash, hang, or unbounded loop.

Reference analogue: dali/fuzzing/image_decoder_target.cc and the
BUILD_FUZZING targets — here as deterministic seeded mutations so it runs in
the normal test suite (>=1k mutated samples per format).
"""

import struct

import numpy as np
import pytest

N_MUTATIONS = 1200  # per format


def mutations(data: bytes, rng: np.random.Generator, n: int):
    """Deterministic corpus mutations: truncations, byte flips, length-field
    corruption, duplications, and random prefixes."""
    data = bytearray(data)
    ln = len(data)
    for i in range(n):
        kind = i % 5
        if kind == 0:  # truncate
            yield bytes(data[: int(rng.integers(0, ln + 1))])
        elif kind == 1:  # flip a few bytes
            b = bytearray(data)
            for _ in range(int(rng.integers(1, 8))):
                b[int(rng.integers(0, ln))] ^= int(rng.integers(1, 256))
            yield bytes(b)
        elif kind == 2:  # corrupt a dword (likely a length/offset field)
            b = bytearray(data)
            pos = int(rng.integers(0, max(ln - 4, 1)))
            b[pos:pos + 4] = struct.pack("<I", int(rng.integers(0, 1 << 32)))
            yield bytes(b)
        elif kind == 3:  # duplicate a slice
            lo = int(rng.integers(0, ln))
            hi = int(rng.integers(lo, min(lo + 64, ln)))
            yield bytes(data[:hi] + data[lo:hi] + data[hi:])
        else:  # garbage prefix / suffix
            junk = rng.integers(0, 256, int(rng.integers(1, 32)), np.uint8).tobytes()
            yield junk + bytes(data) if i % 2 else bytes(data) + junk


def check_no_crash(fn, corpus, allowed=(Exception,)):
    """fn(mutated_bytes) must either succeed or raise a Python exception."""
    failures = 0
    for blob in corpus:
        try:
            fn(blob)
        except allowed:
            failures += 1
        # any non-Exception escape (segfault, abort) would kill pytest itself
    return failures


# --------------------------------- WAV ---------------------------------


def test_fuzz_wav():
    from dali_tpu.backend.audio import decode_wav

    rng = np.random.default_rng(1)
    pcm = (np.sin(np.arange(2000) * 0.05) * 0.5).astype(np.float32)
    ints = np.clip(np.round(pcm * 32767), -32768, 32767).astype("<i2").tobytes()
    wav = (b"RIFF" + struct.pack("<I", 36 + len(ints)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
           + b"data" + struct.pack("<I", len(ints)) + ints)
    check_no_crash(decode_wav, mutations(wav, rng, N_MUTATIONS))


# --------------------------------- JPEG ---------------------------------


@pytest.fixture(scope="module")
def jpeg_bytes():
    import cv2

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 85])
    return enc.tobytes()


def test_fuzz_jpeg_peek_shape(jpeg_bytes):
    from dali_tpu.imgcodec import peek_shape

    rng = np.random.default_rng(3)
    check_no_crash(peek_shape, mutations(jpeg_bytes, rng, N_MUTATIONS))


def test_fuzz_jpeg_huffman_native(jpeg_bytes):
    from dali_tpu import native

    if not native.available():
        pytest.skip("native runtime not built")
    rng = np.random.default_rng(4)

    def decode(blob):
        # returns None on unsupported/corrupt — must not crash the process
        native.jpeg_read_coeffs_split_crop(blob, 4, 4, 6, 8, 3, 4, impl="huff")

    check_no_crash(decode, mutations(jpeg_bytes, rng, N_MUTATIONS))


def test_fuzz_jpeg_libjpeg_path(jpeg_bytes):
    from dali_tpu import native

    if not native.available():
        pytest.skip("native runtime not built")
    rng = np.random.default_rng(5)

    def decode(blob):
        native.jpeg_read_coeffs_split_crop(blob, 4, 4, 6, 8, 3, 4, impl="libjpeg")

    # fewer samples: libjpeg whole-image decode per blob is slower
    check_no_crash(decode, mutations(jpeg_bytes, rng, 300))


# --------------------------------- FLAC/audio ---------------------------------


def test_fuzz_audio_native():
    from dali_tpu import native

    if not (native.available() and native.has_audio()):
        pytest.skip("native audio not built")
    pcm = (np.sin(np.arange(4000) * 0.03) * 0.3).astype(np.float32)
    flac = native.audio_encode(pcm, 16000, "flac")
    rng = np.random.default_rng(6)
    check_no_crash(native.audio_decode, mutations(flac, rng, 400))


# --------------------------------- TFRecord ---------------------------------


def test_fuzz_tfrecord(tmp_path):
    from dali_tpu import tfrecord as tfr

    payloads = [
        tfr.write_example({"label": np.int64(3), "data": b"\x01\x02\x03" * 40})
        for _ in range(3)
    ]
    path = str(tmp_path / "data.tfrecord")
    with open(path, "wb") as f:
        for p in payloads:
            tfr.write_record(f, p)
    base = open(path, "rb").read()
    rng = np.random.default_rng(7)

    def parse(blob):
        import io

        f = io.BytesIO(blob)
        while True:
            rec = tfr.read_record(f)
            if rec is None:
                break
            tfr.parse_example(rec)

    check_no_crash(parse, mutations(base, rng, N_MUTATIONS))


def test_fuzz_tfrecord_index(tmp_path):
    from dali_tpu import tfrecord as tfr

    path = str(tmp_path / "x.tfrecord")
    with open(path, "wb") as f:
        tfr.write_record(f, tfr.write_example({"a": b"zz"}))
    base = open(path, "rb").read()
    rng = np.random.default_rng(8)

    def index(blob):
        p2 = str(tmp_path / "mut.tfrecord")
        with open(p2, "wb") as f:
            f.write(blob)
        tfr.build_index(p2)

    check_no_crash(index, mutations(base, rng, 300))


# --------------------------------- LMDB ---------------------------------


def test_fuzz_lmdb(tmp_path):
    from dali_tpu._lmdb import LmdbFile, write_lmdb

    path = str(tmp_path / "base.mdb")
    write_lmdb(path, [(f"k{i:04d}".encode(), b"v" * (i % 97)) for i in range(64)])
    base = open(path, "rb").read()
    rng = np.random.default_rng(9)

    def walk(blob):
        p2 = str(tmp_path / "mut.mdb")
        with open(p2, "wb") as f:
            f.write(blob)
        db = LmdbFile(p2)
        try:
            n = 0
            for _k, _v in db.items():
                n += 1
                if n > 10_000:  # malformed trees must not loop unboundedly
                    raise RuntimeError("runaway iteration")
        finally:
            close = getattr(db, "close", None)
            if close:
                close()

    check_no_crash(walk, mutations(base, rng, 600))


# --------------------------------- protobuf wire ---------------------------------


def test_fuzz_protobuf_wire():
    from dali_tpu import tfrecord as tfr

    # raw wire-format scanning on arbitrary bytes (the Example parser's core)
    rng = np.random.default_rng(10)
    base = tfr.write_example({"label": np.int64(1), "raw": b"\xff" * 100})

    def scan(blob):
        list(tfr._iter_fields(memoryview(blob)))

    check_no_crash(scan, mutations(base, rng, N_MUTATIONS))


# --------------------------------- tar / webdataset index ---------------------------------


def test_fuzz_tar_index(tmp_path):
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for i in range(4):
            data = b"x" * (i * 37 + 1)
            ti = tarfile.TarInfo(name=f"s{i:03d}.cls")
            ti.size = len(data)
            tar.addfile(ti, io.BytesIO(data))
    base = buf.getvalue()
    rng = np.random.default_rng(11)

    from dali_tpu import fn, pipeline_def

    def index(blob):
        p2 = str(tmp_path / "mut.tar")
        with open(p2, "wb") as f:
            f.write(blob)

        @pipeline_def(batch_size=1, num_threads=1, seed=1)
        def p():
            out = fn.readers.webdataset(paths=[p2], ext=["cls"], name="W")
            return out

        pipe = p()
        pipe.build()
        pipe.run()

    check_no_crash(index, mutations(base, rng, 120))


@pytest.mark.parametrize("subsamp", [1, 2])
def test_fuzz_jpeg_huffman_other_samplings(subsamp):
    """Mutation fuzz over 4:4:4 / 4:2:2 streams (the round-2 fast-path
    extensions) — same no-crash contract."""
    from dali_tpu import native

    if not native.available():
        pytest.skip("native runtime not built")
    rng = np.random.default_rng(20 + subsamp)
    img = rng.integers(0, 256, (56, 64, 3), np.uint8)
    base = native.jpeg_encode_rgb(img, quality=85, subsamp=subsamp)

    def decode(blob):
        native.jpeg_read_coeffs_split_crop(blob, 4, 4, 8, 8, 8, 4, impl="huff")

    check_no_crash(decode, mutations(base, rng, 800))
