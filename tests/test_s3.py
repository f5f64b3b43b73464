"""S3 storage layer tests against an in-process mock S3 HTTP server
(reference dali/util/s3_filesystem.cc + discover_files_s3.cc; offline test
pattern like the reference's mocked filesystem tests)."""

import http.server
import threading
import urllib.parse

import numpy as np
import pytest

from dali_tpu import _s3


class MockS3Handler(http.server.BaseHTTPRequestHandler):
    objects = {}  # {bucket: {key: bytes}}
    auth_seen = []

    def log_message(self, *a):
        pass

    def do_GET(self):
        parsed = urllib.parse.urlparse(self.path)
        parts = parsed.path.lstrip("/").split("/", 1)
        bucket = parts[0]
        key = urllib.parse.unquote(parts[1]) if len(parts) > 1 else ""
        q = urllib.parse.parse_qs(parsed.query)
        MockS3Handler.auth_seen.append(self.headers.get("Authorization", ""))
        store = self.objects.get(bucket)
        if store is None:
            self.send_error(404, "NoSuchBucket")
            return
        if q.get("list-type"):
            prefix = q.get("prefix", [""])[0]
            keys = sorted(k for k in store if k.startswith(prefix))
            # paginate in chunks of 2 to exercise continuation tokens
            token = q.get("continuation-token", [None])[0]
            start = int(token) if token else 0
            chunk = keys[start:start + 2]
            truncated = start + 2 < len(keys)
            body = ['<?xml version="1.0"?>',
                    '<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">']
            for k in chunk:
                body.append(f"<Contents><Key>{k}</Key><Size>{len(store[k])}</Size></Contents>")
            body.append(f"<IsTruncated>{'true' if truncated else 'false'}</IsTruncated>")
            if truncated:
                body.append(f"<NextContinuationToken>{start + 2}</NextContinuationToken>")
            body.append("</ListBucketResult>")
            payload = "".join(body).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)
            return
        if key in store:
            payload = store[key]
            rng = self.headers.get("Range")
            status = 200
            if rng:
                lo, hi = rng.split("=")[1].split("-")
                payload = payload[int(lo):int(hi) + 1]
                status = 206
            self.send_response(status)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)
        else:
            self.send_error(404, "NoSuchKey")


@pytest.fixture()
def mock_s3(monkeypatch):
    import cv2

    objects = {"bucket": {}}
    rng = np.random.default_rng(0)
    for cls in ("cats", "dogs"):
        for i in range(3):
            img = rng.integers(0, 256, (32, 40, 3), np.uint8)
            ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 90])
            objects["bucket"][f"train/{cls}/img{i}.jpg"] = enc.tobytes()
    objects["bucket"]["plain/data.bin"] = b"hello s3 world" * 10
    MockS3Handler.objects = objects
    MockS3Handler.auth_seen = []
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), MockS3Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    monkeypatch.setenv("AWS_ENDPOINT_URL", f"http://127.0.0.1:{server.server_port}")
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "test-access")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "test-secret")
    _s3.reset_client()
    yield server
    _s3.reset_client()
    server.shutdown()


def test_list_and_get(mock_s3):
    uris = _s3.list_uris("s3://bucket/train")
    assert len(uris) == 6  # paginated twice (chunks of 2)
    assert all(u.startswith("s3://bucket/train/") for u in uris)
    data = _s3.read_bytes("s3://bucket/plain/data.bin")
    assert data == b"hello s3 world" * 10
    # every request carried a SigV4 authorization header
    assert all(a.startswith("AWS4-HMAC-SHA256 Credential=test-access/")
               for a in MockS3Handler.auth_seen)


def test_ranged_get(mock_s3):
    part = _s3.client().get_object("bucket", "plain/data.bin", byte_range=(6, 8))
    assert part == b"s3"


def test_file_reader_from_s3_root(mock_s3):
    from dali_tpu import fn, pipeline_def

    @pipeline_def(batch_size=6, num_threads=1, seed=1)
    def p():
        data, labels = fn.readers.file(file_root="s3://bucket/train", name="R")
        img = fn.decoders.image(data, device="cpu")
        return img, labels

    pipe = p()
    pipe.build()
    img, labels = pipe.run()
    got = sorted(int(labels.at(i)) for i in range(6))
    assert got == [0, 0, 0, 1, 1, 1]  # cats=0, dogs=1 (sorted label dirs)
    assert img.at(0).shape == (32, 40, 3)


def test_missing_object_fails_cleanly(mock_s3):
    with pytest.raises(Exception):
        _s3.read_bytes("s3://bucket/nope.bin")


def test_webdataset_reader_from_s3(mock_s3):
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for i in range(4):
            for ext, payload in (("cls", str(i).encode()), ("txt", b"x" * (i + 1))):
                ti = tarfile.TarInfo(name=f"s{i:03d}.{ext}")
                ti.size = len(payload)
                tar.addfile(ti, io.BytesIO(payload))
    MockS3Handler.objects["bucket"]["shards/part0.tar"] = buf.getvalue()

    from dali_tpu import fn, pipeline_def

    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def p():
        cls, txt = fn.readers.webdataset(paths=["s3://bucket/shards/part0.tar"],
                                         ext=["cls", "txt"], name="W")
        return cls, txt

    pipe = p()
    pipe.build()
    cls, txt = pipe.run()
    assert bytes(cls.at(2)).decode() == "2"
    assert len(txt.at(3)) == 4


def test_numpy_reader_from_s3(mock_s3):
    import io

    for i in range(3):
        b = io.BytesIO()
        np.save(b, np.full((2, 2), i, np.int32))
        MockS3Handler.objects["bucket"][f"arrays/a{i}.npy"] = b.getvalue()

    from dali_tpu import fn, pipeline_def

    @pipeline_def(batch_size=3, num_threads=1, seed=1)
    def p():
        return fn.readers.numpy(file_root="s3://bucket/arrays", name="N")

    pipe = p()
    pipe.build()
    out = pipe.run()[0]
    vals = sorted(int(out.at(i)[0, 0]) for i in range(3))
    assert vals == [0, 1, 2]
