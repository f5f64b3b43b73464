"""High-bit-depth decode contract (VERDICT r3 missing #5; reference
``operators/imgcodec/image_decoder.h`` + ``util/convert_utils.h``): the
decoder's ``dtype`` arg converts to the full dynamic range of the requested
type — 16-bit PNG/TIFF decode at source precision, floats land in [0, 1].
JPEG 2000 is an explicit documented de-scope (loud error)."""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types
from dali_tpu import imgcodec

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def img16():
    rng = np.random.default_rng(3)
    return rng.integers(0, 65536, (24, 20, 3)).astype(np.uint16)


def _png16(img16):
    ok, buf = cv2.imencode(".png", img16[:, :, ::-1])  # cv2 encodes BGR
    assert ok
    return buf.tobytes()


def test_uint16_png_decodes_at_full_precision(img16):
    out = imgcodec.decode(_png16(img16), dtype=types.DALIDataType.UINT16)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, img16)


def test_uint16_to_uint8_scales_range_not_truncates(img16):
    out = imgcodec.decode(_png16(img16))  # default dtype = UINT8
    assert out.dtype == np.uint8
    # reference DynamicRangeMultiplier: 255/65535 with rounding (NOT >>8)
    expect = np.round(img16.astype(np.float64) * (255.0 / 65535.0)).astype(np.uint8)
    np.testing.assert_array_equal(out, expect)


def test_uint16_to_float_is_unit_range(img16):
    out = imgcodec.decode(_png16(img16), dtype=types.DALIDataType.FLOAT)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, img16 / 65535.0, atol=1e-6)
    assert out.max() <= 1.0


def test_uint16_tiff(img16):
    ok, buf = cv2.imencode(".tiff", img16[:, :, ::-1])
    assert ok
    out = imgcodec.decode(buf.tobytes(), dtype=types.DALIDataType.UINT16)
    np.testing.assert_array_equal(out, img16)


def test_uint8_jpeg_to_uint16_multiplies_by_257():
    rng = np.random.default_rng(4)
    img = cv2.resize(rng.integers(0, 256, (6, 5, 3), np.uint8), (40, 48),
                     interpolation=cv2.INTER_CUBIC)
    ok, buf = cv2.imencode(".jpg", img)
    u8 = imgcodec.decode(buf.tobytes())
    u16 = imgcodec.decode(buf.tobytes(), dtype=types.DALIDataType.UINT16)
    assert u16.dtype == np.uint16
    np.testing.assert_array_equal(u16, u8.astype(np.uint16) * 257)


def test_gray_16bit(img16):
    one = img16[:, :, 0].copy()
    ok, buf = cv2.imencode(".png", one)
    out = imgcodec.decode(buf.tobytes(), output_type=types.DALIImageType.GRAY,
                          dtype=types.DALIDataType.UINT16)
    assert out.shape == one.shape + (1,)
    np.testing.assert_array_equal(out[:, :, 0], one)


def test_pipeline_dtype_arg(img16, tmp_path):
    data = _png16(img16)

    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def pipe():
        enc = fn.external_source(
            source=lambda: [np.frombuffer(data, np.uint8)] * 2, batch=True)
        return fn.decoders.image(enc, device="cpu",
                                 dtype=types.DALIDataType.UINT16)

    p = pipe()
    p.build()
    out = p.run()[0]
    got = np.asarray(out.at(0))
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got, img16)


def test_jpeg2000_is_a_loud_descope():
    jp2 = b"\x00\x00\x00\x0cjP  \r\n\x87\n" + b"\x00" * 64
    with pytest.raises(NotImplementedError, match="JPEG 2000"):
        imgcodec.decode(jp2)
    raw = b"\xff\x4f\xff\x51" + b"\x00" * 64
    with pytest.raises(NotImplementedError, match="JPEG 2000"):
        imgcodec.decode(raw)


def test_hybrid_rejects_dtype_conversion():
    with pytest.raises(ValueError, match="hybrid_device_decode produces uint8"):
        @pipeline_def(batch_size=1, num_threads=1, seed=1)
        def pipe():
            enc = fn.external_source(
                source=lambda: [np.zeros(8, np.uint8)], batch=True)
            return fn.decoders.image(enc, device="mixed",
                                     hybrid_device_decode=True,
                                     dtype=types.DALIDataType.UINT16)
        pipe().build()


def test_float_tiff_source_converts_by_unit_range():
    """Float-typed sources (32-bit TIFF via IMREAD_ANYDEPTH) carry a [0, 1]
    dynamic range: uint8 targets scale by 255, float targets pass through —
    np.iinfo must not be called on the float source dtype (review r4)."""
    import cv2

    from dali_tpu import imgcodec, types

    rng = np.random.default_rng(3)
    f32 = rng.random((16, 20, 3)).astype(np.float32)
    ok, _ = True, None
    ok = cv2.imwrite("/tmp/dali_tpu_f32.tiff", f32)
    if not ok:
        import pytest

        pytest.skip("cv2 cannot write float TIFF here")
    data = open("/tmp/dali_tpu_f32.tiff", "rb").read()
    u8 = imgcodec.decode(data)  # default UINT8 target
    assert u8.dtype == np.uint8
    # cv2 loads BGR; imgcodec converts to RGB
    want = np.clip(np.round(f32[..., ::-1].astype(np.float64) * 255), 0, 255)
    np.testing.assert_array_equal(u8, want.astype(np.uint8))
    f = imgcodec.decode(data, dtype=types.FLOAT)
    assert f.dtype == np.float32
    np.testing.assert_allclose(f, f32[..., ::-1], rtol=1e-6)
