"""Shared fixture for the two multi-device checks of the PRODUCTION
hybrid-decode program (VERDICT r4 #2): ``__graft_entry__.py``'s
``check_real_program_sharded`` (traces the sparse-wire device program under
a sharded mesh, asserts bit-equality vs single-device) and
``tools/multiprocess_test.py``'s ``_hybrid_phase`` (2-process
DALIGenericIterator over the same program).

Both checks must exercise the SAME pipeline shape — decode scale, resample
target, CMN constants — or they silently validate different programs. The
shape lives here once; change it here and both checks follow (review r5).
"""

# the flagship hybrid pipeline's shape: ImageNet CMN constants, 64x64
# resample target (small enough for the virtual-CPU mesh), hybrid_scale=2
# (ships quarter-size DCT coefficients over the sparse wire)
HYBRID_SCALE = 2
OUT_SIZE = 64
CMN_MEAN = [123.675, 116.28, 103.53]
CMN_STD = [58.395, 57.12, 57.375]


def write_jpeg(path, rng, h, w):
    """One synthetic JPEG of the shape both checks decode: low-frequency
    content (an 8x-upscaled random small image) at quality 85, so the
    sparse coefficient wire carries a realistic mask density."""
    import cv2

    small = rng.integers(0, 256, (h // 8, w // 8, 3), "uint8")
    cv2.imwrite(path, cv2.resize(small, (w, h)),
                [cv2.IMWRITE_JPEG_QUALITY, 85])


def hybrid_tail(enc, with_decoded=False):
    """The production device-program tail from an encoded-JPEG graph node:
    hybrid ROI decode (sparse DCT wire + device IDCT) -> own-kernel resample
    -> fused CMN. Keep in lockstep with the headline bench pipeline.

    ``with_decoded=True`` additionally returns a fixed 32x32 centre crop of
    the decoded uint8 image, so the sharded-vs-solo check can pin BIT-equality
    of the entire quantised decode program (sparse gather + IDCT + chroma +
    colour + round) separately from the float resample tail, whose dot
    reductions XLA legitimately reassociates across shape specialisations."""
    from dali_tpu import fn, types

    img = fn.decoders.image_random_crop(
        enc, device="mixed", hybrid_device_decode=True,
        hybrid_scale=HYBRID_SCALE)
    out = fn.resize(img, resize_x=OUT_SIZE, resize_y=OUT_SIZE)
    out = fn.crop_mirror_normalize(
        out, dtype=types.FLOAT, output_layout="CHW",
        mean=CMN_MEAN, std=CMN_STD)
    if with_decoded:
        return out, fn.crop(img, crop=(32, 32))
    return out
