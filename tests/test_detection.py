"""Detection / segmentation / sequence op tests (reference: ``dali/test/python/``
bbox + ssd suites). Includes the COCO SSD-style pipeline (BASELINE config 4)."""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types


def _boxes_source(n=4, seed=0):
    rng = np.random.default_rng(seed)
    boxes, labels = [], []
    for _ in range(n):
        k = int(rng.integers(1, 5))
        x1 = rng.uniform(0, 0.6, k)
        y1 = rng.uniform(0, 0.6, k)
        w = rng.uniform(0.1, 0.39, k)
        h = rng.uniform(0.1, 0.39, k)
        boxes.append(np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32))
        labels.append(np.arange(1, k + 1, dtype=np.int32))
    return (lambda: boxes), (lambda: labels)


def test_bb_flip():
    boxes = np.array([[0.1, 0.2, 0.4, 0.6]], np.float32)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        b = fn.external_source(source=lambda: [boxes], batch=True)
        return fn.bb_flip(b, ltrb=True, horizontal=1)

    out = pipe().run()[0].at(0)
    np.testing.assert_allclose(out, [[0.6, 0.2, 0.9, 0.6]], atol=1e-6)


def test_random_bbox_crop():
    cb, lb = _boxes_source()

    @pipeline_def(batch_size=4, num_threads=1, seed=5)
    def pipe():
        boxes = fn.external_source(source=cb, batch=True)
        labels = fn.external_source(source=lb, batch=True)
        anchor, shape, out_boxes, out_labels = fn.random_bbox_crop(
            boxes,
            labels,
            aspect_ratio=[0.5, 2.0],
            thresholds=[0.1, 0.3],
            scaling=[0.3, 1.0],
            allow_no_crop=True,
        )
        return anchor, shape, out_boxes, out_labels

    anchor, shape, out_boxes, out_labels = pipe().run()
    for i in range(4):
        a, s = anchor.at(i), shape.at(i)
        assert a.shape == (2,) and s.shape == (2,)
        assert (a >= 0).all() and (a + s <= 1.0 + 1e-6).all()
        bb = out_boxes.at(i)
        if bb.size:
            assert (bb >= -1e-6).all() and (bb <= 1 + 1e-6).all()
        assert out_boxes.at(i).shape[0] == out_labels.at(i).shape[0]


def test_box_encoder():
    # 2 anchors; one gt box matching the first
    anchors = [0.0, 0.0, 0.5, 0.5, 0.5, 0.5, 1.0, 1.0]
    gt = np.array([[0.05, 0.05, 0.45, 0.45]], np.float32)
    labels = np.array([3], np.int32)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        b = fn.external_source(source=lambda: [gt], batch=True)
        l = fn.external_source(source=lambda: [labels], batch=True)
        return fn.box_encoder(b, l, anchors=anchors, criteria=0.5)

    eb, el = pipe().run()
    el0 = el.at(0)
    assert el0[0] == 3 and el0[1] == 0
    np.testing.assert_allclose(eb.at(0)[0], gt[0], atol=1e-6)
    np.testing.assert_allclose(eb.at(0)[1], anchors[4:], atol=1e-6)


def test_coco_ssd_pipeline(tmp_path, jpeg_dataset):
    """BASELINE config 4: COCO reader → random_bbox_crop → decode+slice →
    resize → bb_flip + box_encoder (ragged per-sample shapes throughout)."""
    import json, os

    img_dir = os.path.join(jpeg_dataset, "class0")
    files = sorted(os.listdir(img_dir))[:4]
    doc = {
        "images": [{"id": i + 1, "file_name": f, "width": 400, "height": 300} for i, f in enumerate(files)],
        "categories": [{"id": 1, "name": "a"}],
        "annotations": [
            {"id": i, "image_id": (i % 4) + 1, "category_id": 1,
             "bbox": [20 + 10 * i, 30, 120, 100], "iscrowd": 0}
            for i in range(8)
        ],
    }
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(doc))
    anchors = []
    for gy in range(2):
        for gx in range(2):
            anchors += [gx * 0.5, gy * 0.5, gx * 0.5 + 0.5, gy * 0.5 + 0.5]

    @pipeline_def(batch_size=4, num_threads=2, seed=11)
    def pipe():
        imgs, boxes, labels = fn.readers.coco(
            file_root=img_dir, annotations_file=str(ann), ltrb=True, ratio=True, name="R"
        )
        anchor, shp, boxes, labels = fn.random_bbox_crop(
            boxes, labels, thresholds=[0.05], scaling=[0.5, 1.0], allow_no_crop=True
        )
        images = fn.decoders.image(imgs, device="cpu")
        flip = fn.random.coin_flip(probability=0.5)
        boxes = fn.bb_flip(boxes, ltrb=True, horizontal=flip)
        enc_b, enc_l = fn.box_encoder(boxes, labels, anchors=anchors, criteria=0.3)
        images = fn.resize(images, resize_x=64, resize_y=64)
        return images, enc_b, enc_l

    imgs, eb, el = pipe().run()
    assert imgs.as_array().shape == (4, 64, 64, 3)
    assert eb.at(0).shape == (4, 4)
    assert el.at(0).shape == (4,)


def test_element_extract_and_rearrange():
    seq = np.arange(4 * 2 * 3).reshape(4, 2, 3).astype(np.float32)

    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def pipe():
        s = fn.external_source(source=lambda: [seq, seq + 100], batch=True, layout="FHW")
        first, last = fn.element_extract(s, element_map=[0, 3])
        rearranged = fn.sequence_rearrange(s, new_order=[3, 2, 1, 0])
        return first, last, rearranged

    f, l, r = pipe().run()
    np.testing.assert_array_equal(f.at(0), seq[0])
    np.testing.assert_array_equal(l.at(0), seq[3])
    np.testing.assert_array_equal(r.at(1), (seq + 100)[::-1])


def test_random_mask_pixel_and_object_bbox():
    mask = np.zeros((20, 20), np.int32)
    mask[5:9, 10:15] = 1

    @pipeline_def(batch_size=1, num_threads=1, seed=3)
    def pipe():
        m = fn.external_source(source=lambda: [mask], batch=True)
        pix = fn.segmentation.random_mask_pixel(m, foreground=1)
        start, shape = fn.segmentation.random_object_bbox(m, format="anchor_shape")
        return pix, start, shape

    pix, start, shape = pipe().run()
    y, x = pix.at(0)
    assert 5 <= y < 9 and 10 <= x < 15
    np.testing.assert_array_equal(start.at(0), [5, 10])
    np.testing.assert_array_equal(shape.at(0), [4, 5])


def test_select_masks():
    polys = np.array([[0, 0, 3], [1, 3, 7], [2, 7, 9]], np.int32)
    verts = np.arange(18).reshape(9, 2).astype(np.float32)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        ids = fn.external_source(source=lambda: [np.array([0, 2], np.int64)], batch=True)
        p = fn.external_source(source=lambda: [polys], batch=True)
        v = fn.external_source(source=lambda: [verts], batch=True)
        return fn.segmentation.select_masks(ids, p, v)

    p_out, v_out = pipe().run()
    np.testing.assert_array_equal(p_out.at(0), [[0, 0, 3], [2, 3, 5]])
    np.testing.assert_array_equal(v_out.at(0), np.concatenate([verts[0:3], verts[7:9]]))


def test_coco_polygon_and_pixelwise_masks(tmp_path):
    """COCO segmentation outputs (reference polygon_masks/pixelwise_masks):
    polygons as (mask_idx, start, end) rows over a shared vertex table, and
    a rasterized annotation-index mask."""
    import json

    import cv2
    import numpy as np

    from dali_tpu import fn, pipeline_def

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "i0.jpg"), np.zeros((40, 60, 3), np.uint8))
    ann = {
        "images": [{"id": 7, "file_name": "i0.jpg", "width": 60, "height": 40}],
        "categories": [{"id": 3, "name": "c"}],
        "annotations": [
            {"id": 1, "image_id": 7, "category_id": 3, "bbox": [5, 5, 20, 20],
             "iscrowd": 0,
             "segmentation": [[5, 5, 25, 5, 25, 25, 5, 25]]},
            {"id": 2, "image_id": 7, "category_id": 3, "bbox": [30, 10, 10, 12],
             "iscrowd": 0,
             "segmentation": [[30, 10, 40, 10, 40, 22], [31, 11, 39, 11, 39, 21]]},
        ],
    }
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def p():
        return fn.readers.coco(file_root=str(img_dir),
                               annotations_file=str(ann_file),
                               polygon_masks=True, pixelwise_masks=True,
                               name="C")

    pipe = p()
    pipe.build()
    _img, bb, labels, polygons, vertices, mask = pipe.run()
    polys = np.asarray(polygons.at(0))
    verts = np.asarray(vertices.at(0))
    assert polys.shape == (3, 3)
    assert list(polys[:, 0]) == [0, 1, 1]  # mask indices
    assert verts.shape == (4 + 3 + 3, 2)
    np.testing.assert_allclose(verts[polys[0, 1]:polys[0, 2]],
                               [[5, 5], [25, 5], [25, 25], [5, 25]])
    m = np.asarray(mask.at(0))
    assert m.shape == (40, 60, 1)
    assert m[15, 15, 0] == 1  # inside first polygon
    assert m[12, 35, 0] == 2  # inside second annotation
    assert m[0, 0, 0] == 0
