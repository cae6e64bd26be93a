"""Tiling preprocessor, polygon devkit, merge pipeline."""
import os
import pickle

import numpy as np
import pytest

from jdet_tpu.data.devkits.polygon import (
    poly_iou,
    poly_iou_aligned,
    nms_poly_np,
    quad_area,
)
from jdet_tpu.data.devkits.tiling import (
    window_grid,
    split_objects_for_window,
    split_single_image,
    convert_to_pkl,
    parse_dota_label,
)
from jdet_tpu.data.devkits.result_merge import (
    parse_tile_name,
    merge_results,
    write_dota_submission,
)

rng = np.random.RandomState(13)


def rect_poly(cx, cy, w, h):
    return np.array(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy - h / 2,
         cx + w / 2, cy + h / 2, cx - w / 2, cy + h / 2], np.float64
    )


def test_poly_iou_exact():
    p1 = rect_poly(10, 10, 10, 10)[None]
    p2 = rect_poly(15, 10, 10, 10)[None]
    iou = poly_iou(p1, p2)
    assert np.allclose(iou[0, 0], 50 / 150, atol=1e-6)
    assert np.allclose(poly_iou(p1, p1)[0, 0], 1.0, atol=1e-9)


def test_poly_iou_rotated_quads():
    # diamond vs its bounding square: inter = diamond area = 1/2 square
    sq = rect_poly(0, 0, 2, 2)[None]
    diamond = np.array([[0, -1, 1, 0, 0, 1, -1, 0]], np.float64)
    iou = poly_iou(sq, diamond)[0, 0]
    assert np.allclose(iou, 2 / 4, atol=1e-9)


def test_nms_poly():
    polys = np.stack([
        rect_poly(10, 10, 10, 10),
        rect_poly(11, 10, 10, 10),
        rect_poly(40, 40, 10, 10),
    ])
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms_poly_np(polys, scores, 0.3)
    assert sorted(keep.tolist()) == [0, 2]


def test_window_grid():
    # 2048 wide, subsize 1024, gap 200 -> starts 0, 824, 1024 (last window)
    ws = window_grid(2048, 1024, 1024, 200)
    lefts = sorted({l for l, u in ws})
    assert lefts[0] == 0 and lefts[-1] == 1024
    assert all(l + 1024 <= 2048 or l == 1024 for l in lefts)
    # small image: single window at 0
    assert window_grid(512, 512, 1024, 200) == [(0, 0)]


def test_split_objects_rules():
    polys = np.stack([
        rect_poly(100, 100, 40, 20),   # fully inside
        rect_poly(1020, 100, 60, 30),  # cut by right edge (half in)
        rect_poly(2000, 2000, 40, 40), # outside
    ])
    names = ["plane", "ship", "car"]
    diffs = [0, 0, 0]
    out = split_objects_for_window(
        polys, names, diffs, 0, 0, 1024, 1024, 1024, thresh=0.7
    )
    assert len(out) == 2
    by_name = {n: (p, d) for p, n, d in out}
    # fully-inside object keeps its exact poly
    assert np.allclose(by_name["plane"][0], polys[0], atol=1e-4)
    assert by_name["plane"][1] == 0
    # cut object is clipped to the window and marked difficult=2
    # (990..1050 clipped to 990..1024 -> 34/60 = 57% < thresh)
    p, d = by_name["ship"]
    assert d == 2
    assert p[0::2].max() <= 1024 + 1e-6


def test_split_and_convert_roundtrip(tmp_path):
    import cv2

    img = (rng.rand(1400, 1600, 3) * 255).astype(np.uint8)
    polys = np.stack([
        rect_poly(200, 200, 80, 40),
        rect_poly(900, 700, 60, 60),
        rect_poly(1500, 1300, 50, 30),
    ])
    names = ["plane", "ship", "plane"]
    diffs = [0, 0, 1]
    tiles = split_single_image(
        img, polys, names, diffs, "P0001",
        str(tmp_path / "images"), str(tmp_path / "labelTxt"),
        subsize=1024, gap=200,
    )
    assert len(tiles) == 4  # 2x2 windows
    # every tile image exists at the right size
    for t in tiles:
        im = cv2.imread(str(tmp_path / "images" / (t + ".png")))
        assert im.shape == (1024, 1024, 3)
    # object 1 at (200, 200) appears unclipped in tile (0, 0)
    p, n, d = parse_dota_label(
        str(tmp_path / "labelTxt" / (tiles[0] + ".txt"))
    )
    assert "plane" in n
    # convert to pkl
    pkl = convert_to_pkl(
        str(tmp_path), str(tmp_path / "labels.pkl"),
        ["plane", "ship"], filter_empty_gt=True,
    )
    with open(pkl, "rb") as f:
        recs = pickle.load(f)
    assert len(recs) >= 1
    r = recs[0]
    assert r["ann"]["bboxes"].shape[1] == 5
    assert set(np.unique(r["ann"]["labels"])) <= {1, 2}


def test_multiscale_split_and_merge(tmp_path):
    """ms pipeline smoke (s2anet 79.72 recipe, reference README.md:102):
    tiling at rates 0.5/1.0/1.5 writes rate-tagged tiles, and the merge
    step divides tile coords by the rate so all scales land in original
    image space."""
    import cv2

    from jdet_tpu.data.devkits.tiling import process

    src = tmp_path / "src"
    (src / "images").mkdir(parents=True)
    (src / "labelTxt").mkdir(parents=True)
    img = (rng.rand(900, 1100, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(src / "images" / "P07.png"), img)
    poly = rect_poly(300, 260, 120, 60)
    with open(src / "labelTxt" / "P07.txt", "w") as f:
        f.write(" ".join(str(float(v)) for v in poly) + " plane 0\n")

    out = tmp_path / "tiled"
    tiles = process(str(src / "images"), str(src / "labelTxt"), str(out),
                    subsize=512, gap=128, rates=[0.5, 1.0, 1.5],
                    num_workers=2)
    seen_rates = {parse_tile_name(t)[1] for t in tiles}
    assert seen_rates == {0.5, 1.0, 1.5}
    # every rate's tile grid covers the rescaled image
    for t in tiles:
        im = cv2.imread(str(out / "images" / (t + ".png")))
        assert im.shape == (512, 512, 3)

    # merge: the same object detected on a 0.5x tile and a 1.0x tile must
    # land on the same original coords and dedup to one detection
    det_half = {  # 0.5x tile at offset (0, 0): poly coords are halved
        "polys": (poly * 0.5)[None].astype(np.float32),
        "scores": np.array([0.7], np.float32),
        "labels": np.array([0]),
        "valid": np.array([True]),
    }
    det_full = {
        "polys": poly[None].astype(np.float32),
        "scores": np.array([0.9], np.float32),
        "labels": np.array([0]),
        "valid": np.array([True]),
    }
    merged = merge_results(
        [(det_half, {"filename": "P07__0.5__0___0.png"}),
         (det_full, {"filename": "P07__1.0__0___0.png"})],
        ["plane"], iou_thr=0.3,
    )
    dets = merged["P07"]["plane"]
    assert dets.shape == (1, 9)
    assert abs(dets[0, 8] - 0.9) < 1e-6
    np.testing.assert_allclose(dets[0, :8], poly, atol=1e-2)


def test_parse_tile_name():
    assert parse_tile_name("P0001__1.0__512___824") == ("P0001", 1.0, 512, 824)
    assert parse_tile_name("P00__05__1.5__0___0") == ("P00__05", 1.5, 0, 0)
    assert parse_tile_name("plain") == ("plain", 1.0, 0, 0)


def test_merge_results_dedup():
    # same object seen in two overlapping tiles -> one merged detection
    det1 = {
        "polys": rect_poly(900, 100, 40, 20)[None].astype(np.float32),
        "scores": np.array([0.9], np.float32),
        "labels": np.array([0]),
        "valid": np.array([True]),
    }
    det2 = {
        "polys": rect_poly(76, 100, 40, 20)[None].astype(np.float32),
        "scores": np.array([0.8], np.float32),
        "labels": np.array([0]),
        "valid": np.array([True]),
    }
    results = [
        (det1, {"filename": "P0001__1.0__0___0.png"}),
        (det2, {"filename": "P0001__1.0__824___0.png"}),
    ]
    merged = merge_results(results, ["plane"], iou_thr=0.3)
    dets = merged["P0001"]["plane"]
    assert dets.shape == (1, 9)
    assert abs(dets[0, 8] - 0.9) < 1e-6  # higher score kept
    assert abs((dets[0, 0] + dets[0, 2]) / 2 - 900) < 1e-3


def test_write_submission(tmp_path):
    merged = {"P0001": {"plane": np.concatenate(
        [rect_poly(10, 10, 4, 4)[None], [[0.5]]], 1)}}
    files = write_dota_submission(
        merged, ["plane", "ship"], str(tmp_path),
        zip_path=str(tmp_path / "sub.zip"),
    )
    assert len(files) == 2
    content = open(files[0]).read()
    assert content.startswith("P0001 0.5000")
    assert os.path.exists(tmp_path / "sub.zip")


def test_native_polygon_kernels_match_numpy():
    from jdet_tpu.csrc import poly_iou_native, poly_nms_native, get_lib
    from jdet_tpu.data.devkits import polygon as pg

    assert get_lib() is not None, "native build failed (g++ available?)"
    p1 = np.stack([rect_poly(rng.uniform(0, 100), rng.uniform(0, 100),
                             rng.uniform(5, 30), rng.uniform(5, 30))
                   for _ in range(40)])
    p2 = np.stack([rect_poly(rng.uniform(0, 100), rng.uniform(0, 100),
                             rng.uniform(5, 30), rng.uniform(5, 30))
                   for _ in range(30)])
    native = poly_iou_native(p1, p2)
    # numpy reference (bypass native dispatch)
    pp1 = np.repeat(p1, len(p2), 0)
    pp2 = np.tile(p2, (len(p1), 1))
    inter = pg.poly_intersection_areas(pp1, pp2).reshape(len(p1), len(p2))
    a1 = pg.quad_area(p1)[:, None]
    a2 = pg.quad_area(p2)[None, :]
    ref = np.where(a1 + a2 - inter > 1e-9, inter / (a1 + a2 - inter), 0)
    assert np.abs(native - ref).max() < 1e-9

    scores = rng.rand(40)
    kn = poly_nms_native(p1, scores, 0.3)
    # numpy greedy oracle
    order = np.argsort(-scores)
    keep, supp = [], np.zeros(40, bool)
    for i in order:
        if supp[i]:
            continue
        keep.append(i)
        for j in order:
            if supp[j] or j == i or scores[j] > scores[i]:
                continue
            if ref_iou := float(poly_iou_native(p1[i][None], p1[j][None])[0, 0]):
                if ref_iou > 0.3:
                    supp[j] = True
    assert sorted(kn.tolist()) == sorted(keep)


def test_coco_map_perfect_and_miss():
    from jdet_tpu.data.coco import coco_map

    gt = {0: (np.array([[10, 10, 50, 50], [60, 60, 90, 90]], float),
              np.array([1, 2]))}
    # perfect detections
    dets = {0: (np.array([[10, 10, 50, 50], [60, 60, 90, 90]], float),
                np.array([0.9, 0.8]), np.array([0, 1]))}
    out = coco_map(dets, gt, 2)
    assert out["mAP50"] > 0.99
    assert out["mAP"] > 0.99
    # off detections (IoU ~0.5): AP50 high, mAP much lower
    dets2 = {0: (np.array([[10, 10, 50, 36], [60, 60, 90, 78]], float),
                 np.array([0.9, 0.8]), np.array([0, 1]))}
    out2 = coco_map(dets2, gt, 2)
    assert out2["mAP50"] > 0.99
    assert out2["mAP"] < 0.7
    # wrong class: zero
    dets3 = {0: (np.array([[10, 10, 50, 50]], float), np.array([0.9]),
                 np.array([1]))}
    out3 = coco_map(dets3, gt, 2)
    assert out3["mAP50"] < 0.5


def test_coco_dataset_loads(tmp_path):
    import json as _json
    import cv2
    from jdet_tpu.data.coco import COCODataset

    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    cv2.imwrite(str(img_dir / "a.png"), np.zeros((64, 64, 3), np.uint8))
    ann = {
        "images": [{"id": 1, "file_name": "a.png", "width": 64, "height": 64}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 7,
             "bbox": [10, 10, 20, 12], "iscrowd": 0},
        ],
        "categories": [{"id": 7, "name": "cat"}, {"id": 9, "name": "dog"}],
    }
    ann_file = tmp_path / "instances.json"
    ann_file.write_text(_json.dumps(ann))
    ds = COCODataset(annotations_file=str(ann_file), images_dir=str(img_dir),
                     image_size=(64, 64), max_gt=4)
    assert ds.CLASSES == ["cat", "dog"]
    assert len(ds) == 1
    img, target = ds.load_sample(0)
    assert target["rboxes"].shape == (1, 5)
    assert np.allclose(target["rboxes"][0], [20, 16, 20, 12, 0], atol=1e-4)
    assert target["labels"][0] == 1


def test_draw_polys():
    from jdet_tpu.utils.visualization import draw_polys

    img = np.zeros((64, 64, 3), np.uint8)
    polys = rect_poly(32, 32, 20, 10)[None]
    out = draw_polys(img, polys, np.array([0.9]), np.array([2]),
                     ["a", "b", "c"], score_thr=0.5)
    assert out.shape == img.shape
    assert (out > 0).any()  # something was drawn
    # below-threshold detection draws nothing
    out2 = draw_polys(img, polys, np.array([0.1]), np.array([2]),
                      ["a", "b", "c"], score_thr=0.5)
    assert not (out2 > 0).any()


def test_coco_protocol_full_metrics():
    """AP75 / area-range / AR semantics of the full COCO evaluator
    (reference pycocotools protocol, data/coco.py:203-391)."""
    from jdet_tpu.data.coco import coco_map

    # one small gt (16x16=256 < 32^2) and one large gt (128x128)
    gt = {0: (np.array([[0, 0, 16, 16], [200, 200, 328, 328]], float),
              np.array([1, 1]))}
    # det A: perfect on the small gt; det B: IoU ~0.6 on the large gt
    detA = [0, 0, 16, 16]
    detB = [200, 200, 277, 328]  # w 77 vs 128 -> IoU 77/128 ~ 0.6
    dets = {0: (np.array([detA, detB], float),
                np.array([0.9, 0.8]), np.array([0, 0]))}
    out = coco_map(dets, gt, 1)
    # AP50: both matched -> 1.0. AP75: only det A (IoU 1.0) counts; det B
    # is a false positive at 0.75 -> precision drops after recall 0.5
    assert out["mAP50"] == pytest.approx(1.0, abs=1e-6)
    assert 0.4 < out["mAP75"] < 0.6
    # small range: only the small gt counts, det A matches it -> 1.0
    assert out["mAP_small"] == pytest.approx(1.0, abs=1e-6)
    # large range: only large gt; det A unmatched but outside range ->
    # ignored, det B matches at IoU .6 (so AP at thr<=.6 is 1, above 0)
    assert 0.2 < out["mAP_large"] < 0.7
    # AR@1: one det per image -> only det A (highest score) participates;
    # recall = matched/2 averaged over thresholds
    assert 0.2 <= out["AR@1"] <= 0.5
    assert out["AR@100"] >= out["AR@10"] >= out["AR@1"]


def test_coco_ignored_gt_absorbs_match_without_fp():
    """A det matching only an out-of-range gt is ignored, not a FP."""
    from jdet_tpu.data.coco import coco_map

    gt = {0: (np.array([[0, 0, 16, 16], [100, 100, 228, 228]], float),
              np.array([1, 1]))}
    dets = {0: (np.array([[0, 0, 16, 16], [100, 100, 228, 228]], float),
                np.array([0.9, 0.8]), np.array([0, 0]))}
    out = coco_map(dets, gt, 1)
    # large-range eval: small det would be a FP if not ignored; since it
    # is unmatched AND outside the range it is ignored -> AP_large = 1.0
    assert out["mAP_large"] == pytest.approx(1.0, abs=1e-6)
    assert out["mAP_small"] == pytest.approx(1.0, abs=1e-6)


def test_draw_bboxes_routes_and_gt_vis(tmp_path):
    """draw_bboxes width routing (4/5/8) + score sort/threshold, and the
    DOTA-GT visualizer flow (reference utils/draw.py:261-344,
    utils/visualization.py:20-54)."""
    import cv2
    from jdet_tpu.utils.visualization import draw_bboxes, visualize_gt

    img = np.zeros((64, 64, 3), np.uint8)
    hbb = np.array([[8, 8, 30, 24]], np.float32)
    obb = np.array([[32, 32, 20, 10, 0.4]], np.float32)
    poly = rect_poly(48, 48, 16, 8)[None]
    for boxes in (hbb, obb, poly):
        out = draw_bboxes(img, boxes, labels=np.array([1]),
                          scores=np.array([0.9]), class_names=["a", "b"])
        assert out.shape == img.shape and (out > 0).any()
    # score_thr filters everything -> untouched canvas
    out = draw_bboxes(img, hbb, scores=np.array([0.1]), score_thr=0.5)
    assert not (out > 0).any()
    # single named color applies to all classes
    out = draw_bboxes(img, hbb, colors="green", with_text=False)
    assert (out[..., 1] > 0).any() and not (out[..., 0] > 0).any()

    # GT visualizer over a tiny on-disk dataset
    import pickle
    from jdet_tpu.data.dota import DOTADataset

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "t0.png"), np.zeros((64, 64, 3), np.uint8))
    infos = [{"filename": "t0.png", "width": 64, "height": 64,
              "ann": {"bboxes": obb, "labels": np.array([1], np.int32),
                      "bboxes_ignore": np.zeros((0, 5), np.float32)}}]
    ann = tmp_path / "labels.pkl"
    ann.write_bytes(pickle.dumps(infos))
    ds = DOTADataset(version="1", annotations_file=str(ann),
                     images_dir=str(img_dir), transforms=[],
                     image_size=(64, 64), max_gt=4, batch_size=1)
    written = visualize_gt(ds, str(tmp_path / "vis"))
    assert len(written) == 1
    assert (cv2.imread(written[0]) > 0).any()
