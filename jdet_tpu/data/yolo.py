"""YOLOv5-style dataset: txt labels, mosaic, letterbox, HSV/affine augs.

Capability mirror of the reference YoloDataset
(`python/jdet/data/yolo.py:40-1150`): YOLO-format label txts
("cls cx cy w h", normalized) next to an image dir or list file
(LoadImagesAndLabels, yolo.py:148+); training composes 4-image mosaic
(yolo.py load_mosaic), random affine (random_perspective), HSV jitter
(augment_hsv) and horizontal flip; eval uses letterbox resize.

Fixed-shape TPU contract: collate emits images (B, S, S, 3) float RGB
0-255 and targets {gt_hboxes (B, K, 4) xyxy pixels, gt_labels (B, K)
1-based, gt_mask (B, K)} — what YOLO.loss consumes.
"""
from __future__ import annotations

import os
import pickle

import numpy as np

from ..utils.registry import DATASETS
from .custom import CustomDataset, _imread


def letterbox(img, new_size, color=114, scaleup=True):
    """Aspect-preserving resize + pad to (S, S) (reference letterbox,
    data/yolo.py). Returns (img, scale, (dw, dh))."""
    import cv2

    h, w = img.shape[:2]
    s = min(new_size / h, new_size / w)
    if not scaleup:
        s = min(s, 1.0)
    nw, nh = int(round(w * s)), int(round(h * s))
    dw = (new_size - nw) / 2
    dh = (new_size - nh) / 2
    if (w, h) != (nw, nh):
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    out = cv2.copyMakeBorder(
        img, top, bottom, left, right, cv2.BORDER_CONSTANT,
        value=(color, color, color),
    )
    return out, s, (left, top)


def augment_hsv(img, rng, hgain=0.015, sgain=0.7, vgain=0.4):
    """HSV color jitter (reference augment_hsv)."""
    import cv2

    r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(
        cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2HSV)
    )
    x = np.arange(256)
    lut_h = ((x * r[0]) % 180).astype(np.uint8)
    lut_s = np.clip(x * r[1], 0, 255).astype(np.uint8)
    lut_v = np.clip(x * r[2], 0, 255).astype(np.uint8)
    img_hsv = cv2.merge(
        (cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s), cv2.LUT(val, lut_v))
    )
    return cv2.cvtColor(img_hsv, cv2.COLOR_HSV2RGB).astype(np.float32)


def random_affine(img, boxes, labels, rng, degrees=0.0, translate=0.1,
                  scale=0.5, fill=114):
    """Scale/translate/rotate affine with box remap + degenerate-box
    filtering (reference random_perspective, data/yolo.py)."""
    import cv2

    h, w = img.shape[:2]
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    M = cv2.getRotationMatrix2D((w / 2, h / 2), a, s)
    M[0, 2] += rng.uniform(0.5 - translate, 0.5 + translate) * w - w / 2
    M[1, 2] += rng.uniform(0.5 - translate, 0.5 + translate) * h - h / 2
    img = cv2.warpAffine(
        img.astype(np.float32), M, (w, h),
        borderValue=(fill, fill, fill),
    )
    if len(boxes):
        n = len(boxes)
        pts = np.ones((n * 4, 3))
        pts[:, :2] = boxes[:, [0, 1, 2, 1, 2, 3, 0, 3]].reshape(n * 4, 2)
        pts = (pts @ M.T).reshape(n, 8)
        xs = pts[:, 0::2]
        ys = pts[:, 1::2]
        new = np.stack([xs.min(1), ys.min(1), xs.max(1), ys.max(1)], 1)
        new[:, 0::2] = new[:, 0::2].clip(0, w)
        new[:, 1::2] = new[:, 1::2].clip(0, h)
        # filter degenerate boxes (reference box_candidates)
        ow = boxes[:, 2] - boxes[:, 0]
        oh = boxes[:, 3] - boxes[:, 1]
        nw_ = new[:, 2] - new[:, 0]
        nh_ = new[:, 3] - new[:, 1]
        ar = np.maximum(nw_ / (nh_ + 1e-16), nh_ / (nw_ + 1e-16))
        keep = (
            (nw_ > 2) & (nh_ > 2)
            & (nw_ * nh_ / (ow * oh * s * s + 1e-16) > 0.1) & (ar < 20)
        )
        boxes = new[keep]
        labels = labels[keep]
    return img, boxes, labels


@DATASETS.register_module()
class YoloDataset(CustomDataset):
    """YOLO txt-label dataset with mosaic/letterbox train augs."""

    def __init__(self, images_dir="", labels_dir=None, annotations_file=None,
                 img_size=640, mosaic=True, augment=True, degrees=0.0,
                 translate=0.1, scale=0.5, fliplr=0.5, hsv=True,
                 max_gt=128, **kw):
        kw.setdefault("image_size", (img_size, img_size))
        kw.setdefault("filter_empty_gt", False)
        super().__init__(annotations_file=None, images_dir=images_dir,
                         max_gt=max_gt, **kw)
        self.img_size = img_size
        self.mosaic = mosaic
        self.augment = augment
        self.degrees = degrees
        self.translate = translate
        self.scale = scale
        self.fliplr = fliplr
        self.hsv = hsv
        self.labels_dir = labels_dir
        if annotations_file is not None:
            # optional pkl route (same records as CustomDataset)
            with open(annotations_file, "rb") as f:
                self.img_infos = pickle.load(f)
        else:
            exts = (".jpg", ".jpeg", ".png", ".bmp")
            files = sorted(
                f for f in os.listdir(images_dir) if f.lower().endswith(exts)
            ) if os.path.isdir(images_dir) else []
            self.img_infos = [{"filename": f} for f in files]

    # ------------------------------------------------------------------
    def _load_raw(self, idx):
        """image (RGB float), hbb xyxy pixels, labels (1-based)."""
        info = self.img_infos[idx]
        img = _imread(os.path.join(self.images_dir, info["filename"])).astype(
            np.float32
        )
        h, w = img.shape[:2]
        if "ann" in info:
            hb = np.asarray(info["ann"].get("hboxes",
                                            info["ann"].get("bboxes")),
                            np.float32)
            if hb.ndim == 2 and hb.shape[-1] == 5:
                # CustomDataset-style pkl stores rotated (n, 5) boxes;
                # take the axis-aligned hull
                cx, cy, bw, bh, a = hb.T
                ca, sa = np.abs(np.cos(a)), np.abs(np.sin(a))
                ex = (bw * ca + bh * sa) / 2
                ey = (bw * sa + bh * ca) / 2
                hb = np.stack([cx - ex, cy - ey, cx + ex, cy + ey], 1)
            hb = hb.reshape(-1, 4).astype(np.float32)
            labels = np.asarray(info["ann"]["labels"], np.int64).reshape(-1)
        else:
            stem = os.path.splitext(info["filename"])[0]
            lab_dir = self.labels_dir or os.path.join(
                os.path.dirname(self.images_dir.rstrip("/")), "labels"
            )
            path = os.path.join(lab_dir, stem + ".txt")
            rows = []
            if os.path.exists(path):
                with open(path) as f:
                    for line in f.read().splitlines():
                        p = line.split()
                        if len(p) >= 5:
                            rows.append([float(v) for v in p[:5]])
            if rows:
                arr = np.asarray(rows, np.float32)
                cx, cy = arr[:, 1] * w, arr[:, 2] * h
                bw, bh = arr[:, 3] * w, arr[:, 4] * h
                hb = np.stack(
                    [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], 1
                )
                labels = arr[:, 0].astype(np.int64) + 1  # 0-based -> 1-based
            else:
                hb = np.zeros((0, 4), np.float32)
                labels = np.zeros((0,), np.int64)
        return img, hb, labels

    def _load_mosaic(self, idx, rng):
        """4-image mosaic on a 2S x 2S canvas, center jittered
        (reference load_mosaic, data/yolo.py)."""
        import cv2

        s = self.img_size
        yc = int(rng.uniform(s // 2, 2 * s - s // 2))
        xc = int(rng.uniform(s // 2, 2 * s - s // 2))
        idxs = [idx] + [int(rng.integers(len(self))) for _ in range(3)]
        canvas = np.full((2 * s, 2 * s, 3), 114.0, np.float32)
        all_b, all_l = [], []
        for i, ix in enumerate(idxs):
            img, hb, lab = self._load_raw(ix)
            h0, w0 = img.shape[:2]
            r = s / max(h0, w0)
            if r != 1:
                img = cv2.resize(img, (int(w0 * r), int(h0 * r)))
                hb = hb * r
            h, w = img.shape[:2]
            if i == 0:  # top-left
                x1a, y1a = max(xc - w, 0), max(yc - h, 0)
                x2a, y2a = xc, yc
                x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
            elif i == 1:  # top-right
                x1a, y1a = xc, max(yc - h, 0)
                x2a, y2a = min(xc + w, 2 * s), yc
                x1b, y1b = 0, h - (y2a - y1a)
            elif i == 2:  # bottom-left
                x1a, y1a = max(xc - w, 0), yc
                x2a, y2a = xc, min(2 * s, yc + h)
                x1b, y1b = w - (x2a - x1a), 0
            else:  # bottom-right
                x1a, y1a = xc, yc
                x2a, y2a = min(xc + w, 2 * s), min(2 * s, yc + h)
                x1b, y1b = 0, 0
            canvas[y1a:y2a, x1a:x2a] = img[
                y1b:y1b + (y2a - y1a), x1b:x1b + (x2a - x1a)
            ]
            if len(hb):
                b = hb.copy()
                b[:, 0::2] += x1a - x1b
                b[:, 1::2] += y1a - y1b
                all_b.append(b)
                all_l.append(lab)
        if all_b:
            boxes = np.concatenate(all_b, 0)
            labels = np.concatenate(all_l, 0)
            boxes = boxes.clip(0, 2 * s)
        else:
            boxes = np.zeros((0, 4), np.float32)
            labels = np.zeros((0,), np.int64)
        # affine back down to S x S (the reference folds the 2x downscale
        # into random_perspective's border argument)
        canvas2, boxes, labels = random_affine(
            canvas, boxes, labels, rng, degrees=self.degrees,
            translate=self.translate, scale=self.scale,
        )
        canvas2 = cv2.resize(canvas2, (s, s))
        boxes = boxes * 0.5
        return canvas2, boxes, labels

    # ------------------------------------------------------------------
    def load_sample(self, idx, rng=None):
        rng = rng or np.random.default_rng()
        if self.augment and self.mosaic:
            img, boxes, labels = self._load_mosaic(idx, rng)
        else:
            img, boxes, labels = self._load_raw(idx)
            img, s, (dx, dy) = letterbox(img, self.img_size,
                                         scaleup=self.augment)
            if len(boxes):
                boxes = boxes * s
                boxes[:, 0::2] += dx
                boxes[:, 1::2] += dy
        if self.augment:
            if self.hsv:
                img = augment_hsv(img, rng)
            if rng.random() < self.fliplr:
                img = np.ascontiguousarray(img[:, ::-1])
                if len(boxes):
                    w = img.shape[1]
                    boxes = boxes.copy()
                    boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
        target = {
            "hboxes": boxes.astype(np.float32),
            "labels": labels.astype(np.int64),
            "img_size": (img.shape[1], img.shape[0]),
            "ori_img_size": (img.shape[1], img.shape[0]),
            "scale_factor": 1.0,
            "filename": self.img_infos[idx]["filename"],
            "img_id": idx,
        }
        return img.astype(np.float32) / 255.0, target

    # ------------------------------------------------------------------
    def collate(self, samples):
        B = len(samples)
        S = self.img_size
        K = self.max_gt
        images = np.zeros((B, S, S, 3), np.float32)
        gt_hboxes = np.zeros((B, K, 4), np.float32)
        gt_labels = np.zeros((B, K), np.int32)
        gt_mask = np.zeros((B, K), bool)
        metas = []
        for i, (img, t) in enumerate(samples):
            h, w = img.shape[:2]
            images[i, :min(h, S), :min(w, S)] = img[:S, :S]
            k = min(len(t["hboxes"]), K)
            if k:
                gt_hboxes[i, :k] = t["hboxes"][:k]
                gt_labels[i, :k] = t["labels"][:k]
                gt_mask[i, :k] = True
            metas.append({k2: t.get(k2) for k2 in
                          ("img_size", "ori_img_size", "scale_factor",
                           "filename", "img_id")})
            # gt for evaluate(): letterboxed-coords hboxes + 1-based labels
            metas[-1]["hboxes"] = t["hboxes"]
            metas[-1]["labels"] = t["labels"]
        batch = {
            "images": images,
            "targets": {
                "gt_hboxes": gt_hboxes,
                "gt_labels": gt_labels,
                "gt_mask": gt_mask,
                "scale_factor": np.asarray(
                    [m["scale_factor"] for m in metas], np.float32
                ),
            },
        }
        return batch, metas

    # ------------------------------------------------------------------
    def evaluate(self, results, work_dir=None, epoch=None, **kw):
        """COCO-protocol hbb mAP (reference yolo eval protocol uses COCO
        metrics; numpy coco_map from data/coco.py)."""
        from .coco import coco_map

        dets, gts = {}, {}
        max_label = 0
        for det, meta in results:
            img_id = meta["img_id"]
            hbb = np.asarray(det["boxes"]).reshape(-1, 4)
            valid = np.asarray(
                det.get("valid", np.ones(len(hbb), bool))
            ).astype(bool)
            dets[img_id] = (
                hbb[valid],
                np.asarray(det["scores"])[valid],
                np.asarray(det["labels"])[valid],
            )
            ghbb = np.asarray(
                meta.get("hboxes", np.zeros((0, 4)))
            ).reshape(-1, 4)
            glab = np.asarray(meta.get("labels", np.zeros(0))).reshape(-1)
            gts[img_id] = (ghbb, glab)
            if len(glab):
                max_label = max(max_label, int(glab.max()))
        num_classes = (
            len(self.CLASSES) if getattr(self, "CLASSES", None)
            else max(max_label, 1)
        )
        ap = coco_map(dets, gts, num_classes)
        return {"eval/coco_mAP": ap["mAP"], "eval/coco_mAP50": ap["mAP50"],
                "eval/0_meanAP": ap["mAP50"]}
