"""COCO dataset (horizontal boxes) with a dependency-free COCO-protocol
evaluator.

Capability mirror of the reference COCODataset
(`python/jdet/data/coco.py:24-391`), which wraps pycocotools (absent in
this image): annotations load from the standard instances JSON; horizontal
gt boxes are carried as zero-angle rboxes so the whole rotated pipeline
applies; `evaluate` computes COCO mAP (AP@[.5:.95], 101-point
interpolation, maxDets=100) in numpy.
"""
from __future__ import annotations

import json
import os

import numpy as np

from ..utils.registry import DATASETS
from .custom import CustomDataset


@DATASETS.register_module()
class COCODataset(CustomDataset):
    def __init__(self, annotations_file=None, **kw):
        super().__init__(annotations_file=None, **kw)
        self.coco = None
        if annotations_file:
            with open(annotations_file) as f:
                self.coco = json.load(f)
            cats = sorted(self.coco["categories"], key=lambda c: c["id"])
            self.CLASSES = [c["name"] for c in cats]
            self.cat2label = {c["id"]: i + 1 for i, c in enumerate(cats)}
            anns_by_img = {}
            for a in self.coco["annotations"]:
                anns_by_img.setdefault(a["image_id"], []).append(a)
            infos = []
            for img in self.coco["images"]:
                anns = anns_by_img.get(img["id"], [])
                boxes, labels = [], []
                for a in anns:
                    if a.get("iscrowd", 0):
                        continue
                    x, y, w, h = a["bbox"]
                    # xywh -> zero-angle rbox
                    boxes.append([x + w / 2, y + h / 2, w, h, 0.0])
                    labels.append(self.cat2label[a["category_id"]])
                if kw.get("filter_empty_gt", True) and not boxes:
                    continue
                infos.append(
                    {
                        "filename": img["file_name"],
                        "width": img["width"],
                        "height": img["height"],
                        "ann": {
                            "bboxes": np.asarray(boxes, np.float32).reshape(-1, 5),
                            "labels": np.asarray(labels, np.int64),
                            "bboxes_ignore": np.zeros((0, 5), np.float32),
                        },
                    }
                )
            self.img_infos = infos

    def evaluate(self, results, work_dir=None, epoch=None, **kw):
        """COCO-protocol mAP over horizontal boxes (numpy)."""
        dets, gts = {}, {}
        for det, meta in results:
            img_id = meta["img_id"]
            polys = np.asarray(det["polys"]).reshape(-1, 8)
            xs, ys = polys[:, 0::2], polys[:, 1::2]
            hbb = np.stack([xs.min(1), ys.min(1), xs.max(1), ys.max(1)], 1)
            valid = np.asarray(det.get("valid", np.ones(len(hbb), bool)))
            dets[img_id] = (
                hbb[valid],
                np.asarray(det["scores"])[valid],
                np.asarray(det["labels"])[valid],
            )
            gp = np.asarray(meta.get("polys", np.zeros((0, 8)))).reshape(-1, 8)
            gxs, gys = gp[:, 0::2], gp[:, 1::2]
            ghbb = (
                np.stack([gxs.min(1), gys.min(1), gxs.max(1), gys.max(1)], 1)
                if len(gp)
                else np.zeros((0, 4))
            )
            gts[img_id] = (ghbb, np.asarray(meta.get("labels", np.zeros(0))))
        ap = coco_map(dets, gts, len(self.CLASSES))
        return {"eval/coco_mAP": ap["mAP"], "eval/coco_mAP50": ap["mAP50"]}


def _hbb_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = aa[:, None] + ab[None] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-9), 0.0)


def coco_map(dets, gts, num_classes, max_dets=100):
    """COCO mAP: mean AP over classes and IoU in .5:.05:.95, 101-pt interp.

    dets: {img: (hbb (n,4), scores (n,), labels 0-based (n,))}
    gts:  {img: (hbb (m,4), labels 1-based (m,))}
    """
    thrs = np.arange(0.5, 1.0, 0.05)
    recall_pts = np.linspace(0, 1, 101)
    aps = np.zeros((len(thrs), num_classes))
    aps_valid = np.zeros(num_classes, bool)
    for c in range(num_classes):
        records = []  # (score, [matched at each thr])
        npos = 0
        for img, (ghbb, glab) in gts.items():
            gt_c = ghbb[glab == c + 1]
            npos += len(gt_c)
            dh, ds, dl = dets.get(img, (np.zeros((0, 4)), np.zeros(0), np.zeros(0)))
            m = dl == c
            dh_c, ds_c = dh[m], ds[m]
            order = np.argsort(-ds_c)[:max_dets]
            dh_c, ds_c = dh_c[order], ds_c[order]
            if len(dh_c) == 0:
                continue
            iou = _hbb_iou(dh_c, gt_c) if len(gt_c) else np.zeros((len(dh_c), 0))
            taken = np.zeros((len(thrs), len(gt_c)), bool)
            for i in range(len(dh_c)):
                row = np.zeros(len(thrs), bool)
                for t, thr in enumerate(thrs):
                    if iou.shape[1]:
                        cand = np.where(~taken[t] & (iou[i] >= thr))[0]
                        if len(cand):
                            j = cand[np.argmax(iou[i][cand])]
                            taken[t, j] = True
                            row[t] = True
                records.append((ds_c[i], row))
        if npos == 0:
            continue
        aps_valid[c] = True
        if not records:
            continue
        records.sort(key=lambda r: -r[0])
        matches = np.stack([r[1] for r in records])  # (nd, T)
        tp = np.cumsum(matches, 0)
        fp = np.cumsum(~matches, 0)
        rec = tp / npos
        prec = tp / np.maximum(tp + fp, 1e-9)
        for t in range(len(thrs)):
            p = prec[:, t][::-1]
            p = np.maximum.accumulate(p)[::-1]
            aps[t, c] = np.interp(recall_pts, rec[:, t], p, left=p[0] if len(p) else 0, right=0).mean()
    if not aps_valid.any():
        return {"mAP": 0.0, "mAP50": 0.0}
    return {
        "mAP": float(aps[:, aps_valid].mean()),
        "mAP50": float(aps[0, aps_valid].mean()),
    }
