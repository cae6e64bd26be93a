"""Detection visualization: draw oriented boxes on images.

Capability mirror of the reference visualizer
(`python/jdet/utils/visualization.py:55`, `utils/draw.py:59-261`): polys
drawn with per-class colors + score labels, saved per image.
"""
from __future__ import annotations

import os

import numpy as np

from ..config.constants import class_palette


def draw_polys(image, polys, scores=None, labels=None, class_names=None,
               score_thr=0.3, thickness=2):
    import cv2

    img = np.ascontiguousarray(image[..., ::-1].astype(np.uint8))  # RGB->BGR
    n_cls = len(class_names) if class_names else int(labels.max() + 1 if labels is not None and len(labels) else 1)
    palette = class_palette(max(n_cls, 1))
    for i, poly in enumerate(np.asarray(polys).reshape(-1, 4, 2)):
        s = float(scores[i]) if scores is not None else 1.0
        if s < score_thr:
            continue
        c = int(labels[i]) if labels is not None else 0
        color = tuple(int(x) for x in palette[c % len(palette)])
        pts = poly.astype(np.int32)
        cv2.polylines(img, [pts], True, color, thickness)
        if class_names:
            txt = f"{class_names[c]} {s:.2f}"
            cv2.putText(img, txt, tuple(pts[0]), cv2.FONT_HERSHEY_SIMPLEX,
                        0.5, color, 1, cv2.LINE_AA)
    return img[..., ::-1]


def visualize_results(results, class_names, images_dir, save_dir,
                      score_thr=0.3):
    """results: list of (det dict, meta). Saves annotated images."""
    import cv2

    os.makedirs(save_dir, exist_ok=True)
    for det, meta in results:
        path = os.path.join(images_dir, meta["filename"])
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            continue
        img = img[..., ::-1]
        valid = np.asarray(det.get("valid", np.ones(len(det["polys"]), bool)))
        out = draw_polys(
            img,
            np.asarray(det["polys"])[valid],
            np.asarray(det["scores"])[valid],
            np.asarray(det["labels"])[valid],
            class_names,
            score_thr,
        )
        cv2.imwrite(
            os.path.join(save_dir, os.path.basename(meta["filename"])),
            out[..., ::-1],
        )
    return save_dir
