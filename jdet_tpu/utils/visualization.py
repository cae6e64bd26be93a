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


def draw_bboxes(img, bboxes, labels=None, scores=None, class_names=None,
                score_thr=0.0, colors="random", thickness=1,
                with_text=True, out_file=None):
    """General box drawer — capability mirror of the reference's
    `draw_bboxes` (`python/jdet/utils/draw.py:261-344`): routes on box
    width (4 = hbb x1y1x2y2, 5 = obb cx/cy/w/h/theta[rad], 8 = poly),
    sorts by score so high scorers draw on top, per-class colors
    ('random', a single color, or a list), optional `cls|score` text,
    optional save. cv2-rendered (no matplotlib figure round-trip).

    `img` is an RGB array or an image path; returns the annotated RGB
    array.
    """
    import cv2

    if isinstance(img, str):
        img = cv2.imread(img, cv2.IMREAD_COLOR)[..., ::-1]
    img = np.ascontiguousarray(np.asarray(img).astype(np.uint8))
    bboxes = np.asarray(bboxes, np.float32).reshape(
        -1, bboxes.shape[-1] if np.ndim(bboxes) > 1 else len(bboxes)
    )
    n = bboxes.shape[0]
    labels = (np.zeros(n, np.int32) if labels is None
              else np.asarray(labels, np.int32).reshape(-1))
    if scores is not None:
        scores = np.asarray(scores, np.float32).reshape(-1)
        keep = scores >= score_thr
        bboxes, labels, scores = bboxes[keep], labels[keep], scores[keep]
        order = np.argsort(scores)  # ascending: best drawn last/on top
        bboxes, labels, scores = bboxes[order], labels[order], scores[order]
    if bboxes.shape[0] == 0:
        if out_file is not None:
            cv2.imwrite(out_file, img[..., ::-1])
        return img

    k = bboxes.shape[1]
    if k == 4:
        x1, y1, x2, y2 = bboxes.T
        polys = np.stack([x1, y1, x2, y1, x2, y2, x1, y2], -1)
    elif k == 5:
        from ..data.transforms import rbox_to_poly_np

        polys = rbox_to_poly_np(bboxes)
    elif k == 8:
        polys = bboxes
    else:
        raise ValueError(f"bboxes must be (N, 4|5|8), got width {k}")

    n_cls = int(labels.max()) + 1 if len(labels) else 1
    if isinstance(colors, str) and colors == "random":
        palette = class_palette(n_cls)
    else:
        one = _color_val(colors)
        palette = one if isinstance(one, list) else [one] * n_cls
    for i, poly in enumerate(polys.reshape(-1, 4, 2)):
        c = int(labels[i])
        color = tuple(int(x) for x in np.asarray(palette[c % len(palette)]))
        pts = np.round(poly).astype(np.int32)
        cv2.polylines(img, [pts], True, color, thickness)
        if with_text:
            txt = (f"cls: {c}" if class_names is None
                   else str(class_names[c]))
            if scores is not None:
                txt += f"|{scores[i]:.02f}"
            cv2.putText(img, txt, tuple(pts[0]), cv2.FONT_HERSHEY_SIMPLEX,
                        0.4, color, 1, cv2.LINE_AA)
    if out_file is not None:
        cv2.imwrite(out_file, img[..., ::-1])
    return img


def _color_val(colors):
    """'green' / (r,g,b) / list of either -> RGB tuple(s)."""
    named = {"green": (0, 255, 0), "red": (255, 0, 0), "blue": (0, 0, 255),
             "yellow": (255, 255, 0), "cyan": (0, 255, 255),
             "magenta": (255, 0, 255), "white": (255, 255, 255),
             "black": (0, 0, 0)}
    if isinstance(colors, str):
        return named[colors]
    if isinstance(colors, (list, tuple)) and len(colors) and isinstance(
            colors[0], (list, tuple, str, np.ndarray)):
        return [_color_val(c) for c in colors]
    return tuple(int(c) for c in colors)


def visualize_gt(dataset, save_dir, limit=None, colors="random",
                 thickness=2):
    """Draw a dataset's ground-truth boxes (the reference's DOTA-GT
    visualization flow: `python/jdet/utils/visualization.py:20-54`).

    Iterates the dataset's parsed annotations (no batching/padding), so
    it works on any CustomDataset-style dataset with `image_infos` and
    an images dir. Returns the list of written files.
    """
    import cv2

    os.makedirs(save_dir, exist_ok=True)
    names = getattr(dataset, "CLASSES", None)
    written = []
    for info in dataset.img_infos[:limit]:
        path = os.path.join(dataset.images_dir, info["filename"])
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            continue
        ann = info["ann"]
        out = draw_bboxes(
            img[..., ::-1], np.asarray(ann["bboxes"], np.float32),
            labels=np.asarray(ann["labels"], np.int32) - 1,  # 1-based gt
            class_names=names, colors=colors, thickness=thickness,
        )
        f = os.path.join(save_dir, os.path.basename(info["filename"]))
        cv2.imwrite(f, out[..., ::-1])
        written.append(f)
    return written
