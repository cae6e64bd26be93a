"""CPU-side per-sample transform pipeline (numpy/cv2).

Capability mirror of the reference transforms
(`python/jdet/data/transforms.py`): registry-composable augmentations over
(image, target) where target carries rboxes/polys/hboxes (+ *_ignore)
numpy arrays and meta keys. Conventions match the reference:

  - RotatedResize (transforms.py:316): rboxes -> polys -> scale+clip ->
    rboxes (so resize respects the canonical w>=h/angle form).
  - (Rotated)RandomFlip (transforms.py:345,390): horizontal flip maps
    cx -> w-cx-1, theta -> norm_angle(pi - theta); vertical maps
    cy -> h-cy-1, theta -> norm_angle(-theta).
  - Pad (transforms.py:444): to fixed size or size divisor, records
    pad_shape.
  - Normalize (transforms.py:468): (x - mean)/std, optional RGB->BGR.
  - RandomRotateAug (transforms.py:32): k*90-degree rotations with box
    remap (the "ra90" train aug).

Images flow as HWC float32 RGB numpy arrays.
"""
from __future__ import annotations

import math

import cv2
import numpy as np

from ..utils.registry import TRANSFORMS
from ..ops.box_convert import norm_angle as _norm_angle_jnp


def norm_angle_np(a):
    return (a - (-np.pi / 4)) % np.pi + (-np.pi / 4)


def rbox_to_poly_np(rb):
    if rb is None or len(rb) == 0:
        return np.zeros((0, 8), np.float32)
    cx, cy, w, h, t = rb[:, 0], rb[:, 1], rb[:, 2], rb[:, 3], rb[:, 4]
    c, s = np.cos(t), np.sin(t)
    dx = np.stack([-w / 2, w / 2, w / 2, -w / 2], 1)
    dy = np.stack([-h / 2, -h / 2, h / 2, h / 2], 1)
    xs = cx[:, None] + c[:, None] * dx - s[:, None] * dy
    ys = cy[:, None] + s[:, None] * dx + c[:, None] * dy
    return np.stack([xs, ys], -1).reshape(-1, 8).astype(np.float32)


def poly_to_rbox_np(polys):
    if polys is None or len(polys) == 0:
        return np.zeros((0, 5), np.float32)
    p = polys.reshape(-1, 4, 2).astype(np.float64)
    e1 = np.linalg.norm(p[:, 0] - p[:, 1], axis=-1)
    e2 = np.linalg.norm(p[:, 1] - p[:, 2], axis=-1)
    a1 = np.arctan2(p[:, 1, 1] - p[:, 0, 1], p[:, 1, 0] - p[:, 0, 0])
    a2 = np.arctan2(p[:, 3, 1] - p[:, 0, 1], p[:, 3, 0] - p[:, 0, 0])
    ang = norm_angle_np(np.where(e1 > e2, a1, a2))
    cx = (p[:, 0, 0] + p[:, 2, 0]) / 2
    cy = (p[:, 0, 1] + p[:, 2, 1]) / 2
    w = np.maximum(e1, e2)
    h = np.minimum(e1, e2)
    return np.stack([cx, cy, w, h, ang], 1).astype(np.float32)


_BOX_KEYS = [
    "bboxes", "hboxes", "rboxes", "polys",
    "hboxes_ignore", "polys_ignore", "rboxes_ignore",
]


@TRANSFORMS.register_module()
class Compose:
    def __init__(self, transforms=None):
        from ..utils.registry import build_from_cfg

        ts = []
        for t in transforms or []:
            if isinstance(t, dict):
                ts.append(build_from_cfg(t, TRANSFORMS))
            else:
                ts.append(t)
        self.transforms = ts

    def __call__(self, image, target=None, rng=None):
        for t in self.transforms:
            image, target = t(image, target, rng=rng)
        return image, target


class _Base:
    def __call__(self, image, target=None, rng=None):
        raise NotImplementedError


@TRANSFORMS.register_module()
class Resize(_Base):
    """min/max-size resize with optional ratio clamp (transforms.py:80)."""

    def __init__(self, min_size, max_size=None, keep_ratio=True):
        self.min_size = min_size if isinstance(min_size, (list, tuple)) else [min_size]
        self.max_size = max_size
        self.keep_ratio = keep_ratio

    def _pick_size(self, w, h, rng):
        size = self.min_size[
            0 if len(self.min_size) == 1 else int(rng.integers(len(self.min_size)))
        ]
        if not self.keep_ratio:
            return int(size), int(size)
        # size-ratio clamp (reference transforms.py:94-99): the sampled
        # multi-scale size is clipped to [short/1.5, short*1.5] so extreme
        # rescales never enter the train distribution
        short = w if w <= h else h
        size = int(np.clip(size, int(short / 1.5), int(short * 1.5)))
        if self.max_size is not None:
            mn, mx = float(min(w, h)), float(max(w, h))
            if mx / mn * size > self.max_size:
                size = int(round(self.max_size * mn / mx))
        if (w <= h and w == size) or (h <= w and h == size):
            return int(w), int(h)
        if w < h:
            return int(size), int(size * h / w)
        return int(size * w / h), int(size)

    def _resize_boxes(self, target, old_size, new_size):
        ow, oh = old_size
        nw, nh = new_size
        for key in _BOX_KEYS:
            b = target.get(key)
            if b is None or getattr(b, "ndim", 0) != 2 or len(b) == 0:
                continue
            if "rboxes" in key:
                b = rbox_to_poly_np(b)
            b = b.copy()
            b[:, 0::2] *= nw / ow
            b[:, 1::2] *= nh / oh
            b[:, 0::2] = np.clip(b[:, 0::2], 0, nw - 1)
            b[:, 1::2] = np.clip(b[:, 1::2], 0, nh - 1)
            if "rboxes" in key:
                b = poly_to_rbox_np(b)
            target[key] = b

    def __call__(self, image, target=None, rng=None):
        rng = rng or np.random.default_rng()
        h, w = image.shape[:2]
        nw, nh = self._pick_size(w, h, rng)
        resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
        if target is not None:
            self._resize_boxes(target, (w, h), (nw, nh))
            target["img_size"] = (nw, nh)
            target["scale_factor"] = nw / w
        return resized, target


@TRANSFORMS.register_module()
class RotatedResize(Resize):
    """Alias — box handling already goes through the poly roundtrip."""


@TRANSFORMS.register_module()
class RotatedRandomFlip(_Base):
    """Flip image + rotated boxes (transforms.py:390-441)."""

    def __init__(self, prob=0.5, direction="horizontal"):
        assert direction in ("horizontal", "vertical")
        self.prob = prob
        self.direction = direction

    def _flip_rboxes(self, b, w, h):
        out = b.copy()
        if self.direction == "horizontal":
            out[:, 0] = w - b[:, 0] - 1
            out[:, 4] = norm_angle_np(np.pi - b[:, 4])
        else:
            out[:, 1] = h - b[:, 1] - 1
            out[:, 4] = norm_angle_np(-b[:, 4])
        return out

    def _flip_polys(self, b, w, h):
        out = b.copy()
        if self.direction == "horizontal":
            out[:, 0::2] = w - b[:, 0::2] - 1
        else:
            out[:, 1::2] = h - b[:, 1::2] - 1
        return out

    def _flip_hboxes(self, b, w, h):
        out = b.copy()
        if self.direction == "horizontal":
            out[:, 0] = w - b[:, 2]
            out[:, 2] = w - b[:, 0]
        else:
            out[:, 1] = h - b[:, 3]
            out[:, 3] = h - b[:, 1]
        return out

    def __call__(self, image, target=None, rng=None):
        rng = rng or np.random.default_rng()
        if rng.random() >= self.prob:
            return image, target
        h, w = image.shape[:2]
        image = image[:, ::-1] if self.direction == "horizontal" else image[::-1]
        image = np.ascontiguousarray(image)
        if target is not None:
            for key in _BOX_KEYS:
                b = target.get(key)
                if b is None or len(b) == 0:
                    continue
                if "rboxes" in key:
                    target[key] = self._flip_rboxes(b, w, h)
                elif "polys" in key:
                    target[key] = self._flip_polys(b, w, h)
                else:
                    target[key] = self._flip_hboxes(b, w, h)
            target["flip"] = self.direction
        return image, target


@TRANSFORMS.register_module()
class RandomFlip(RotatedRandomFlip):
    """Horizontal-box flip (transforms.py:345)."""


@TRANSFORMS.register_module()
class RandomRotateAug(_Base):
    """k*90-degree random rotation ("ra90", transforms.py:32-77)."""

    def __init__(self, rotate_ratio=1.0):
        self.rotate_ratio = rotate_ratio

    def __call__(self, image, target=None, rng=None):
        rng = rng or np.random.default_rng()
        if rng.random() >= self.rotate_ratio:
            return image, target
        k = int(rng.integers(0, 4))
        if k == 0:
            return image, target
        h, w = image.shape[:2]
        image = np.ascontiguousarray(np.rot90(image, k))
        if target is not None:
            # rotate by -k*90 deg in image coords (rot90 is CCW in array
            # space = CW in y-down image space)
            theta = -k * np.pi / 2
            c, s = math.cos(theta), math.sin(theta)
            cx0, cy0 = (w - 1) / 2.0, (h - 1) / 2.0
            nh, nw = image.shape[:2]
            cx1, cy1 = (nw - 1) / 2.0, (nh - 1) / 2.0

            def rot_pts(x, y):
                xr = c * (x - cx0) - s * (y - cy0) + cx1
                yr = s * (x - cx0) + c * (y - cy0) + cy1
                return xr, yr

            for key in _BOX_KEYS:
                b = target.get(key)
                if b is None or len(b) == 0:
                    continue
                if "rboxes" in key:
                    out = b.copy()
                    out[:, 0], out[:, 1] = rot_pts(b[:, 0], b[:, 1])
                    out[:, 4] = norm_angle_np(b[:, 4] + theta)
                    target[key] = out
                elif "polys" in key:
                    out = b.copy()
                    out[:, 0::2], out[:, 1::2] = rot_pts(b[:, 0::2], b[:, 1::2])
                    target[key] = out
                else:
                    polys = np.stack(
                        [b[:, 0], b[:, 1], b[:, 2], b[:, 1],
                         b[:, 2], b[:, 3], b[:, 0], b[:, 3]], 1
                    )
                    xr, yr = rot_pts(polys[:, 0::2], polys[:, 1::2])
                    target[key] = np.stack(
                        [xr.min(1), yr.min(1), xr.max(1), yr.max(1)], 1
                    ).astype(b.dtype)
            target["img_size"] = (nw, nh)
        return image, target


@TRANSFORMS.register_module()
class Pad(_Base):
    def __init__(self, size=None, size_divisor=None, pad_val=0):
        assert (size is None) != (size_divisor is None)
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val

    def __call__(self, image, target=None, rng=None):
        h, w = image.shape[:2]
        if self.size is not None:
            pw, ph = self.size
        else:
            ph = int(np.ceil(h / self.size_divisor)) * self.size_divisor
            pw = int(np.ceil(w / self.size_divisor)) * self.size_divisor
        out = np.full((ph, pw, image.shape[2]), self.pad_val, image.dtype)
        out[:h, :w] = image
        if target is not None:
            target["pad_shape"] = (pw, ph)
        return out, target


def _hbb_iou_np(patch, boxes):
    """IoU of one (4,) patch against (n, 4) boxes."""
    x1 = np.maximum(patch[0], boxes[:, 0])
    y1 = np.maximum(patch[1], boxes[:, 1])
    x2 = np.minimum(patch[2], boxes[:, 2])
    y2 = np.minimum(patch[3], boxes[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_p = (patch[2] - patch[0]) * (patch[3] - patch[1])
    area_b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.clip(area_p + area_b - inter, 1e-9, None)


def _box_centers(target):
    """(n, 2) centers from whichever box key is present (priority hbb)."""
    for key in ("hboxes", "bboxes"):
        b = target.get(key)
        if b is not None and len(b):
            return (b[:, :2] + b[:, 2:4]) / 2, key
    b = target.get("rboxes")
    if b is not None and len(b):
        return b[:, :2].copy(), "rboxes"
    b = target.get("polys")
    if b is not None and len(b):
        p = b.reshape(-1, 4, 2)
        return p.mean(1), "polys"
    return np.zeros((0, 2), np.float32), None


def _translate_boxes(target, dx, dy, mask=None):
    """Shift every box key by (dx, dy); optionally filter rows by mask."""
    for key in _BOX_KEYS:
        b = target.get(key)
        if b is None or getattr(b, "ndim", 0) != 2 or len(b) == 0:
            continue
        b = b.copy()
        if mask is not None and not key.endswith("_ignore"):
            b = b[mask]
        if "rboxes" in key:
            b[:, 0] += dx
            b[:, 1] += dy
        else:
            b[:, 0::2] += dx
            b[:, 1::2] += dy
        target[key] = b
    if mask is not None:
        for key in ("labels", "difficult"):
            v = target.get(key)
            if v is not None and len(v) == len(mask):
                target[key] = v[mask]


@TRANSFORMS.register_module()
class MinIoURandomCrop(_Base):
    """Random crop constrained by min IoU with every GT — the SSD train
    crop (reference transforms.py:155-225). Sample a mode from
    (1, *min_ious, 0); mode 1 keeps the image; otherwise retry up to 50
    crops until every box's IoU with the patch >= mode and at least one
    box center lies inside, then filter boxes by center-in-patch, clip
    hbb coords to the patch, and translate everything into crop frame.
    """

    def __init__(self, min_ious=(0.1, 0.3, 0.5, 0.7, 0.9),
                 min_crop_size=0.3, bbox_clip_border=True):
        self.sample_mode = (1, *min_ious, 0)
        self.min_crop_size = min_crop_size
        self.bbox_clip_border = bbox_clip_border

    def __call__(self, image, target=None, rng=None):
        rng = rng or np.random.default_rng()
        h, w = image.shape[:2]
        centers, ckey = _box_centers(target or {})
        while True:
            mode = self.sample_mode[int(rng.integers(len(self.sample_mode)))]
            if mode == 1:
                return image, target
            min_iou = mode
            for _ in range(50):
                new_w = rng.uniform(self.min_crop_size * w, w)
                new_h = rng.uniform(self.min_crop_size * h, h)
                if new_h / new_w < 0.5 or new_h / new_w > 2:
                    continue
                left = rng.uniform(0, w - new_w)
                top = rng.uniform(0, h - new_h)
                patch = np.array(
                    [int(left), int(top), int(left + new_w), int(top + new_h)],
                    np.float32,
                )
                if patch[2] == patch[0] or patch[3] == patch[1]:
                    continue
                mask = None
                if len(centers):
                    hb = target.get("hboxes")
                    if hb is None or not len(hb):
                        hb = target.get("bboxes")
                    if hb is not None and len(hb):
                        overlaps = _hbb_iou_np(patch, hb)
                        if overlaps.min() < min_iou:
                            continue
                    mask = (
                        (centers[:, 0] > patch[0]) & (centers[:, 1] > patch[1])
                        & (centers[:, 0] < patch[2]) & (centers[:, 1] < patch[3])
                    )
                    if not mask.any():
                        continue
                image_crop = np.ascontiguousarray(
                    image[int(patch[1]):int(patch[3]),
                          int(patch[0]):int(patch[2])]
                )
                if target is not None:
                    if self.bbox_clip_border:
                        for key in ("hboxes", "bboxes"):
                            b = target.get(key)
                            if b is None or not len(b):
                                continue
                            b = b.copy()
                            b[:, 0::2] = np.clip(b[:, 0::2], patch[0], patch[2])
                            b[:, 1::2] = np.clip(b[:, 1::2], patch[1], patch[3])
                            target[key] = b
                    _translate_boxes(target, -patch[0], -patch[1], mask=mask)
                    target["img_size"] = (
                        image_crop.shape[1], image_crop.shape[0]
                    )
                return image_crop, target


@TRANSFORMS.register_module()
class Expand(_Base):
    """Paste the image into a larger mean-filled canvas — the SSD
    zoom-out aug (reference transforms.py:228-253)."""

    def __init__(self, mean=(0, 0, 0), ratio_range=(1, 4), prob=0.5):
        self.mean = np.asarray(mean, np.float32)
        self.min_ratio, self.max_ratio = ratio_range
        self.prob = prob

    def __call__(self, image, target=None, rng=None):
        rng = rng or np.random.default_rng()
        if rng.random() > self.prob:
            return image, target
        h, w = image.shape[:2]
        ratio = rng.uniform(self.min_ratio, self.max_ratio)
        nw, nh = int(w * ratio), int(h * ratio)
        left = int(rng.uniform(0, nw - w))
        top = int(rng.uniform(0, nh - h))
        canvas = np.empty((nh, nw, image.shape[2]), image.dtype)
        canvas[...] = self.mean
        canvas[top:top + h, left:left + w] = image
        if target is not None:
            _translate_boxes(target, left, top)
            target["img_size"] = (nw, nh)
        return canvas, target


@TRANSFORMS.register_module()
class PhotoMetricDistortion(_Base):
    """SSD photometric aug (reference transforms.py:255-263, which wraps
    ColorJitter): random brightness delta, contrast scale, saturation
    scale and hue rotation, each applied with prob 0.5. Operates on HWC
    RGB float arrays in 0-255 scale (pre-Normalize)."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta

    def __call__(self, image, target=None, rng=None):
        rng = rng or np.random.default_rng()
        img = image.astype(np.float32)
        if rng.random() < 0.5:
            img = img + rng.uniform(-self.brightness_delta,
                                    self.brightness_delta)
        # contrast either before or after saturation/hue (mmdet order coin)
        contrast_first = rng.random() < 0.5

        def contrast(img):
            if rng.random() < 0.5:
                img = img * rng.uniform(*self.contrast_range)
            return img

        if contrast_first:
            img = contrast(img)
        do_sat = rng.random() < 0.5
        do_hue = rng.random() < 0.5
        if do_sat or do_hue:
            hsv = cv2.cvtColor(
                np.clip(img, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV
            ).astype(np.float32)
            if do_sat:
                hsv[..., 1] *= rng.uniform(*self.saturation_range)
            if do_hue:
                # OpenCV hue is 0-179 (degrees / 2)
                hsv[..., 0] = (
                    hsv[..., 0] + rng.uniform(-self.hue_delta, self.hue_delta) / 2
                ) % 180
            hsv[..., 1:] = np.clip(hsv[..., 1:], 0, 255)
            img = cv2.cvtColor(
                hsv.astype(np.uint8), cv2.COLOR_HSV2RGB
            ).astype(np.float32)
        if not contrast_first:
            img = contrast(img)
        return np.clip(img, 0, 255), target


@TRANSFORMS.register_module()
class Normalize(_Base):
    def __init__(self, mean, std, to_bgr=True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self._inv_std = (1.0 / self.std).astype(np.float32)
        self.to_bgr = to_bgr

    def __call__(self, image, target=None, rng=None):
        # in-place passes: this runs per-sample on the host loader and was
        # the pipeline hotspot as 4 allocating full-image passes
        image = image.astype(np.float32)
        if self.to_bgr:
            image = np.ascontiguousarray(image[..., ::-1])
        np.subtract(image, self.mean, out=image)
        np.multiply(image, self._inv_std, out=image)
        if target is not None:
            target["img_norm_cfg"] = dict(
                mean=self.mean.tolist(), std=self.std.tolist(), to_bgr=self.to_bgr
            )
        return image, target
