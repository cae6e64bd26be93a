"""Dedicated H2RBox head: FCOS + weak hbb supervision + rotation
self-consistency branch.

Capability mirror of the reference H2RBoxHead
(`python/jdet/models/roi_heads/h2rbox_head.py:31-860`):

  - the main view is supervised only through the *circumscribed rectangle*
    of the decoded obb prediction against the (weak, horizontal) target —
    `obb2xyxy` + hbb IoU loss (h2rbox_head.py:198-213,462-468);
  - a second, rotated view runs only the regression tower (`forward_aug`,
    h2rbox_head.py:215-235); every positive location of view1 is mapped
    through the rotation into view2's grid (h2rbox_head.py:402-434), and
    view2's decoded boxes there are tied to view1's decoded boxes rotated
    by `rot` with a rotated-box loss (h2rbox_head.py:473-508) — this is
    what teaches the angle branch without rotated labels;
  - `rotation_agnostic_classes` get their consistency angle target zeroed
    (`_process_rotation_agnostic`, h2rbox_head.py:313-321).

Fixed-shape redesign: the reference gathers positive indices per level
with boolean indexing; here the location->rotated-location map is a dense
(N,) index vector built per level at trace time shape-wise, with validity
masks instead of filtering.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..losses import (
    binary_cross_entropy_loss,
    rotated_iou_loss,
    sigmoid_focal_loss,
)
from ...ops.box_convert import distance2obb, norm_angle
from ...utils.registry import HEADS
from .fcos_head import FCOSHead, INF


def obb2xyxy(rb):
    """Circumscribed axis-aligned rect of an obb (h2rbox_head.py:198-213)."""
    w, h, a = rb[..., 2], rb[..., 3], rb[..., 4]
    cosa = jnp.abs(jnp.cos(a))
    sina = jnp.abs(jnp.sin(a))
    hw = cosa * w + sina * h
    hh = sina * w + cosa * h
    cx, cy = rb[..., 0], rb[..., 1]
    return jnp.stack(
        [cx - hw / 2, cy - hh / 2, cx + hw / 2, cy + hh / 2], -1
    )


def hbb_iou_loss(pred, target, weight=None, avg_factor=None, eps=1e-6):
    """Aligned xyxy IoU loss, linear (1 - IoU)."""
    x1 = jnp.maximum(pred[..., 0], target[..., 0])
    y1 = jnp.maximum(pred[..., 1], target[..., 1])
    x2 = jnp.minimum(pred[..., 2], target[..., 2])
    y2 = jnp.minimum(pred[..., 3], target[..., 3])
    inter = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)
    ap = jnp.clip(pred[..., 2] - pred[..., 0], 0, None) * jnp.clip(
        pred[..., 3] - pred[..., 1], 0, None
    )
    at = jnp.clip(target[..., 2] - target[..., 0], 0, None) * jnp.clip(
        target[..., 3] - target[..., 1], 0, None
    )
    iou = inter / jnp.clip(ap + at - inter, eps, None)
    loss = 1 - iou
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        avg_factor = jnp.maximum(loss.shape[-1], 1)
    return loss.sum() / jnp.maximum(avg_factor, 1e-6)


@HEADS.register_module()
class H2RBoxHead(FCOSHead):
    def __init__(
        self,
        *args,
        rotation_agnostic_classes=None,
        rect_classes=None,
        loss_bbox_aug=dict(mode="linear", loss_weight=1.0),
        **kw,
    ):
        super().__init__(*args, **kw)
        self.rotation_agnostic_classes = tuple(rotation_agnostic_classes or ())
        self.rect_classes = tuple(rect_classes or ())
        self.loss_bbox_aug_cfg = dict(loss_bbox_aug)

    # -- rotated-view forward: regression tower only ---------------------
    def forward_aug_single(self, x, level, train=True):
        reg_feat = x
        for conv in self.reg_convs:
            reg_feat = conv(reg_feat, train)
        bbox_pred = self.scales[level](self.conv_reg(reg_feat))
        if self.norm_on_bbox:
            bbox_pred = jax.nn.relu(bbox_pred)
        else:
            bbox_pred = jnp.exp(bbox_pred)
        theta_pred = self.conv_theta(reg_feat)
        if self.scale_theta:
            theta_pred = self.scale_t(theta_pred)
        return bbox_pred, theta_pred

    def forward_aug(self, feats, train: bool = True):
        return [
            self.forward_aug_single(f, lvl, train)
            for lvl, f in enumerate(feats)
        ]

    # -- the location->rotated-location index map -------------------------
    def _aug_index_map(self, featmap_sizes, rot, img_center):
        """(N,) flat index into view2's per-image point axis for every
        view1 point, plus an in-bounds validity mask. Mirrors the per-level
        cell rounding of h2rbox_head.py:402-431."""
        idx_parts, valid_parts = [], []
        offset = 0
        cx, cy = img_center
        cos, sin = jnp.cos(rot), jnp.sin(rot)
        for (h, w), s in zip(featmap_sizes, self.strides):
            ys, xs = np.mgrid[:h, :w].astype(np.float32)
            px = jnp.asarray(xs.ravel() * s + s / 2)
            py = jnp.asarray(ys.ravel() * s + s / 2)
            rx = cos * (px - cx) - sin * (py - cy) + cx
            ry = sin * (px - cx) + cos * (py - cy) + cy
            cell_x = jnp.round((rx - s / 2) / s).astype(jnp.int32)
            cell_y = jnp.round((ry - s / 2) / s).astype(jnp.int32)
            ok = (cell_x >= 0) & (cell_x < w) & (cell_y >= 0) & (cell_y < h)
            flat = jnp.clip(cell_y, 0, h - 1) * w + jnp.clip(cell_x, 0, w - 1)
            idx_parts.append(flat + offset)
            valid_parts.append(ok)
            offset += h * w
        return jnp.concatenate(idx_parts), jnp.concatenate(valid_parts)

    def _rotation_agnostic_mask(self, labels):
        """True where the consistency angle target must be zeroed."""
        m = jnp.zeros(labels.shape, bool)
        for c in self.rotation_agnostic_classes:
            m = m | (labels == c)
        return m

    # -- combined loss -----------------------------------------------------
    def loss_with_aug(self, outs, outs_aug, rot, targets):
        outs = jax.tree.map(lambda t: t.astype(jnp.float32), outs)
        outs_aug = jax.tree.map(lambda t: t.astype(jnp.float32), outs_aug)
        featmap_sizes = [o[0].shape[1:3] for o in outs]
        B = outs[0][0].shape[0]
        pts_list = self._points(featmap_sizes)
        points = jnp.asarray(np.concatenate(pts_list, 0))
        rr = jnp.asarray(
            np.concatenate(
                [
                    np.tile(np.asarray(r, np.float32), (len(p), 1))
                    for r, p in zip(self.regress_ranges, pts_list)
                ],
                0,
            )
        )
        strides_pts = jnp.asarray(
            np.concatenate(
                [
                    np.full(len(p), s, np.float32)
                    for s, p in zip(self.strides, pts_list)
                ]
            )
        )

        cls = jnp.concatenate(
            [o[0].reshape(B, -1, self.num_classes) for o in outs], 1
        )
        reg = jnp.concatenate([o[1].reshape(B, -1, 4) for o in outs], 1)
        th = jnp.concatenate([o[2].reshape(B, -1, 1) for o in outs], 1)
        ctr = jnp.concatenate([o[3].reshape(B, -1) for o in outs], 1)
        reg_aug = jnp.concatenate(
            [o[0].reshape(B, -1, 4) for o in outs_aug], 1
        )
        th_aug = jnp.concatenate(
            [o[1].reshape(B, -1, 1) for o in outs_aug], 1
        )

        labels, bbox_targets, pos = jax.vmap(
            partial(self._target_single, points, rr, strides_pts)
        )(targets["gt_bboxes"], targets["gt_mask"], targets["gt_labels"])

        num_pos = jnp.maximum(pos.sum(), 1).astype(cls.dtype)
        lbl1 = jnp.where(labels == self.num_classes, 0, labels + 1)
        loss_cls = sigmoid_focal_loss(
            cls, lbl1,
            gamma=self.loss_cls_cfg.get("gamma", 2.0),
            alpha=self.loss_cls_cfg.get("alpha", 0.25),
            avg_factor=num_pos + B,  # reference avg (h2rbox_head.py:391)
        ) * self.loss_cls_cfg.get("loss_weight", 1.0)

        lr = bbox_targets[..., jnp.asarray([0, 2])]
        tb = bbox_targets[..., jnp.asarray([1, 3])]
        ctr_tgt = jnp.sqrt(
            jnp.clip(
                (lr.min(-1) / jnp.maximum(lr.max(-1), 1e-6))
                * (tb.min(-1) / jnp.maximum(tb.max(-1), 1e-6)),
                0.0, None,
            )
        )
        ctr_tgt = jnp.where(pos, ctr_tgt, 0.0)
        denom = jnp.maximum(ctr_tgt.sum(), 1e-6)

        reg_dec = reg * strides_pts[None, :, None] if self.norm_on_bbox else reg
        pred_obb = distance2obb(points[None], jnp.concatenate([reg_dec, th], -1))
        tgt_obb = distance2obb(points[None], bbox_targets)
        # weak supervision: IoU between circumscribed rects only
        loss_bbox = hbb_iou_loss(
            obb2xyxy(pred_obb.reshape(-1, 5)),
            obb2xyxy(tgt_obb.reshape(-1, 5)),
            weight=ctr_tgt.reshape(-1),
            avg_factor=denom,
        ) * self.loss_bbox_cfg.get("loss_weight", 1.0)

        loss_centerness = binary_cross_entropy_loss(
            ctr, ctr_tgt, weight=pos.astype(cls.dtype), avg_factor=num_pos
        ) * self.loss_centerness_cfg.get("loss_weight", 1.0)

        # --- self-supervised consistency branch -------------------------
        h0, w0 = featmap_sizes[0]
        img_w = w0 * self.strides[0]
        img_h = h0 * self.strides[0]
        cx_img = (img_w - 1) / 2.0
        cy_img = (img_h - 1) / 2.0
        aug_idx, aug_ok = self._aug_index_map(
            featmap_sizes, rot, (cx_img, cy_img)
        )

        reg_aug_dec = (
            reg_aug * strides_pts[None, :, None] if self.norm_on_bbox else reg_aug
        )
        aug_all = distance2obb(
            points[None], jnp.concatenate([reg_aug_dec, th_aug], -1)
        )  # decoded view2 boxes at every view2 location
        # view2 boxes at the rotated image of each view1 location
        aug_at = jnp.take_along_axis(
            aug_all, aug_idx[None, :, None], axis=1
        )

        cos, sin = jnp.cos(rot), jnp.sin(rot)
        x1 = pred_obb[..., 0] - cx_img
        y1 = pred_obb[..., 1] - cy_img
        tx = cos * x1 - sin * y1 + cx_img
        ty = sin * x1 + cos * y1 + cy_img
        ta = pred_obb[..., 4] + rot
        agn = self._rotation_agnostic_mask(labels)
        ta = jnp.where(agn, 0.0, ta)
        target_aug = jnp.stack(
            [tx, ty, pred_obb[..., 2], pred_obb[..., 3], ta], -1
        )

        w_aug = ctr_tgt * pos.astype(ctr_tgt.dtype) * aug_ok[None].astype(
            ctr_tgt.dtype
        )
        denom_aug = jnp.maximum(w_aug.sum(), 1.0)
        loss_bbox_aug = rotated_iou_loss(
            aug_at.reshape(-1, 5),
            target_aug.reshape(-1, 5),
            weight=w_aug.reshape(-1),
            mode=self.loss_bbox_aug_cfg.get("mode", "linear"),
            avg_factor=denom_aug,
        ) * self.loss_bbox_aug_cfg.get("loss_weight", 1.0)

        return {
            "loss_cls": loss_cls,
            "loss_bbox": loss_bbox,
            "loss_centerness": loss_centerness,
            "loss_bbox_aug": loss_bbox_aug,
        }

    # -- inference: optionally snap rect classes to hbb -------------------
    def predict(self, outs, targets=None):
        det = super().predict(outs, targets)
        if self.rect_classes:
            is_rect = jnp.zeros(det["labels"].shape, bool)
            for c in self.rect_classes:
                is_rect = is_rect | (det["labels"] == c)
            boxes = det["boxes"]
            rect = jnp.concatenate(
                [
                    (obb2xyxy(boxes)[..., :2] + obb2xyxy(boxes)[..., 2:]) / 2,
                    obb2xyxy(boxes)[..., 2:] - obb2xyxy(boxes)[..., :2],
                    jnp.zeros_like(boxes[..., :1]),
                ],
                -1,
            )
            det["boxes"] = jnp.where(is_rect[..., None], rect, boxes)
            from ...ops.box_convert import rbox_to_poly

            det["polys"] = rbox_to_poly(det["boxes"])
        return det
