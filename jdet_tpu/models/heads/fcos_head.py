"""Rotated FCOS head — anchor-free, center-ness weighted.

Capability mirror of the reference FCOSHead
(`python/jdet/models/roi_heads/fcos_head.py:66-690`): cls/reg towers with
GroupNorm, per-level learnable Scale on the 4 distance channels, a theta
channel, and a centerness branch; targets rotate each point into the gt
frame to measure (l, t, r, b) (fcos_head.py:618-649), restrict by
per-level regress ranges, resolve overlaps by minimal area
(fcos_head.py:650-670); losses are focal (cls), rotated-IoU on decoded
boxes weighted by centerness targets, and BCE (centerness).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .. import nn as jnn

from ..layers import ConvModule, Scale, bias_init_with_prob, normal_init
from ..losses import (
    sigmoid_focal_loss,
    binary_cross_entropy_loss,
    rotated_iou_loss,
)
from ...ops.box_convert import distance2obb, mintheta_obb, rbox_to_poly
from ...ops.nms_rotated import multiclass_nms_rotated
from ...utils.registry import HEADS

INF = 1e8


@HEADS.register_module()
class FCOSHead(nnx.Module):
    def __init__(
        self,
        num_classes=15,  # foreground classes (fcos convention)
        in_channels=256,
        feat_channels=256,
        stacked_convs=4,
        strides=(8, 16, 32, 64, 128),
        regress_ranges=((-1, 64), (64, 128), (128, 256), (256, 512), (512, INF)),
        center_sampling=False,
        center_sample_radius=1.5,
        norm_on_bbox=True,
        scale_theta=True,
        loss_cls=dict(gamma=2.0, alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(mode="linear", loss_weight=1.0),
        loss_centerness=dict(loss_weight=1.0),
        test_cfg=None,
        *,
        rngs: nnx.Rngs,
    ):
        self.num_classes = num_classes
        self.strides = tuple(strides)
        self.regress_ranges = tuple(regress_ranges)
        self.center_sampling = center_sampling
        self.center_sample_radius = center_sample_radius
        self.norm_on_bbox = norm_on_bbox
        self.scale_theta = scale_theta
        self.loss_cls_cfg = dict(loss_cls)
        self.loss_bbox_cfg = dict(loss_bbox)
        self.loss_centerness_cfg = dict(loss_centerness)
        self.test_cfg = {
            **dict(nms_pre=2000, score_thr=0.05, nms_iou_thr=0.1,
                   max_per_img=2000),
            **(test_cfg or {}),
        }

        def tower():
            return nnx.List(
                [
                    ConvModule(
                        in_channels if i == 0 else feat_channels,
                        feat_channels, 3, norm="gn",
                        kernel_init=normal_init(0.01), rngs=rngs,
                    )
                    for i in range(stacked_convs)
                ]
            )

        self.cls_convs = tower()
        self.reg_convs = tower()
        self.conv_cls = jnn.Conv(
            feat_channels, num_classes, (3, 3),
            kernel_init=normal_init(0.01),
            bias_init=nnx.initializers.constant(bias_init_with_prob(0.01)),
            rngs=rngs,
        )
        self.conv_reg = jnn.Conv(
            feat_channels, 4, (3, 3), kernel_init=normal_init(0.01), rngs=rngs
        )
        self.conv_theta = jnn.Conv(
            feat_channels, 1, (3, 3), kernel_init=normal_init(0.01), rngs=rngs
        )
        self.conv_centerness = jnn.Conv(
            feat_channels, 1, (3, 3), kernel_init=normal_init(0.01), rngs=rngs
        )
        self.scales = nnx.List([Scale(1.0) for _ in strides])
        self.scale_t = Scale(1.0)

    # ------------------------------------------------------------------
    def forward_single(self, x, level, train=False):
        cls_feat = x
        reg_feat = x
        for conv in self.cls_convs:
            cls_feat = conv(cls_feat, train)
        for conv in self.reg_convs:
            reg_feat = conv(reg_feat, train)
        cls_score = self.conv_cls(cls_feat)
        bbox_pred = self.scales[level](self.conv_reg(reg_feat))
        if self.norm_on_bbox:
            bbox_pred = jax.nn.relu(bbox_pred)
            if not train:
                bbox_pred = bbox_pred * self.strides[level]
        else:
            bbox_pred = jnp.exp(bbox_pred)
        theta_pred = self.conv_theta(reg_feat)
        if self.scale_theta:
            theta_pred = self.scale_t(theta_pred)
        centerness = self.conv_centerness(reg_feat)
        return cls_score, bbox_pred, theta_pred, centerness

    def __call__(self, feats, train: bool = False):
        return [
            self.forward_single(f, lvl, train) for lvl, f in enumerate(feats)
        ]

    # ------------------------------------------------------------------
    def _points(self, featmap_sizes):
        """Per-level point centers (fcos_head.py:505-534), as numpy."""
        pts = []
        for (h, w), s in zip(featmap_sizes, self.strides):
            ys, xs = np.mgrid[:h, :w].astype(np.float32)
            p = np.stack([xs.ravel() * s + s / 2, ys.ravel() * s + s / 2], -1)
            pts.append(p)
        return pts

    def _target_single(self, points, regress_ranges, strides_pts, gt_bboxes,
                       gt_mask, gt_labels):
        """Targets for one image (fcos_head.py:599-670), masked form.

        points (N, 2); gt (K, 5). Returns labels (N,) [0-based fg, bg=C],
        bbox_targets (N, 5) [l, t, r, b, theta].
        """
        N = points.shape[0]
        K = gt_bboxes.shape[0]
        gts = mintheta_obb(gt_bboxes)
        cx, cy, gw, gh, theta = (gts[:, i] for i in range(5))
        cos = jnp.cos(theta)
        sin = jnp.sin(theta)
        # rotate offsets into the gt frame: R(-theta) @ (p - c)
        ox = points[None, :, 0] - cx[:, None]  # (K, N)
        oy = points[None, :, 1] - cy[:, None]
        off_x = cos[:, None] * ox + sin[:, None] * oy
        off_y = -sin[:, None] * ox + cos[:, None] * oy
        left = gw[:, None] / 2 + off_x
        right = gw[:, None] / 2 - off_x
        top = gh[:, None] / 2 + off_y
        bottom = gh[:, None] / 2 - off_y
        ltrb = jnp.stack([left, top, right, bottom], -1)  # (K, N, 4)

        inside = ltrb.min(-1) > 0
        if self.center_sampling:
            r = self.center_sample_radius
            inside_center = (
                (jnp.abs(off_x) < r * strides_pts[None, :])
                & (jnp.abs(off_y) < r * strides_pts[None, :])
            )
            inside = inside & inside_center
        max_dist = ltrb.max(-1)
        in_range = (max_dist >= regress_ranges[None, :, 0]) & (
            max_dist <= regress_ranges[None, :, 1]
        )
        areas = gw * gh
        areas = jnp.where(gt_mask, areas, INF)[:, None] * jnp.ones((1, N))
        areas = jnp.where(inside & in_range & gt_mask[:, None], areas, INF)
        min_area_inds = areas.argmin(0)
        min_area = areas.min(0)
        pos = min_area < INF

        labels = jnp.where(
            pos, gt_labels[min_area_inds] - 1, self.num_classes
        ).astype(jnp.int32)
        bt = jnp.take_along_axis(
            ltrb, min_area_inds[None, :, None], axis=0
        )[0]
        th = theta[min_area_inds]
        bbox_targets = jnp.concatenate([bt, th[:, None]], -1)
        return labels, bbox_targets, pos

    def loss(self, outs, targets):
        outs = jax.tree.map(lambda t: t.astype(jnp.float32), outs)
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
                [np.full(len(p), s, np.float32) for s, p in zip(self.strides, pts_list)]
            )
        )

        cls = jnp.concatenate(
            [o[0].reshape(B, -1, self.num_classes) for o in outs], 1
        )
        reg = jnp.concatenate([o[1].reshape(B, -1, 4) for o in outs], 1)
        th = jnp.concatenate([o[2].reshape(B, -1, 1) for o in outs], 1)
        ctr = jnp.concatenate([o[3].reshape(B, -1) for o in outs], 1)

        labels, bbox_targets, pos = jax.vmap(
            partial(self._target_single, points, rr, strides_pts)
        )(targets["gt_bboxes"], targets["gt_mask"], targets["gt_labels"])

        num_pos = jnp.maximum(pos.sum(), 1).astype(cls.dtype)
        # focal over 0-based-fg / bg=C labels: shift to the 1-based space
        lbl1 = jnp.where(labels == self.num_classes, 0, labels + 1)
        loss_cls = sigmoid_focal_loss(
            cls, lbl1,
            gamma=self.loss_cls_cfg.get("gamma", 2.0),
            alpha=self.loss_cls_cfg.get("alpha", 0.25),
            avg_factor=num_pos,
        ) * self.loss_cls_cfg.get("loss_weight", 1.0)

        # centerness targets from ltrb (fcos_head.py:673-690)
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

        # decode pred and target boxes in image space for the IoU loss
        reg_dec = reg * strides_pts[None, :, None] if self.norm_on_bbox else reg
        pred_obb = distance2obb(
            points[None], jnp.concatenate([reg_dec, th], -1)
        )
        tgt_obb = distance2obb(
            points[None],
            jnp.concatenate([bbox_targets[..., :4], bbox_targets[..., 4:5]], -1),
        )
        w = jnp.where(pos, ctr_tgt, 0.0)
        denom = jnp.maximum(w.sum(), 1e-6)
        loss_bbox = rotated_iou_loss(
            pred_obb.reshape(-1, 5),
            tgt_obb.reshape(-1, 5),
            weight=w.reshape(-1),
            mode=self.loss_bbox_cfg.get("mode", "linear"),
            avg_factor=denom,
        ) * self.loss_bbox_cfg.get("loss_weight", 1.0)

        loss_centerness = binary_cross_entropy_loss(
            ctr, ctr_tgt, weight=pos.astype(cls.dtype), avg_factor=num_pos
        ) * self.loss_centerness_cfg.get("loss_weight", 1.0)

        return {
            "loss_cls": loss_cls,
            "loss_bbox": loss_bbox,
            "loss_centerness": loss_centerness,
        }

    # ------------------------------------------------------------------
    def predict(self, outs, targets=None):
        cfg = self.test_cfg
        outs = jax.tree.map(lambda t: t.astype(jnp.float32), outs)
        featmap_sizes = [o[0].shape[1:3] for o in outs]
        pts_list = self._points(featmap_sizes)
        nms_pre = cfg["nms_pre"]
        level_scores, level_boxes, level_ctr = [], [], []
        for lvl, (cls, reg, th, ctr) in enumerate(outs):
            B = cls.shape[0]
            scores = jax.nn.sigmoid(cls.reshape(B, -1, self.num_classes))
            centerness = jax.nn.sigmoid(ctr.reshape(B, -1))
            dist = reg.reshape(B, -1, 4)
            theta = th.reshape(B, -1, 1)
            pts = jnp.asarray(pts_list[lvl])
            n_lvl = pts.shape[0]
            if nms_pre > 0 and n_lvl > nms_pre:
                max_scores = (scores * centerness[..., None]).max(-1)
                _, topk = jax.lax.top_k(max_scores, nms_pre)
                scores = jnp.take_along_axis(scores, topk[..., None], 1)
                centerness = jnp.take_along_axis(centerness, topk, 1)
                dist = jnp.take_along_axis(dist, topk[..., None], 1)
                theta = jnp.take_along_axis(theta, topk[..., None], 1)
                pts_b = pts[topk]
            else:
                pts_b = jnp.broadcast_to(pts, (B, n_lvl, 2))
            boxes = distance2obb(pts_b, jnp.concatenate([dist, theta], -1))
            level_scores.append(scores)
            level_boxes.append(boxes)
            level_ctr.append(centerness)
        all_scores = jnp.concatenate(level_scores, 1)
        all_boxes = jnp.concatenate(level_boxes, 1)
        all_ctr = jnp.concatenate(level_ctr, 1)
        if targets is not None and "scale_factor" in targets:
            sf = targets["scale_factor"].reshape(-1, 1, 1)
            all_boxes = all_boxes.at[..., :4].divide(sf)
        nms_one = partial(
            multiclass_nms_rotated,
            score_thr=cfg["score_thr"],
            nms_iou_thr=cfg["nms_iou_thr"],
            max_per_img=cfg["max_per_img"],
        )
        det = jax.vmap(nms_one)(all_boxes, all_scores, score_factors=all_ctr)
        det["polys"] = rbox_to_poly(det["boxes"])
        return det
