"""Rotated RepPoints head — 9-point set representation.

Capability mirror of the reference RotatedRepPointsHead
(`python/jdet/models/roi_heads/rotated_reppoints_head.py:73-1541`):
point-based towers predict 9 offset points per location in an init and a
refine stage; positives are supervised with the convex GIoU of the point
hull vs the gt quad (losses/convex_giou_loss.py); detection converts point
sets to boxes via the min-area enclosing rect (reppoints_min_area_bbox).

Fixed-shape redesign notes: the reference's ConvexAssigner /
MaxConvexIoUAssigner produce variable positives per gt; here each gt
claims its best point location per stage — the closest center on the
scale-matched level for init (ConvexAssigner's center rule,
models/boxes/assigner.py:394), the max-(approximate)-IoU location for
refine — giving a (B, K) positive set that keeps the convex-GIoU loss
(the expensive exact-geometry part) on a small fixed budget.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .. import nn as jnn
from ..layers import ConvModule, bias_init_with_prob, normal_init
from ..losses import sigmoid_focal_loss
from ...ops.convex import convex_giou, min_area_rect
from ...ops.box_convert import rbox_to_poly
from ...ops.box_iou_rotated import box_iou_rotated_aligned
from ...ops.nms_rotated import multiclass_nms_rotated
from ...utils.registry import HEADS


@HEADS.register_module()
class RotatedRepPointsHead(nnx.Module):
    def __init__(
        self,
        num_classes=15,  # foreground
        in_channels=256,
        feat_channels=256,
        point_feat_channels=256,
        stacked_convs=3,
        num_points=9,
        gradient_mul=0.1,
        strides=(8, 16, 32, 64, 128),
        scale_ranges=((-1, 64), (64, 128), (128, 256), (256, 512), (512, 1e8)),
        loss_cls=dict(gamma=2.0, alpha=0.25, loss_weight=1.0),
        loss_bbox_init=dict(loss_weight=0.375),
        loss_bbox_refine=dict(loss_weight=1.0),
        test_cfg=None,
        *,
        rngs: nnx.Rngs,
    ):
        self.num_classes = num_classes
        self.num_points = num_points
        self.gradient_mul = gradient_mul
        self.strides = tuple(strides)
        self.scale_ranges = tuple(scale_ranges)
        self.loss_cls_cfg = dict(loss_cls)
        self.loss_init_cfg = dict(loss_bbox_init)
        self.loss_refine_cfg = dict(loss_bbox_refine)
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
        self.reppoints_cls = jnn.Conv(
            feat_channels, num_classes, (3, 3),
            kernel_init=normal_init(0.01),
            bias_init=nnx.initializers.constant(bias_init_with_prob(0.01)),
            rngs=rngs,
        )
        self.pts_init_conv = jnn.Conv(
            feat_channels, point_feat_channels, (3, 3),
            kernel_init=normal_init(0.01), rngs=rngs,
        )
        self.pts_init_out = jnn.Conv(
            point_feat_channels, 2 * num_points, (1, 1),
            kernel_init=normal_init(0.01), rngs=rngs,
        )
        self.pts_refine_conv = jnn.Conv(
            feat_channels, point_feat_channels, (3, 3),
            kernel_init=normal_init(0.01), rngs=rngs,
        )
        self.pts_refine_out = jnn.Conv(
            point_feat_channels, 2 * num_points, (1, 1),
            kernel_init=normal_init(0.01), rngs=rngs,
        )

    # ------------------------------------------------------------------
    def forward_single(self, x, level, train=False):
        stride = self.strides[level]
        cls_feat = x
        reg_feat = x
        for conv in self.cls_convs:
            cls_feat = conv(cls_feat, train)
        for conv in self.reg_convs:
            reg_feat = conv(reg_feat, train)
        cls_score = self.reppoints_cls(cls_feat)
        off_init = self.pts_init_out(
            jax.nn.relu(self.pts_init_conv(reg_feat))
        )
        # refine offsets predicted relative to (partially detached) init
        gm = self.gradient_mul
        off_detach = (
            jax.lax.stop_gradient(off_init) * (1 - gm) + off_init * gm
        )
        off_refine = self.pts_refine_out(
            jax.nn.relu(self.pts_refine_conv(reg_feat))
        ) + off_detach
        return cls_score, off_init, off_refine

    def __call__(self, feats, train: bool = False):
        return [
            self.forward_single(f, lvl, train) for lvl, f in enumerate(feats)
        ]

    # ------------------------------------------------------------------
    def _points(self, featmap_sizes):
        pts = []
        for (h, w), s in zip(featmap_sizes, self.strides):
            ys, xs = np.mgrid[:h, :w].astype(np.float32)
            pts.append(
                np.stack([xs.ravel() * s + s / 2, ys.ravel() * s + s / 2], -1)
            )
        return pts

    def _decode_points(self, offsets, centers, strides_pts):
        """(B, A, 2*P) offsets (in stride units) -> (B, A, P, 2) image pts."""
        B, A, _ = offsets.shape
        off = offsets.reshape(B, A, self.num_points, 2)
        # channel pairs are (dy, dx) in the reference point convention
        dy = off[..., 0]
        dx = off[..., 1]
        x = centers[None, :, None, 0] + dx * strides_pts[None, :, None]
        y = centers[None, :, None, 1] + dy * strides_pts[None, :, None]
        return jnp.stack([x, y], -1)

    def loss(self, outs, targets):
        featmap_sizes = [o[0].shape[1:3] for o in outs]
        outs = jax.tree.map(lambda t: t.astype(jnp.float32), outs)
        pts_list = self._points(featmap_sizes)
        centers = jnp.asarray(np.concatenate(pts_list, 0))
        strides_pts = jnp.asarray(
            np.concatenate(
                [np.full(len(p), s, np.float32)
                 for s, p in zip(self.strides, pts_list)]
            )
        )
        ranges = jnp.asarray(
            np.concatenate(
                [np.tile(np.asarray(r, np.float32), (len(p), 1))
                 for r, p in zip(self.scale_ranges, pts_list)]
            )
        )
        B = outs[0][0].shape[0]
        cls = jnp.concatenate(
            [o[0].reshape(B, -1, self.num_classes) for o in outs], 1
        )
        off_i = jnp.concatenate(
            [o[1].reshape(B, -1, 2 * self.num_points) for o in outs], 1
        )
        off_r = jnp.concatenate(
            [o[2].reshape(B, -1, 2 * self.num_points) for o in outs], 1
        )
        pts_i = self._decode_points(off_i, centers, strides_pts)
        pts_r = self._decode_points(off_r, centers, strides_pts)

        gt = targets["gt_bboxes"]  # (B, K, 5)
        gt_mask = targets["gt_mask"]
        gt_labels = targets["gt_labels"]
        K = gt.shape[1]
        gt_polys = rbox_to_poly(gt)

        # ---- init assignment: per gt, the closest scale-matched center
        scale = jnp.sqrt(jnp.maximum(gt[..., 2] * gt[..., 3], 1e-6))
        d = jnp.linalg.norm(
            centers[None, None] - gt[..., None, :2], axis=-1
        )  # (B, K, A)
        in_range = (
            (scale[..., None] >= ranges[None, None, :, 0])
            & (scale[..., None] < ranges[None, None, :, 1])
        )
        d = jnp.where(in_range, d, 1e18)
        best_init = d.argmin(-1)  # (B, K)

        # ---- refine assignment: max rotated IoU of init min-area rects
        rects_i = min_area_rect(
            jax.lax.stop_gradient(pts_i).reshape(-1, self.num_points, 2)
        ).reshape(B, -1, 5)
        iou = jax.vmap(
            lambda r, g: box_iou_rotated_aligned(
                r[:, None, :].repeat(K, 1), g[None].repeat(r.shape[0], 0)
            )
        )(rects_i, gt)  # (B, A, K)
        best_refine = iou.argmax(1)  # (B, K)
        refine_ok = jnp.take_along_axis(
            iou, best_refine[:, None, :], 1
        )[:, 0, :] > 0.1

        def gather_pts(pts, idx):
            return jnp.take_along_axis(
                pts.reshape(B, -1, 2 * self.num_points), idx[..., None], 1
            )

        pos_i = gather_pts(pts_i, best_init).reshape(B * K, -1)
        pos_r = gather_pts(pts_r, best_refine).reshape(B * K, -1)
        polys_flat = gt_polys.reshape(B * K, 8)
        w_init = gt_mask.reshape(-1).astype(cls.dtype)
        w_ref = (gt_mask & refine_ok).reshape(-1).astype(cls.dtype)
        num_pos = jnp.maximum(gt_mask.sum(), 1).astype(cls.dtype)

        gl_i = (1 - convex_giou(pos_i, polys_flat)) * w_init
        gl_r = (1 - convex_giou(pos_r, polys_flat)) * w_ref
        loss_init = gl_i.sum() / num_pos * self.loss_init_cfg.get(
            "loss_weight", 0.375
        )
        loss_refine = gl_r.sum() / jnp.maximum(w_ref.sum(), 1.0) * (
            self.loss_refine_cfg.get("loss_weight", 1.0)
        )

        # ---- classification: positives at the refine-assigned locations
        A = cls.shape[1]
        lbl = jnp.zeros((B, A), jnp.int32)
        claims = jnp.where(gt_mask, best_refine, A)  # invalid -> dropped
        lbl = lbl.at[jnp.arange(B)[:, None], claims].max(
            jnp.where(gt_mask, gt_labels, 0), mode="drop"
        )
        loss_cls = sigmoid_focal_loss(
            cls, lbl,
            gamma=self.loss_cls_cfg.get("gamma", 2.0),
            alpha=self.loss_cls_cfg.get("alpha", 0.25),
            avg_factor=num_pos,
        ) * self.loss_cls_cfg.get("loss_weight", 1.0)
        return {
            "loss_cls": loss_cls,
            "loss_pts_init": loss_init,
            "loss_pts_refine": loss_refine,
        }

    # ------------------------------------------------------------------
    def predict(self, outs, targets=None):
        cfg = self.test_cfg
        outs = jax.tree.map(lambda t: t.astype(jnp.float32), outs)
        featmap_sizes = [o[0].shape[1:3] for o in outs]
        pts_list = self._points(featmap_sizes)
        nms_pre = cfg["nms_pre"]
        level_scores, level_boxes = [], []
        for lvl, (cls, off_i, off_r) in enumerate(outs):
            B = cls.shape[0]
            scores = jax.nn.sigmoid(cls.reshape(B, -1, self.num_classes))
            offsets = off_r.reshape(B, -1, 2 * self.num_points)
            centers = jnp.asarray(pts_list[lvl])
            strides_pts = jnp.full(
                (centers.shape[0],), self.strides[lvl], jnp.float32
            )
            n_lvl = centers.shape[0]
            if nms_pre > 0 and n_lvl > nms_pre:
                max_scores = scores.max(-1)
                _, topk = jax.lax.top_k(max_scores, nms_pre)
                scores = jnp.take_along_axis(scores, topk[..., None], 1)
                offsets = jnp.take_along_axis(offsets, topk[..., None], 1)
                centers_b = centers[topk]
                strides_b = strides_pts[topk]
            else:
                centers_b = jnp.broadcast_to(centers, (B, n_lvl, 2))
                strides_b = jnp.broadcast_to(strides_pts, (B, n_lvl))
            off = offsets.reshape(B, -1, self.num_points, 2)
            x = centers_b[..., None, 0] + off[..., 1] * strides_b[..., None]
            y = centers_b[..., None, 1] + off[..., 0] * strides_b[..., None]
            pts = jnp.stack([x, y], -1)
            boxes = min_area_rect(
                pts.reshape(-1, self.num_points, 2)
            ).reshape(B, -1, 5)
            level_scores.append(scores)
            level_boxes.append(boxes)
        all_scores = jnp.concatenate(level_scores, 1)
        all_boxes = jnp.concatenate(level_boxes, 1)
        if targets is not None and "scale_factor" in targets:
            sf = targets["scale_factor"].reshape(-1, 1, 1)
            all_boxes = all_boxes.at[..., :4].divide(sf)
        nms_one = partial(
            multiclass_nms_rotated,
            score_thr=cfg["score_thr"],
            nms_iou_thr=cfg["nms_iou_thr"],
            max_per_img=cfg["max_per_img"],
        )
        det = jax.vmap(nms_one)(all_boxes, all_scores)
        det["polys"] = rbox_to_poly(det["boxes"])
        return det
