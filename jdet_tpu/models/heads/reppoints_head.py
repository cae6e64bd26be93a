"""Rotated RepPoints head — 9-point set representation.

Capability mirror of the reference RotatedRepPointsHead
(`python/jdet/models/roi_heads/rotated_reppoints_head.py:73-1541`):
point-based towers predict 9 offset points per location in an init and a
refine stage; positives are supervised with the convex GIoU of the point
hull vs the gt quad (losses/convex_giou_loss.py); detection converts point
sets to boxes via the min-area enclosing rect (reppoints_min_area_bbox).

Fixed-shape redesign notes: assignment follows the reference semantics
exactly — ConvexAssigner for init (per gt, the `pos_num` nearest centers
on the scale-matched level, conflicts resolved by strictly-smaller
normalized distance; models/boxes/assigner.py:394-551) and
MaxConvexIoUAssigner for refine (threshold assignment on the convex IoU
of every detached init point hull vs every gt quad,
assigner.py:551-611) — re-expressed as masked dense ops
(jdet_tpu.models.boxes.assigner.convex_assign_init /
max_convex_iou_assign, oracle-locksteped in tests/test_target_oracles).
The only fixed-shape concession: the refine-stage GIoU loss reads its
positives through a static `refine_pos_budget` top-IoU selection (the
classification loss still sees every positive/negative/ignore point).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .. import nn as jnn
from ..layers import ConvModule, bias_init_with_prob, normal_init
from ..boxes.assigner import convex_assign_init, max_convex_iou_assign
from ..losses import sigmoid_focal_loss
from ...ops.convex import convex_giou, min_area_rect
from ...ops.box_convert import rbox_to_poly
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
        point_base_scale=4,
        init_pos_num=1,
        refine_assign=dict(pos_iou_thr=0.4, neg_iou_thr=0.3, min_pos_iou=0.0),
        refine_pos_budget=None,
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
        self.point_base_scale = point_base_scale
        self.init_pos_num = init_pos_num
        self.refine_assign_cfg = dict(refine_assign)
        self.refine_pos_budget = refine_pos_budget
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

        A = cls.shape[1]
        pts_i_flat = pts_i.reshape(B, A, 2 * self.num_points)
        pts_r_flat = pts_r.reshape(B, A, 2 * self.num_points)

        # ---- init assignment: ConvexAssigner reference semantics
        pt_lvls = jnp.log2(strides_pts)
        assign_i = jax.vmap(
            lambda gp, gm: convex_assign_init(
                centers, pt_lvls, gp, gm,
                pos_num=self.init_pos_num, scale=self.point_base_scale,
            )
        )(gt_polys, gt_mask)
        cand_idx = assign_i["cand_idx"]  # (B, K, P)
        cand_win = assign_i["cand_win"]  # (B, K, P)
        P = cand_idx.shape[-1]

        # ---- refine assignment: MaxConvexIoU over detached init hulls
        assign_r = jax.vmap(
            lambda ps, gp, gm, gl: max_convex_iou_assign(
                ps, gp, gm, gl, **self.refine_assign_cfg
            )
        )(pts_i_flat, gt_polys, gt_mask, gt_labels)
        gt_inds_r = assign_r["gt_inds"]  # (B, A): -1 ignore / 0 / 1-based

        # ---- init GIoU loss at each gt's winning candidate points
        pos_i = jnp.take_along_axis(
            pts_i_flat, cand_idx.reshape(B, K * P)[..., None], 1
        ).reshape(B * K * P, -1)
        poly_i = jnp.broadcast_to(
            gt_polys[:, :, None, :], (B, K, P, 8)
        ).reshape(B * K * P, 8)
        w_init = cand_win.reshape(-1).astype(cls.dtype)
        gl_i = (1 - convex_giou(pos_i, poly_i)) * w_init
        loss_init = gl_i.sum() / jnp.maximum(w_init.sum(), 1.0) * (
            self.loss_init_cfg.get("loss_weight", 0.375)
        )

        # ---- refine GIoU loss: all threshold positives, read through a
        # static top-IoU budget (the classification loss below still sees
        # the full assignment)
        M = self.refine_pos_budget or min(A, 8 * K)
        pos_r_mask = gt_inds_r > 0
        sel_score = jnp.where(pos_r_mask, assign_r["max_overlaps"], -jnp.inf)
        top_s, top_idx = jax.lax.top_k(sel_score, M)  # (B, M)
        w_ref = jnp.isfinite(top_s).astype(cls.dtype).reshape(-1)
        pos_r = jnp.take_along_axis(
            pts_r_flat, top_idx[..., None], 1
        ).reshape(B * M, -1)
        sel_gt = jnp.clip(
            jnp.take_along_axis(gt_inds_r, top_idx, 1) - 1, 0, K - 1
        )
        poly_r = jnp.take_along_axis(
            gt_polys, sel_gt[..., None], 1
        ).reshape(B * M, 8)
        gl_r = (1 - convex_giou(pos_r, poly_r)) * w_ref
        loss_refine = gl_r.sum() / jnp.maximum(w_ref.sum(), 1.0) * (
            self.loss_refine_cfg.get("loss_weight", 1.0)
        )

        # ---- classification from the refine assignment (reference
        # loss_single: labels/label_weights of the refine stage, ignore
        # band 0.3..0.4 zero-weighted, avg by refine positives)
        lbl = assign_r["labels"]
        lw = (gt_inds_r >= 0).astype(cls.dtype)
        num_pos = jnp.maximum(pos_r_mask.sum(), 1).astype(cls.dtype)
        loss_cls = sigmoid_focal_loss(
            cls, lbl, weight=lw,
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
