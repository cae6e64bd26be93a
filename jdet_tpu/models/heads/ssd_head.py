"""SSD multibox head with hard negative mining.

Capability mirror of `python/jdet/models/roi_heads/ssd_head.py` (+
SSDAnchorGenerator, models/boxes/anchor_generator.py:800): per-level
cls (C+1 softmax, background last) and 4-delta regression over SSD-style
anchors (min/max sizes + aspect ratios); training uses MaxIoU assignment
and 3:1 hard-negative mining, re-expressed fixed-shape as a top-k over
per-anchor classification losses.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .. import nn as jnn
from ..layers import normal_init
from ..boxes.anchor_target import anchor_target_batch
from ..losses import smooth_l1_loss
from ...ops.box_convert import delta2hbox, hbox_to_rbox, rbox_to_poly
from ...ops.nms_rotated import multiclass_nms_rotated
from ...utils.registry import HEADS


def ssd_anchors(featmap_size, stride, min_size, max_size, ratios):
    """SSD anchors for one level: min, sqrt(min*max) squares + ratio
    boxes (anchor_generator.py:800-924)."""
    h, w = featmap_size
    ws = [min_size, float(np.sqrt(min_size * max_size))]
    hs = [min_size, float(np.sqrt(min_size * max_size))]
    for r in ratios:
        sr = float(np.sqrt(r))
        ws += [min_size * sr, min_size / sr]
        hs += [min_size / sr, min_size * sr]
    ws = np.asarray(ws, np.float32)
    hs = np.asarray(hs, np.float32)
    ys, xs = np.mgrid[:h, :w].astype(np.float32)
    cx = (xs.ravel() + 0.5) * stride
    cy = (ys.ravel() + 0.5) * stride
    x1 = cx[:, None] - ws[None] / 2
    y1 = cy[:, None] - hs[None] / 2
    x2 = cx[:, None] + ws[None] / 2
    y2 = cy[:, None] + hs[None] / 2
    return np.stack([x1, y1, x2, y2], -1).reshape(-1, 4)


@HEADS.register_module()
class SSDHead(nnx.Module):
    def __init__(
        self,
        num_classes=15,  # foreground
        in_channels=(512, 1024, 512, 256, 256, 256),
        strides=(8, 16, 32, 64, 100, 300),
        min_sizes=(30, 60, 111, 162, 213, 264),
        max_sizes=(60, 111, 162, 213, 264, 315),
        ratios=((2,), (2, 3), (2, 3), (2, 3), (2,), (2,)),
        target_means=(0.0,) * 4,
        target_stds=(0.1, 0.1, 0.2, 0.2),
        neg_pos_ratio=3,
        test_cfg=None,
        *,
        rngs: nnx.Rngs,
    ):
        self.num_classes = num_classes
        self.strides = tuple(strides)
        self.min_sizes = tuple(min_sizes)
        self.max_sizes = tuple(max_sizes)
        self.ratios = tuple(tuple(r) for r in ratios)
        self.target_means = tuple(target_means)
        self.target_stds = tuple(target_stds)
        self.neg_pos_ratio = neg_pos_ratio
        self.test_cfg = {
            **dict(nms_pre=1000, score_thr=0.02, nms_iou_thr=0.45,
                   max_per_img=200),
            **(test_cfg or {}),
        }
        self.num_anchors = [2 + 2 * len(r) for r in self.ratios]
        cls_convs, reg_convs = [], []
        for ch, na in zip(in_channels, self.num_anchors):
            cls_convs.append(
                jnn.Conv(ch, na * (num_classes + 1), (3, 3),
                         kernel_init=normal_init(0.01), rngs=rngs)
            )
            reg_convs.append(
                jnn.Conv(ch, na * 4, (3, 3),
                         kernel_init=normal_init(0.01), rngs=rngs)
            )
        self.cls_convs = nnx.List(cls_convs)
        self.reg_convs = nnx.List(reg_convs)

    def __call__(self, feats, train: bool = False):
        return [
            (self.cls_convs[i](f), self.reg_convs[i](f))
            for i, f in enumerate(feats)
        ]

    def _anchors(self, featmap_sizes):
        return np.concatenate(
            [
                ssd_anchors(tuple(fs), s, mn, mx, r)
                for fs, s, mn, mx, r in zip(
                    featmap_sizes, self.strides, self.min_sizes,
                    self.max_sizes, self.ratios,
                )
            ],
            0,
        )

    def loss(self, outs, targets):
        featmap_sizes = [o[0].shape[1:3] for o in outs]
        outs = jax.tree.map(lambda t: t.astype(jnp.float32), outs)
        anchors = jnp.asarray(self._anchors(featmap_sizes))
        B = outs[0][0].shape[0]
        C1 = self.num_classes + 1
        cls = jnp.concatenate([o[0].reshape(B, -1, C1) for o in outs], 1)
        reg = jnp.concatenate([o[1].reshape(B, -1, 4) for o in outs], 1)

        gt_h = targets.get("gt_hboxes")
        if gt_h is None:
            from ...ops.box_convert import rbox_to_hbox

            gt_h = rbox_to_hbox(targets["gt_bboxes"])
        tgt, num_pos, _ = anchor_target_batch(
            anchors,
            jnp.ones(anchors.shape[0], bool),
            gt_h,
            targets["gt_mask"],
            targets["gt_labels"],
            target_means=self.target_means,
            target_stds=self.target_stds,
            assigner_cfg=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                              min_pos_iou=0.0),
            rotated=False,
        )
        num_pos = jnp.maximum(num_pos, 1).astype(cls.dtype)
        # labels: 1-based fg -> softmax index (bg last = num_classes)
        lbl = jnp.where(tgt["labels"] > 0, tgt["labels"] - 1,
                        self.num_classes)
        logp = jax.nn.log_softmax(cls, -1)
        ce = -jnp.take_along_axis(logp, lbl[..., None], -1)[..., 0]
        pos = tgt["pos_mask"]
        neg_cand = tgt["neg_mask"]
        # hard negative mining: top (ratio * num_pos) negatives by loss
        neg_loss = jnp.where(neg_cand, ce, -jnp.inf).reshape(B, -1)
        order = jnp.argsort(-neg_loss, -1)
        rank = jnp.argsort(order, -1)
        num_neg = (
            self.neg_pos_ratio
            * jnp.maximum(pos.reshape(B, -1).sum(-1, keepdims=True), 1)
        )
        neg_sel = neg_cand.reshape(B, -1) & (rank < num_neg)
        loss_cls = (
            jnp.where(pos.reshape(B, -1) | neg_sel, ce.reshape(B, -1), 0.0)
        ).sum() / num_pos
        loss_bbox = smooth_l1_loss(
            reg, tgt["bbox_targets"], weight=tgt["bbox_weights"],
            beta=1.0, avg_factor=num_pos,
        )
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox}

    def predict(self, outs, targets=None):
        cfg = self.test_cfg
        outs = jax.tree.map(lambda t: t.astype(jnp.float32), outs)
        featmap_sizes = [o[0].shape[1:3] for o in outs]
        anchors = jnp.asarray(self._anchors(featmap_sizes))
        B = outs[0][0].shape[0]
        C1 = self.num_classes + 1
        cls = jnp.concatenate([o[0].reshape(B, -1, C1) for o in outs], 1)
        reg = jnp.concatenate([o[1].reshape(B, -1, 4) for o in outs], 1)
        scores = jax.nn.softmax(cls, -1)[..., : self.num_classes]
        n = anchors.shape[0]
        pre = min(cfg["nms_pre"], n)
        max_scores = scores.max(-1)
        _, topk = jax.lax.top_k(max_scores, pre)
        scores = jnp.take_along_axis(scores, topk[..., None], 1)
        deltas = jnp.take_along_axis(reg, topk[..., None], 1)
        anchors_b = anchors[topk]
        hbb = delta2hbox(anchors_b, deltas, self.target_means, self.target_stds)
        boxes = hbox_to_rbox(hbb)
        if targets is not None and "scale_factor" in targets:
            sf = targets["scale_factor"].reshape(-1, 1, 1)
            boxes = boxes.at[..., :4].divide(sf)
        nms_one = partial(
            multiclass_nms_rotated,
            score_thr=cfg["score_thr"],
            nms_iou_thr=cfg["nms_iou_thr"],
            max_per_img=cfg["max_per_img"],
        )
        det = jax.vmap(nms_one)(boxes, scores)
        det["polys"] = rbox_to_poly(det["boxes"])
        return det
