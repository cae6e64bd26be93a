"""Rotated RetinaNet head — fixed-shape, batched, jit-first.

Capability mirror of the reference RotatedRetinaHead
(`python/jdet/models/roi_heads/rotated_retina_head.py:18-449`): 4-conv cls
and reg towers, A anchors/location predicting (dx, dy, dw, dh, da) deltas
and C=num_classes-1 sigmoid class scores; MaxIoU assignment on rotated IoU;
focal + smooth-L1 losses averaged by total positives; test-time per-level
top-k -> decode -> multiclass rotated NMS.

TPU redesign vs the reference:
  - whole-batch loss in one jit region: targets via vmapped masked
    assignment over concatenated all-level anchors (equivalent to the
    reference's per-image python loop + per-level loss list, which sums).
  - detection path is fixed-shape: per-level static top-k, masked NMS with
    a max_per_img budget and validity mask (no dynamic boolean indexing).
  - anchors are trace-time numpy constants per feature-map size.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .. import nn as jnn

from ..layers import ConvModule, bias_init_with_prob, normal_init
from ..boxes.anchor_generator import AnchorGeneratorRotated
from ..boxes.anchor_target import anchor_target_batch
from ..losses import sigmoid_focal_loss, smooth_l1_loss
from ...ops.box_convert import delta2rbox, rbox_to_poly
from ...ops.nms_rotated import multiclass_nms_rotated
from ...utils.registry import HEADS


DEFAULT_TRAIN_CFG = dict(
    assigner=dict(
        pos_iou_thr=0.5,
        neg_iou_thr=0.4,
        min_pos_iou=0.0,
    ),
    allowed_border=-1,
    pos_weight=-1,
)

DEFAULT_TEST_CFG = dict(
    nms_pre=2000,
    score_thr=0.05,
    nms_iou_thr=0.1,
    max_per_img=2000,
)


@HEADS.register_module()
class RotatedRetinaHead(nnx.Module):
    def __init__(
        self,
        num_classes,
        in_channels,
        feat_channels=256,
        stacked_convs=4,
        octave_base_scale=4,
        scales_per_octave=3,
        anchor_ratios=(1.0, 0.5, 2.0),
        anchor_strides=(8, 16, 32, 64, 128),
        anchor_base_sizes=None,
        anchor_angles=(0.0,),
        target_means=(0.0,) * 5,
        target_stds=(1.0,) * 5,
        anchor_generator_cfg=None,
        loss_cls=dict(gamma=2.0, alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(beta=1.0 / 9.0, loss_weight=1.0),
        train_cfg=None,
        test_cfg=None,
        *,
        rngs: nnx.Rngs,
    ):
        # reference convention: num_classes includes background;
        # sigmoid logits have num_classes - 1 channels (rotated_retina_head.py:75-78)
        self.num_classes = num_classes
        self.cls_out_channels = num_classes - 1
        self.in_channels = in_channels
        self.feat_channels = feat_channels
        self.stacked_convs = stacked_convs
        self.anchor_strides = tuple(anchor_strides)
        self.target_means = tuple(target_means)
        self.target_stds = tuple(target_stds)
        self.loss_cls_cfg = dict(loss_cls)
        self.loss_bbox_cfg = dict(loss_bbox)
        self.train_cfg = {**DEFAULT_TRAIN_CFG, **(train_cfg or {})}
        self.test_cfg = {**DEFAULT_TEST_CFG, **(test_cfg or {})}

        base_sizes = (
            list(anchor_strides) if anchor_base_sizes is None else anchor_base_sizes
        )
        agen_cfg = dict(anchor_generator_cfg or {})
        agen_type = agen_cfg.pop("type", "rotated")
        if agen_type in ("yangxue", "AnchorGeneratorYangXue"):
            from ..boxes.anchor_generator import AnchorGeneratorYangXue

            gen_cls = AnchorGeneratorYangXue
        else:
            gen_cls = AnchorGeneratorRotated
        self.anchor_generators = [
            gen_cls(
                bs,
                octave_base_scale=octave_base_scale,
                scales_per_octave=scales_per_octave,
                ratios=anchor_ratios,
                angles=anchor_angles,
                **agen_cfg,
            )
            for bs in base_sizes
        ]
        self.num_anchors = self.anchor_generators[0].num_base_anchors

        reg_convs, cls_convs = [], []
        for i in range(stacked_convs):
            chn = in_channels if i == 0 else feat_channels
            reg_convs.append(
                ConvModule(chn, feat_channels, 3, kernel_init=normal_init(0.01), rngs=rngs)
            )
            cls_convs.append(
                ConvModule(chn, feat_channels, 3, kernel_init=normal_init(0.01), rngs=rngs)
            )
        self.reg_convs = nnx.List(reg_convs)
        self.cls_convs = nnx.List(cls_convs)
        self.retina_reg = jnn.Conv(
            feat_channels,
            self.num_anchors * 5,
            (1, 1),
            kernel_init=normal_init(0.01),
            rngs=rngs,
        )
        self.retina_cls = jnn.Conv(
            feat_channels,
            self.num_anchors * self.cls_out_channels,
            (1, 1),
            kernel_init=normal_init(0.01),
            bias_init=nnx.initializers.constant(bias_init_with_prob(0.01)),
            rngs=rngs,
        )

    # ------------------------------------------------------------------
    def forward_single(self, x, train=False):
        reg_feat = x
        for conv in self.reg_convs:
            reg_feat = conv(reg_feat, train)
        bbox_pred = self.retina_reg(reg_feat)
        cls_feat = x
        for conv in self.cls_convs:
            cls_feat = conv(cls_feat, train)
        cls_score = self.retina_cls(cls_feat)
        return cls_score, bbox_pred

    def __call__(self, feats, train: bool = False):
        return [self.forward_single(f, train) for f in feats]

    # ------------------------------------------------------------------
    def _flat_anchors(self, featmap_sizes):
        anchors = [
            gen.grid_anchors(tuple(fs), s)
            for gen, fs, s in zip(
                self.anchor_generators, featmap_sizes, self.anchor_strides
            )
        ]
        return jnp.concatenate(anchors, 0)

    def _reg_to_deltas(self, reg, b):
        """Per-level regression map -> (b, A, 5) deltas (hook for
        distribution heads)."""
        return reg.reshape(b, -1, 5)

    def _flatten_outs(self, outs):
        """[(cls NHWC, reg NHWC)] -> (B, A_total, C), (B, A_total, 5)."""
        cls_list, reg_list = [], []
        for cls, reg in outs:
            b = cls.shape[0]
            cls_list.append(cls.reshape(b, -1, self.cls_out_channels))
            reg_list.append(reg.reshape(b, -1, 5))
        return jnp.concatenate(cls_list, 1), jnp.concatenate(reg_list, 1)

    def loss(self, outs, targets):
        """Compute losses from head outputs.

        targets: dict with gt_bboxes (B, K, 5), gt_labels (B, K) 1-based,
        gt_mask (B, K) bool.
        """
        featmap_sizes = [o[0].shape[1:3] for o in outs]
        outs = jax.tree.map(lambda t: t.astype(jnp.float32), outs)
        anchors = jnp.asarray(self._flat_anchors(featmap_sizes))
        cls_scores, bbox_preds = self._flatten_outs(outs)

        bbox_loss_type = self.loss_bbox_cfg.get("type", "smooth_l1")
        reg_decoded = bbox_loss_type in (
            "gwd", "kld", "bcd", "iou", "poly_iou", "poly_giou", "ridet"
        )

        tcfg = self.train_cfg
        assigner_cfg = dict(tcfg["assigner"])
        if assigner_cfg.get("type") == "atss":
            assigner_cfg.setdefault(
                "num_level_anchors",
                [
                    int(fs[0]) * int(fs[1]) * self.num_anchors
                    for fs in featmap_sizes
                ],
            )
        tgt, num_pos, num_neg = anchor_target_batch(
            anchors,
            jnp.ones(anchors.shape[0], bool),
            targets["gt_bboxes"],
            targets["gt_mask"],
            targets["gt_labels"],
            target_means=self.target_means,
            target_stds=self.target_stds,
            assigner_cfg=assigner_cfg,
            allowed_border=tcfg.get("allowed_border", -1),
            pos_weight=tcfg.get("pos_weight", -1),
            rotated=True,
            reg_decoded_bbox=reg_decoded,
        )
        num_total = jnp.maximum(num_pos, 1).astype(cls_scores.dtype)
        loss_cls = sigmoid_focal_loss(
            cls_scores,
            tgt["labels"],
            weight=tgt["label_weights"],
            gamma=self.loss_cls_cfg.get("gamma", 2.0),
            alpha=self.loss_cls_cfg.get("alpha", 0.25),
            avg_factor=num_total,
        ) * self.loss_cls_cfg.get("loss_weight", 1.0)
        loss_bbox = self._bbox_loss(
            anchors, bbox_preds, tgt, num_total
        ) * self.loss_bbox_cfg.get("loss_weight", 1.0)
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox}

    def _bbox_loss(self, anchors, bbox_preds, tgt, num_total):
        """Regression loss dispatch — capability mirror of the loss-variant
        head family (KFIoURRetinaHead: kfiou_rotated_retina_head.py;
        GWD/KLD via GDLoss configs on RotatedRetinaHead)."""
        cfg = self.loss_bbox_cfg
        kind = cfg.get("type", "smooth_l1")
        w1 = tgt["bbox_weights"][..., 0]
        if kind == "smooth_l1":
            return smooth_l1_loss(
                bbox_preds,
                tgt["bbox_targets"],
                weight=tgt["bbox_weights"],
                beta=cfg.get("beta", 1.0 / 9.0),
                avg_factor=num_total,
            )
        if kind in ("gwd", "kld", "bcd"):
            from ..losses import gaussian_dist_loss

            decoded = delta2rbox(
                anchors[None], bbox_preds, self.target_means, self.target_stds
            )
            flat_p = decoded.reshape(-1, 5)
            flat_t = tgt["bbox_targets"].reshape(-1, 5)
            extra = (
                {"compat_ref": cfg["compat_ref"]}
                if kind == "kld" and "compat_ref" in cfg
                else {}
            )
            return gaussian_dist_loss(
                flat_p,
                flat_t,
                loss_type=kind,
                weight=w1.reshape(-1),
                fun=cfg.get("fun", "log1p"),
                tau=cfg.get("tau", 1.0),
                avg_factor=num_total,
                **extra,
            )
        if kind == "kfiou":
            from ..losses import kf_iou_loss

            # encoded pred/target xy + decoded Gaussians (kf_iou_loss.py)
            decoded_p = delta2rbox(
                anchors[None], bbox_preds, self.target_means, self.target_stds
            )
            decoded_t = delta2rbox(
                anchors[None],
                tgt["bbox_targets"],
                self.target_means,
                self.target_stds,
            )
            return kf_iou_loss(
                bbox_preds.reshape(-1, 5),
                tgt["bbox_targets"].reshape(-1, 5),
                pred_decode=decoded_p.reshape(-1, 5),
                targets_decode=decoded_t.reshape(-1, 5),
                weight=w1.reshape(-1),
                avg_factor=num_total,
            )
        if kind == "rsdet":
            from ..losses import rsdet_loss

            n = anchors.shape[0]
            b = bbox_preds.shape[0]
            return rsdet_loss(
                bbox_preds.reshape(-1, 5),
                tgt["bbox_targets"].reshape(-1, 5),
                jnp.broadcast_to(anchors[None], (b, n, 5)).reshape(-1, 5),
                weight=w1.reshape(-1),
                sigma=cfg.get("sigma", 3.0),
                avg_factor=num_total,
            )
        if kind == "iou":
            from ..losses import rotated_iou_loss

            decoded = delta2rbox(
                anchors[None], bbox_preds, self.target_means, self.target_stds
            )
            return rotated_iou_loss(
                decoded.reshape(-1, 5),
                tgt["bbox_targets"].reshape(-1, 5),
                weight=w1.reshape(-1),
                mode=cfg.get("mode", "log"),
                avg_factor=num_total,
            )
        if kind in ("poly_iou", "poly_giou"):
            from ..losses import poly_giou_loss, poly_iou_loss

            decoded = delta2rbox(
                anchors[None], bbox_preds, self.target_means, self.target_stds
            )
            fn = poly_iou_loss if kind == "poly_iou" else poly_giou_loss
            kw = {"linear": cfg.get("linear", False)} if kind == "poly_iou" else {}
            return fn(
                decoded.reshape(-1, 5),
                tgt["bbox_targets"].reshape(-1, 5),
                weight=w1.reshape(-1),
                avg_factor=num_total,
                **kw,
            )
        if kind == "ridet":
            from ..losses import ridet_loss

            decoded = delta2rbox(
                anchors[None], bbox_preds, self.target_means, self.target_stds
            )
            return ridet_loss(
                decoded.reshape(-1, 5),
                tgt["bbox_targets"].reshape(-1, 5),
                weight=w1.reshape(-1),
                beta=cfg.get("beta", 1.0),
                avg_factor=num_total,
            )
        raise ValueError(kind)

    # ------------------------------------------------------------------
    def predict(self, outs, targets=None):
        """Fixed-shape batched detection (mirror of get_bboxes,
        rotated_retina_head.py:305-372).

        Returns dict of polys (B, max_per_img, 8), boxes (B, max_per_img, 5),
        scores, labels (0-based fg), valid.
        """
        cfg = self.test_cfg
        outs = jax.tree.map(lambda t: t.astype(jnp.float32), outs)
        featmap_sizes = [o[0].shape[1:3] for o in outs]
        nms_pre = cfg["nms_pre"]

        level_scores, level_boxes = [], []
        for lvl, (cls, reg) in enumerate(outs):
            b = cls.shape[0]
            scores = jax.nn.sigmoid(
                cls.reshape(b, -1, self.cls_out_channels)
            )
            deltas = self._reg_to_deltas(reg, b)
            anchors = jnp.asarray(
                self.anchor_generators[lvl].grid_anchors(
                    tuple(featmap_sizes[lvl]), self.anchor_strides[lvl]
                )
            )
            n_lvl = anchors.shape[0]
            if nms_pre > 0 and n_lvl > nms_pre:
                max_scores = scores.max(-1)
                _, topk = jax.lax.top_k(max_scores, nms_pre)
                scores = jnp.take_along_axis(scores, topk[..., None], 1)
                deltas = jnp.take_along_axis(deltas, topk[..., None], 1)
                anchors_b = anchors[topk]
            else:
                anchors_b = jnp.broadcast_to(anchors, (b, n_lvl, 5))
            boxes = delta2rbox(
                anchors_b, deltas, self.target_means, self.target_stds
            )
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

    def execute(self, feats, targets=None, train=False):
        """Reference-style entry (rotated_retina_head.py:execute)."""
        outs = self(feats, train)
        if train:
            return self.loss(outs, targets)
        return self.predict(outs, targets)


@HEADS.register_module()
class GWDRetinaHead(RotatedRetinaHead):
    """GWD loss variant (reference GWD configs: GDLoss('gwd') on
    RotatedRetinaHead, losses/gaussian_dist_loss.py)."""

    def __init__(self, *a, loss_bbox=None, **kw):
        super().__init__(
            *a, loss_bbox=loss_bbox or dict(type="gwd", tau=1.0,
                                            loss_weight=1.0), **kw
        )


@HEADS.register_module()
class KLDRetinaHead(RotatedRetinaHead):
    """KLD loss variant (losses/gaussian_dist_loss.py kld)."""

    def __init__(self, *a, loss_bbox=None, **kw):
        super().__init__(
            *a, loss_bbox=loss_bbox or dict(type="kld", tau=1.0,
                                            loss_weight=1.0), **kw
        )


@HEADS.register_module()
class KFIoURRetinaHead(RotatedRetinaHead):
    """KFIoU loss variant (reference kfiou_rotated_retina_head.py)."""

    def __init__(self, *a, loss_bbox=None, **kw):
        super().__init__(
            *a, loss_bbox=loss_bbox or dict(type="kfiou", loss_weight=1.0),
            **kw
        )


@HEADS.register_module()
class RotatedATSSHead(RotatedRetinaHead):
    """ATSS adaptive-assignment variant (reference rotated_atss_head.py,
    ATSSAssignerRbbox assigner.py:277-393). Architecture identical to
    RotatedRetinaHead; the assigner picks topk-center candidates with a
    mean+std IoU threshold. Typically used with 1 anchor per location."""

    def __init__(self, *a, train_cfg=None, **kw):
        tc = dict(train_cfg or {})
        tc.setdefault("assigner", dict(type="atss", topk=9))
        super().__init__(*a, train_cfg=tc, **kw)


@HEADS.register_module()
class RSDetHead(RotatedRetinaHead):
    """RSDet modulated-loss variant (reference rsdet_head.py:6,
    losses/rsdet_loss.py)."""

    def __init__(self, *a, loss_bbox=None, **kw):
        super().__init__(
            *a, loss_bbox=loss_bbox or dict(type="rsdet", sigma=3.0,
                                            loss_weight=1.0), **kw
        )
