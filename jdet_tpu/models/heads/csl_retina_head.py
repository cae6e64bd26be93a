"""CSL rotated RetinaNet head: angle-classification branch.

Capability mirror of the reference CSLRRetinaHead
(`python/jdet/models/roi_heads/csl_rretina_head.py:18-602`): a
`coding_len`-channel angle-classification conv off the regression tower;
targets are the CSL-smoothed encoded delta angles of positive anchors
(csl_rretina_head.py:560-600) trained with smooth focal loss; at
inference the CSL-decoded angle overwrites the regressed delta-angle
channel before box decoding (csl_rretina_head.py:393-395).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .. import nn as jnn

from .rotated_retina_head import RotatedRetinaHead
from ..layers import bias_init_with_prob, normal_init
from ..boxes.anchor_target import anchor_target_batch
from ..boxes.coder import CSLCoder
from ..losses import sigmoid_focal_loss, smooth_l1_loss, smooth_focal_loss
from ...ops.box_convert import delta2rbox, rbox_to_poly, rbox2delta
from ...ops.nms_rotated import multiclass_nms_rotated
from ...utils.registry import HEADS


@HEADS.register_module()
class CSLRRetinaHead(RotatedRetinaHead):
    def __init__(
        self,
        *args,
        angle_coder=dict(omega=4, window="gaussian", radius=3),
        loss_angle=dict(gamma=2.0, alpha=0.25, loss_weight=0.8),
        rngs: nnx.Rngs,
        **kw,
    ):
        super().__init__(*args, rngs=rngs, **kw)
        self.angle_coder = CSLCoder(**angle_coder)
        self.coding_len = self.angle_coder.coding_len
        self.loss_angle_cfg = dict(loss_angle)
        self.retina_angle_cls = jnn.Conv(
            self.feat_channels,
            self.num_anchors * self.coding_len,
            (1, 1),
            kernel_init=normal_init(0.01),
            bias_init=nnx.initializers.constant(bias_init_with_prob(0.01)),
            rngs=rngs,
        )

    def forward_single(self, x, train=False):
        reg_feat = x
        for conv in self.reg_convs:
            reg_feat = conv(reg_feat, train)
        bbox_pred = self.retina_reg(reg_feat)
        angle_cls = self.retina_angle_cls(reg_feat)
        cls_feat = x
        for conv in self.cls_convs:
            cls_feat = conv(cls_feat, train)
        cls_score = self.retina_cls(cls_feat)
        return cls_score, bbox_pred, angle_cls

    def loss(self, outs, targets):
        outs = jax.tree.map(lambda t: t.astype(jnp.float32), outs)
        featmap_sizes = [o[0].shape[1:3] for o in outs]
        anchors = jnp.asarray(self._flat_anchors(featmap_sizes))
        B = outs[0][0].shape[0]
        cls_scores = jnp.concatenate(
            [o[0].reshape(B, -1, self.cls_out_channels) for o in outs], 1
        )
        bbox_preds = jnp.concatenate([o[1].reshape(B, -1, 5) for o in outs], 1)
        angle_preds = jnp.concatenate(
            [o[2].reshape(B, -1, self.coding_len) for o in outs], 1
        )

        tcfg = self.train_cfg
        tgt, num_pos, num_neg = anchor_target_batch(
            anchors,
            jnp.ones(anchors.shape[0], bool),
            targets["gt_bboxes"],
            targets["gt_mask"],
            targets["gt_labels"],
            target_means=self.target_means,
            target_stds=self.target_stds,
            assigner_cfg=tcfg["assigner"],
            allowed_border=tcfg.get("allowed_border", -1),
            pos_weight=tcfg.get("pos_weight", -1),
            rotated=True,
        )
        num_total = jnp.maximum(num_pos, 1).astype(cls_scores.dtype)
        loss_cls = sigmoid_focal_loss(
            cls_scores, tgt["labels"], weight=tgt["label_weights"],
            gamma=self.loss_cls_cfg.get("gamma", 2.0),
            alpha=self.loss_cls_cfg.get("alpha", 0.25),
            avg_factor=num_total,
        ) * self.loss_cls_cfg.get("loss_weight", 1.0)
        loss_bbox = smooth_l1_loss(
            bbox_preds, tgt["bbox_targets"], weight=tgt["bbox_weights"],
            beta=self.loss_bbox_cfg.get("beta", 1.0 / 9.0),
            avg_factor=num_total,
        ) * self.loss_bbox_cfg.get("loss_weight", 1.0)

        # CSL angle targets: smooth labels of the encoded delta angle of
        # positives (csl_rretina_head.py:574-578)
        angle_targets = self.angle_coder.encode(tgt["bbox_targets"][..., 4])
        angle_w = tgt["bbox_weights"][..., 4]
        acfg = self.loss_angle_cfg
        loss_angle = smooth_focal_loss(
            angle_preds,
            angle_targets,
            weight=angle_w,
            gamma=acfg.get("gamma", 2.0),
            alpha=acfg.get("alpha", 0.25),
            avg_factor=num_total,
        ) * acfg.get("loss_weight", 0.8)
        return {
            "loss_cls": loss_cls,
            "loss_bbox": loss_bbox,
            "loss_angle": loss_angle,
        }

    def predict(self, outs, targets=None):
        cfg = self.test_cfg
        outs = jax.tree.map(lambda t: t.astype(jnp.float32), outs)
        featmap_sizes = [o[0].shape[1:3] for o in outs]
        nms_pre = cfg["nms_pre"]
        level_scores, level_boxes = [], []
        for lvl, (cls, reg, ang) in enumerate(outs):
            b = cls.shape[0]
            scores = jax.nn.sigmoid(cls.reshape(b, -1, self.cls_out_channels))
            deltas = reg.reshape(b, -1, 5)
            angle_logits = jax.nn.sigmoid(ang.reshape(b, -1, self.coding_len))
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
                angle_logits = jnp.take_along_axis(
                    angle_logits, topk[..., None], 1
                )
                anchors_b = anchors[topk]
            else:
                anchors_b = jnp.broadcast_to(anchors, (b, n_lvl, 5))
            # CSL-decoded angle replaces the regressed delta-angle channel
            angle = self.angle_coder.decode(angle_logits)
            deltas = deltas.at[..., 4].set(angle)
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
