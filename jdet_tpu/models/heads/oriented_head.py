"""Oriented R-CNN stage-2 head: rotated RoIAlign + 2FC + cls/reg.

Capability mirror of the reference OrientedHead
(`python/jdet/models/roi_heads/oriented_head.py:14-530`): rotated
proposals are assigned to rotated gts (MaxIoU on rotated IoU), randomly
sampled to a fixed budget with gt boxes appended as proposals, RoIAligned
(OrientedSingleRoIExtractor level routing), passed through shared FCs into
C+1 softmax (background last, mmdet-v2 layout) and 5-param delta
regression; detection decodes per-roi deltas and runs multiclass rotated
NMS (oriented_head.py:412-444).

Fixed-shape redesign: proposals arrive as (B, P, 5) + valid; sampling
produces (B, S, 5) rois + weights without boolean gathers.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import nnx

from .. import nn as jnn

from ..layers import normal_init
from ..boxes.assigner import max_iou_assign_rotated
from ..boxes.sampler import random_sample
from ..losses import cross_entropy_loss, smooth_l1_loss
from ..roi_extractors.single_level import OrientedSingleRoIExtractor
from ...ops.box_convert import delta2rbox, rbox2delta, rbox_to_poly
from ...ops.nms_rotated import multiclass_nms_rotated
from ...utils.registry import HEADS


DEFAULT_TRAIN_CFG = dict(
    assigner=dict(
        pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
        match_low_quality=False,
    ),
    sampler=dict(num=512, pos_fraction=0.25, neg_pos_ub=-1,
                 add_gt_as_proposals=True),
    pos_weight=-1,
)

DEFAULT_TEST_CFG = dict(score_thr=0.05, nms_iou_thr=0.1, max_per_img=2000)


@HEADS.register_module()
class OrientedHead(nnx.Module):
    def __init__(
        self,
        num_classes=15,
        in_channels=256,
        fc_out_channels=1024,
        num_shared_fcs=2,
        roi_size=7,
        featmap_strides=(4, 8, 16, 32),
        target_means=(0.0,) * 5,
        target_stds=(0.1, 0.1, 0.2, 0.2, 0.1),
        reg_class_agnostic=True,
        extend_factor=(1.0, 1.0),
        train_cfg=None,
        test_cfg=None,
        *,
        rngs: nnx.Rngs,
    ):
        self.num_classes = num_classes  # foreground classes
        self.target_means = tuple(target_means)
        self.target_stds = tuple(target_stds)
        self.reg_class_agnostic = reg_class_agnostic
        self.train_cfg = {**DEFAULT_TRAIN_CFG, **(train_cfg or {})}
        self.test_cfg = {**DEFAULT_TEST_CFG, **(test_cfg or {})}
        self.roi_extractor = OrientedSingleRoIExtractor(
            out_size=roi_size,
            featmap_strides=featmap_strides,
            extend_factor=extend_factor,
        )
        in_dim = in_channels * roi_size * roi_size
        fcs = []
        for i in range(num_shared_fcs):
            fcs.append(
                jnn.Linear(
                    in_dim if i == 0 else fc_out_channels,
                    fc_out_channels,
                    kernel_init=nnx.initializers.xavier_uniform(),
                    rngs=rngs,
                )
            )
        self.shared_fcs = nnx.List(fcs)
        self.fc_cls = jnn.Linear(
            fc_out_channels, num_classes + 1,
            kernel_init=normal_init(0.01), rngs=rngs,
        )
        reg_dim = 5 if reg_class_agnostic else 5 * num_classes
        self.fc_reg = jnn.Linear(
            fc_out_channels, reg_dim,
            kernel_init=normal_init(0.001), rngs=rngs,
        )

    # ------------------------------------------------------------------
    def _forward_rois(self, feats, rois, valid):
        x = self.roi_extractor(feats, rois, valid)  # (B, S, P, P, C)
        B, S = x.shape[:2]
        x = x.reshape(B, S, -1)
        for fc in self.shared_fcs:
            x = jax.nn.relu(fc(x))
        return (self.fc_cls(x).astype(jnp.float32),
                self.fc_reg(x).astype(jnp.float32))

    # ------------------------------------------------------------------
    def _sample_rois(self, proposals, p_valid, gt_bboxes, gt_mask, gt_labels, key):
        """Assign + random-sample one image's proposals (fixed shapes).

        Returns rois (S, 5), labels (S,), label_weights, bbox_targets,
        bbox_weights. Labels here are 0-based fg with background =
        num_classes (mmdet-v2 layout used by this head family).
        """
        cfg = self.train_cfg
        scfg = cfg["sampler"]
        if scfg.get("add_gt_as_proposals", True):
            proposals = jnp.concatenate([gt_bboxes, proposals], 0)
            p_valid = jnp.concatenate([gt_mask, p_valid], 0)

        assign = max_iou_assign_rotated(
            proposals,
            gt_bboxes,
            gt_mask,
            gt_labels,
            anchor_mask=p_valid,
            **cfg["assigner"],
        )
        sample = random_sample(
            assign,
            key,
            num=scfg["num"],
            pos_fraction=scfg["pos_fraction"],
            neg_pos_ub=scfg.get("neg_pos_ub", -1),
        )
        pos = sample["pos_mask"]
        neg = sample["neg_mask"]
        chosen = pos | neg
        S = scfg["num"]
        # compact chosen rois to the front (positives first for stability)
        priority = jnp.where(pos, 2, jnp.where(neg, 1, 0))
        order = jnp.argsort(-priority, stable=True)[:S]
        sel_valid = chosen[order]
        rois = jnp.where(sel_valid[:, None], proposals[order], 0.0)
        is_pos = pos[order]
        k = gt_bboxes.shape[0]
        safe_gt = jnp.clip(assign["gt_inds"][order] - 1, 0, k - 1)
        matched = gt_bboxes[safe_gt]
        enc = rbox2delta(rois, matched, self.target_means, self.target_stds)
        bbox_targets = jnp.where(is_pos[:, None], enc, 0.0)
        bbox_weights = jnp.where(is_pos[:, None], 1.0, 0.0)
        # labels: positives -> gt label - 1 (0-based fg); negatives -> C (bg)
        lbl = jnp.where(
            is_pos, jnp.clip(assign["labels"][order] - 1, 0, None),
            self.num_classes,
        ).astype(jnp.int32)
        label_weights = jnp.where(sel_valid, 1.0, 0.0)
        return rois, sel_valid, lbl, label_weights, bbox_targets, bbox_weights

    def loss(self, feats, proposals, targets, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        B = proposals["boxes"].shape[0]
        keys = jax.random.split(key, B)
        rois, valid, labels, lw, bt, bw = jax.vmap(
            self._sample_rois
        )(
            proposals["boxes"],
            proposals["valid"],
            targets["gt_bboxes"],
            targets["gt_mask"],
            targets["gt_labels"],
            keys,
        )
        cls_score, bbox_pred = self._forward_rois(feats, rois, valid)
        avg = jnp.maximum((lw > 0).sum(), 1).astype(cls_score.dtype)
        loss_cls = cross_entropy_loss(
            cls_score, labels, weight=lw, avg_factor=avg
        )
        if not self.reg_class_agnostic:
            B_, S = labels.shape
            bbox_pred = bbox_pred.reshape(B_, S, self.num_classes, 5)
            safe_lbl = jnp.clip(labels, 0, self.num_classes - 1)
            bbox_pred = jnp.take_along_axis(
                bbox_pred, safe_lbl[..., None, None], axis=2
            )[..., 0, :]
        loss_bbox = smooth_l1_loss(
            bbox_pred, bt, weight=bw, beta=1.0, avg_factor=avg
        )
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox}

    # ------------------------------------------------------------------
    def predict(self, feats, proposals, targets=None):
        rois = proposals["boxes"]
        valid = proposals["valid"]
        cls_score, bbox_pred = self._forward_rois(feats, rois, valid)
        scores = jax.nn.softmax(cls_score, -1)[..., : self.num_classes]
        scores = scores * valid[..., None]
        if self.reg_class_agnostic:
            boxes = delta2rbox(
                rois, bbox_pred, self.target_means, self.target_stds
            )
        else:
            B, S = rois.shape[:2]
            boxes = delta2rbox(
                rois[..., None, :].repeat(self.num_classes, -2).reshape(B, S, -1),
                bbox_pred,
                self.target_means,
                self.target_stds,
            )
        if targets is not None and "scale_factor" in targets:
            sf = targets["scale_factor"].reshape(-1, 1, 1)
            if boxes.ndim == 3:
                boxes = boxes.at[..., :4].divide(sf)
        cfg = self.test_cfg
        nms_one = partial(
            multiclass_nms_rotated,
            score_thr=cfg["score_thr"],
            nms_iou_thr=cfg["nms_iou_thr"],
            max_per_img=cfg["max_per_img"],
        )
        det = jax.vmap(nms_one)(boxes, scores)
        det["polys"] = rbox_to_poly(det["boxes"])
        return det
