"""Shared machinery for two-stage RoI bbox heads.

Factors the fixed-shape assign/sample/extract/2FC pattern used by the
reference head family (OrientedHead oriented_head.py:14-530, FasterrcnnHead
fasterrcnn_head.py, BBoxHeadRbbox/ConvFCBBoxHeadRbbox rbbox_head.py /
convfc_rbbox_head.py, GlidingHead gliding_head.py) into one base: concrete
heads choose the proposal space (hbb/obb), the target codec, and extra
branches.

Label convention in this family: 0-based foreground, background =
num_classes (softmax C+1, bg last — mmdet-v2 layout the reference heads
use).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import nnx

from .. import nn as jnn

from ..layers import normal_init
from ..boxes.assigner import max_iou_assign_rotated, max_iou_assign_hbb
from ..boxes.sampler import random_sample
from ..roi_extractors.single_level import (
    OrientedSingleRoIExtractor,
    SingleRoIExtractor,
)
from ...ops.box_convert import rbox_to_poly
from ...ops.nms_rotated import multiclass_nms_rotated

DEFAULT_ROI_TRAIN_CFG = dict(
    assigner=dict(
        pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
        match_low_quality=False,
    ),
    sampler=dict(num=512, pos_fraction=0.25, neg_pos_ub=-1,
                 add_gt_as_proposals=True),
    pos_weight=-1,
)

DEFAULT_ROI_TEST_CFG = dict(score_thr=0.05, nms_iou_thr=0.1, max_per_img=2000)


class RoIHeadBase(nnx.Module):
    """start_bbox_type: 'hbb' or 'obb' — the space proposals live in."""

    start_bbox_type = "obb"

    def _init_common(
        self,
        num_classes,
        in_channels,
        fc_out_channels,
        num_shared_fcs,
        roi_size,
        featmap_strides,
        train_cfg,
        test_cfg,
        extend_factor=(1.0, 1.0),
        *,
        rngs,
    ):
        self.num_classes = num_classes
        self.train_cfg = {**DEFAULT_ROI_TRAIN_CFG, **(train_cfg or {})}
        self.test_cfg = {**DEFAULT_ROI_TEST_CFG, **(test_cfg or {})}
        if self.start_bbox_type == "obb":
            self.roi_extractor = OrientedSingleRoIExtractor(
                out_size=roi_size, featmap_strides=featmap_strides,
                extend_factor=extend_factor,
            )
        else:
            self.roi_extractor = SingleRoIExtractor(
                out_size=roi_size, featmap_strides=featmap_strides
            )
        in_dim = in_channels * roi_size * roi_size
        self.shared_fcs = nnx.List(
            [
                jnn.Linear(
                    in_dim if i == 0 else fc_out_channels,
                    fc_out_channels,
                    kernel_init=nnx.initializers.xavier_uniform(),
                    rngs=rngs,
                )
                for i in range(num_shared_fcs)
            ]
        )
        self.fc_out_channels = fc_out_channels

    # hooks ------------------------------------------------------------
    def _encode(self, rois, gts):
        raise NotImplementedError

    def _gt_boxes_for_assign(self, targets):
        return (
            targets["gt_bboxes"]
            if self.start_bbox_type == "obb"
            else targets["gt_hboxes"]
        )

    def _shared_forward(self, feats, rois, valid):
        x = self.roi_extractor(feats, rois, valid)
        B, S = x.shape[:2]
        x = x.reshape(B, S, -1)
        for fc in self.shared_fcs:
            x = jax.nn.relu(fc(x))
        return x.astype(jnp.float32)

    # sampling -----------------------------------------------------------
    def _sample_rois(self, proposals, p_valid, gt_assign, gt_reg, gt_mask,
                     gt_labels, key):
        """One image: assign + random-sample to the fixed budget.

        gt_assign: gts in the proposal space (for IoU); gt_reg: gts in the
        regression-target space (obb for obb-target heads).
        """
        cfg = self.train_cfg
        scfg = cfg["sampler"]
        if scfg.get("add_gt_as_proposals", True):
            proposals = jnp.concatenate([gt_assign, proposals], 0)
            p_valid = jnp.concatenate([gt_mask, p_valid], 0)

        if self.start_bbox_type == "obb":
            assign = max_iou_assign_rotated(
                proposals, gt_assign, gt_mask, gt_labels,
                anchor_mask=p_valid, **cfg["assigner"],
            )
        else:
            assign = max_iou_assign_hbb(
                proposals, gt_assign, gt_mask, gt_labels,
                anchor_mask=p_valid, **cfg["assigner"],
            )
        sample = random_sample(
            assign, key,
            num=scfg["num"],
            pos_fraction=scfg["pos_fraction"],
            neg_pos_ub=scfg.get("neg_pos_ub", -1),
        )
        pos = sample["pos_mask"]
        neg = sample["neg_mask"]
        chosen = pos | neg
        S = scfg["num"]
        priority = jnp.where(pos, 2, jnp.where(neg, 1, 0))
        order = jnp.argsort(-priority, stable=True)[:S]
        sel_valid = chosen[order]
        rois = jnp.where(sel_valid[:, None], proposals[order], 0.0)
        is_pos = pos[order]
        k = gt_reg.shape[0]
        safe_gt = jnp.clip(assign["gt_inds"][order] - 1, 0, k - 1)
        matched = gt_reg[safe_gt]
        enc = self._encode(rois, matched)
        bbox_targets = jnp.where(is_pos[:, None], enc, 0.0)
        bbox_weights = jnp.where(is_pos[:, None], 1.0, 0.0)
        lbl = jnp.where(
            is_pos, jnp.clip(assign["labels"][order] - 1, 0, None),
            self.num_classes,
        ).astype(jnp.int32)
        label_weights = jnp.where(sel_valid, 1.0, 0.0)
        return {
            "rois": rois,
            "valid": sel_valid,
            "pos": is_pos,
            "labels": lbl,
            "label_weights": label_weights,
            "bbox_targets": bbox_targets,
            "bbox_weights": bbox_weights,
            "matched_gt": jnp.where(is_pos[:, None], matched, 0.0),
        }

    def sample_batch(self, proposals, targets, key):
        B = proposals["boxes"].shape[0]
        keys = jax.random.split(key, B)
        gt_assign = self._gt_boxes_for_assign(targets)
        return jax.vmap(self._sample_rois)(
            proposals["boxes"],
            proposals["valid"],
            gt_assign,
            targets["gt_bboxes"],
            targets["gt_mask"],
            targets["gt_labels"],
            keys,
        )

    # nms -----------------------------------------------------------------
    def _final_nms(self, boxes, scores, targets):
        if targets is not None and "scale_factor" in targets:
            sf = targets["scale_factor"].reshape(-1, 1, 1)
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
