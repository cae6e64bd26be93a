"""Concrete two-stage RoI heads: FasterRCNN-OBB, Gliding Vertex, and the
RoI-Transformer cascade heads.

Capability mirrors:
  - FasterrcnnHead (`python/jdet/models/roi_heads/fasterrcnn_head.py`):
    hbb proposals -> 2FC -> C+1 softmax + 5-param obb deltas regressed
    against the proposal treated as a zero-angle rbox.
  - GlidingHead (`roi_heads/gliding_head.py:10-456`): hbb proposals ->
    cls + 4-param hbb deltas + 4 edge-glide offsets + area ratio; decode
    glides the hbb edges into a quad, falling back to the hbb when the
    ratio is near 1 (gliding_head.py ratio_thr).
  - RoITransHead / RotatedBBoxHead
    (`roi_heads/convfc_rbbox_head.py`, `rbbox_head.py`,
    `networks/roi_transformer.py:34-198`): stage-1 predicts an obb from
    hbb-RoIAligned features; `refine_rbboxes` turns per-roi predictions
    into refined rotated proposals for the stage-2 rotated head.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import nnx

from .. import nn as jnn

from .roi_head_base import RoIHeadBase
from ..layers import normal_init
from ..losses import cross_entropy_loss, smooth_l1_loss
from ..boxes.coder import gv_fix_encode, gv_fix_decode, gv_ratio_encode
from ...ops.box_convert import (
    delta2hbox,
    delta2rbox,
    hbox2delta,
    hbox_to_rbox,
    poly_to_rbox,
    rbox2delta,
    rbox_to_poly,
)
from ...utils.registry import HEADS


@HEADS.register_module()
class FasterrcnnHead(RoIHeadBase):
    """hbb proposals -> obb outputs (fasterrcnn_head.py)."""

    start_bbox_type = "hbb"

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
        train_cfg=None,
        test_cfg=None,
        *,
        rngs: nnx.Rngs,
    ):
        self.target_means = tuple(target_means)
        self.target_stds = tuple(target_stds)
        self._init_common(
            num_classes, in_channels, fc_out_channels, num_shared_fcs,
            roi_size, featmap_strides, train_cfg, test_cfg, rngs=rngs,
        )
        self.fc_cls = jnn.Linear(
            fc_out_channels, num_classes + 1,
            kernel_init=normal_init(0.01), rngs=rngs,
        )
        self.fc_reg = jnn.Linear(
            fc_out_channels, 5, kernel_init=normal_init(0.001), rngs=rngs
        )

    def _encode(self, rois, gts):
        return rbox2delta(
            hbox_to_rbox(rois), gts, self.target_means, self.target_stds
        )

    def loss(self, feats, proposals, targets, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        s = self.sample_batch(proposals, targets, key)
        x = self._shared_forward(feats, s["rois"], s["valid"])
        cls_score = self.fc_cls(x)
        bbox_pred = self.fc_reg(x)
        avg = jnp.maximum((s["label_weights"] > 0).sum(), 1).astype(x.dtype)
        return {
            "loss_cls": cross_entropy_loss(
                cls_score, s["labels"], weight=s["label_weights"], avg_factor=avg
            ),
            "loss_bbox": smooth_l1_loss(
                bbox_pred, s["bbox_targets"], weight=s["bbox_weights"],
                beta=1.0, avg_factor=avg,
            ),
        }

    def predict(self, feats, proposals, targets=None):
        rois = proposals["boxes"]
        valid = proposals["valid"]
        x = self._shared_forward(feats, rois, valid)
        scores = jax.nn.softmax(self.fc_cls(x), -1)[..., : self.num_classes]
        scores = scores * valid[..., None]
        boxes = delta2rbox(
            hbox_to_rbox(rois), self.fc_reg(x),
            self.target_means, self.target_stds,
        )
        return self._final_nms(boxes, scores, targets)


@HEADS.register_module()
class GlidingHead(RoIHeadBase):
    """Gliding vertex head (gliding_head.py:10-456)."""

    start_bbox_type = "hbb"

    def __init__(
        self,
        num_classes=15,
        in_channels=256,
        fc_out_channels=1024,
        num_shared_fcs=2,
        roi_size=7,
        featmap_strides=(4, 8, 16, 32),
        target_means=(0.0,) * 4,
        target_stds=(0.1, 0.1, 0.2, 0.2),
        ratio_thr=0.8,
        train_cfg=None,
        test_cfg=None,
        *,
        rngs: nnx.Rngs,
    ):
        self.target_means = tuple(target_means)
        self.target_stds = tuple(target_stds)
        self.ratio_thr = ratio_thr
        self._init_common(
            num_classes, in_channels, fc_out_channels, num_shared_fcs,
            roi_size, featmap_strides, train_cfg, test_cfg, rngs=rngs,
        )
        self.fc_cls = jnn.Linear(
            fc_out_channels, num_classes + 1,
            kernel_init=normal_init(0.01), rngs=rngs,
        )
        self.fc_reg = jnn.Linear(
            fc_out_channels, 4, kernel_init=normal_init(0.001), rngs=rngs
        )
        self.fc_fix = jnn.Linear(
            fc_out_channels, 4, kernel_init=normal_init(0.001), rngs=rngs
        )
        self.fc_ratio = jnn.Linear(
            fc_out_channels, 1, kernel_init=normal_init(0.001), rngs=rngs
        )

    def _encode(self, rois, gts):
        # hbb deltas vs the gt's enclosing hbb
        from ...ops.box_convert import rbox_to_hbox

        return hbox2delta(
            rois, rbox_to_hbox(gts), self.target_means, self.target_stds
        )

    def loss(self, feats, proposals, targets, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        s = self.sample_batch(proposals, targets, key)
        x = self._shared_forward(feats, s["rois"], s["valid"])
        cls_score = self.fc_cls(x)
        bbox_pred = self.fc_reg(x)
        fix_pred = jax.nn.sigmoid(self.fc_fix(x))
        ratio_pred = jax.nn.sigmoid(self.fc_ratio(x))

        from ...ops.box_convert import rbox_to_hbox

        gt_poly = rbox_to_poly(s["matched_gt"])
        gt_hbb = rbox_to_hbox(s["matched_gt"])
        fix_tgt = gv_fix_encode(gt_hbb, gt_poly)
        ratio_tgt = gv_ratio_encode(gt_hbb, gt_poly)

        avg = jnp.maximum((s["label_weights"] > 0).sum(), 1).astype(x.dtype)
        pw = s["bbox_weights"][..., :1]
        return {
            "loss_cls": cross_entropy_loss(
                cls_score, s["labels"], weight=s["label_weights"], avg_factor=avg
            ),
            "loss_bbox": smooth_l1_loss(
                bbox_pred, s["bbox_targets"], weight=s["bbox_weights"],
                beta=1.0, avg_factor=avg,
            ),
            "loss_fix": smooth_l1_loss(
                fix_pred, jnp.where(pw > 0, fix_tgt, 0.0), weight=pw,
                beta=1.0 / 3.0, avg_factor=avg,
            ),
            "loss_ratio": smooth_l1_loss(
                ratio_pred, jnp.where(pw > 0, ratio_tgt, 0.0), weight=pw,
                beta=1.0 / 3.0, avg_factor=avg,
            ),
        }

    def predict(self, feats, proposals, targets=None):
        rois = proposals["boxes"]
        valid = proposals["valid"]
        x = self._shared_forward(feats, rois, valid)
        scores = jax.nn.softmax(self.fc_cls(x), -1)[..., : self.num_classes]
        scores = scores * valid[..., None]
        hbb = delta2hbox(
            rois, self.fc_reg(x), self.target_means, self.target_stds
        )
        fix = jax.nn.sigmoid(self.fc_fix(x))
        ratio = jax.nn.sigmoid(self.fc_ratio(x))[..., 0]
        polys = gv_fix_decode(hbb, fix)
        # near-horizontal objects (ratio ~ 1) keep the hbb
        x1, y1, x2, y2 = (hbb[..., i] for i in range(4))
        hpoly = jnp.stack([x1, y1, x2, y1, x2, y2, x1, y2], -1)
        polys = jnp.where(
            (ratio > self.ratio_thr)[..., None], hpoly, polys
        )
        boxes = poly_to_rbox(polys)
        return self._final_nms(boxes, scores, targets)


@HEADS.register_module()
class RoITransHead(RoIHeadBase):
    """RoI-Transformer cascade (networks/roi_transformer.py:34-198):
    stage-1 hbb rois -> obb predictions; refine; stage-2 rotated rois ->
    final obbs. Both stages built from the shared base."""

    start_bbox_type = "hbb"

    def __init__(
        self,
        num_classes=15,
        in_channels=256,
        fc_out_channels=1024,
        roi_size=7,
        featmap_strides=(4, 8, 16, 32),
        stage1_target_stds=(0.1, 0.1, 0.2, 0.2, 0.1),
        stage2_target_stds=(0.05, 0.05, 0.1, 0.1, 0.05),
        extend_factor=(1.2, 1.4),
        train_cfg=None,
        test_cfg=None,
        *,
        rngs: nnx.Rngs,
    ):
        self.target_means = (0.0,) * 5
        self.target_stds = tuple(stage1_target_stds)
        self.stage2_target_stds = tuple(stage2_target_stds)
        self._init_common(
            num_classes, in_channels, fc_out_channels, 2,
            roi_size, featmap_strides, train_cfg, test_cfg, rngs=rngs,
        )
        self.fc_cls = jnn.Linear(
            fc_out_channels, num_classes + 1,
            kernel_init=normal_init(0.01), rngs=rngs,
        )
        self.fc_reg = jnn.Linear(
            fc_out_channels, 5, kernel_init=normal_init(0.001), rngs=rngs
        )
        # stage 2: rotated RoI head
        from ..roi_extractors.single_level import OrientedSingleRoIExtractor

        self.roi_extractor2 = OrientedSingleRoIExtractor(
            out_size=roi_size, featmap_strides=featmap_strides,
            extend_factor=extend_factor,
        )
        in_dim = in_channels * roi_size * roi_size
        self.shared_fcs2 = nnx.List(
            [
                jnn.Linear(
                    in_dim if i == 0 else fc_out_channels,
                    fc_out_channels,
                    kernel_init=nnx.initializers.xavier_uniform(),
                    rngs=rngs,
                )
                for i in range(2)
            ]
        )
        self.fc_cls2 = jnn.Linear(
            fc_out_channels, num_classes + 1,
            kernel_init=normal_init(0.01), rngs=rngs,
        )
        self.fc_reg2 = jnn.Linear(
            fc_out_channels, 5, kernel_init=normal_init(0.001), rngs=rngs
        )

    def _encode(self, rois, gts):
        return rbox2delta(
            hbox_to_rbox(rois), gts, self.target_means, self.target_stds
        )

    def _stage2_forward(self, feats, rois, valid):
        x = self.roi_extractor2(feats, rois, valid)
        B, S = x.shape[:2]
        x = x.reshape(B, S, -1)
        for fc in self.shared_fcs2:
            x = jax.nn.relu(fc(x))
        return (self.fc_cls2(x).astype(jnp.float32),
                self.fc_reg2(x).astype(jnp.float32))

    def _sample_rotated(self, proposals, p_valid, gt_bboxes, gt_mask,
                        gt_labels, key):
        """Stage-2 rotated assignment/sampling (reuses base machinery by
        temporarily operating in obb space)."""
        from ..boxes.assigner import max_iou_assign_rotated
        from ..boxes.sampler import random_sample

        cfg = self.train_cfg
        scfg = cfg["sampler"]
        proposals = jnp.concatenate([gt_bboxes, proposals], 0)
        p_valid = jnp.concatenate([gt_mask, p_valid], 0)
        assign = max_iou_assign_rotated(
            proposals, gt_bboxes, gt_mask, gt_labels,
            anchor_mask=p_valid, **cfg["assigner"],
        )
        sample = random_sample(
            assign, key, num=scfg["num"],
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
        k = gt_bboxes.shape[0]
        safe_gt = jnp.clip(assign["gt_inds"][order] - 1, 0, k - 1)
        matched = gt_bboxes[safe_gt]
        enc = rbox2delta(rois, matched, self.target_means, self.stage2_target_stds)
        return {
            "rois": rois,
            "valid": sel_valid,
            "pos": is_pos,
            "labels": jnp.where(
                is_pos, jnp.clip(assign["labels"][order] - 1, 0, None),
                self.num_classes,
            ).astype(jnp.int32),
            "label_weights": jnp.where(sel_valid, 1.0, 0.0),
            "bbox_targets": jnp.where(is_pos[:, None], enc, 0.0),
            "bbox_weights": jnp.where(is_pos[:, None], 1.0, 0.0),
        }

    def loss(self, feats, proposals, targets, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        # stage 1 (hbb rois -> obb)
        s1 = self.sample_batch(proposals, targets, k1)
        x = self._shared_forward(feats, s1["rois"], s1["valid"])
        cls1 = self.fc_cls(x)
        reg1 = self.fc_reg(x)
        avg1 = jnp.maximum((s1["label_weights"] > 0).sum(), 1).astype(x.dtype)
        losses = {
            "loss_cls_s1": cross_entropy_loss(
                cls1, s1["labels"], weight=s1["label_weights"], avg_factor=avg1
            ),
            "loss_bbox_s1": smooth_l1_loss(
                reg1, s1["bbox_targets"], weight=s1["bbox_weights"],
                beta=1.0, avg_factor=avg1,
            ),
        }
        # refine: decode stage-1 predictions into rotated proposals
        # (networks/roi_transformer.py:103-106, under stop_gradient)
        refined = delta2rbox(
            hbox_to_rbox(s1["rois"]), jax.lax.stop_gradient(reg1),
            self.target_means, self.target_stds,
        )
        B = refined.shape[0]
        keys2 = jax.random.split(k2, B)
        s2 = jax.vmap(self._sample_rotated)(
            refined, s1["valid"],
            targets["gt_bboxes"], targets["gt_mask"], targets["gt_labels"],
            keys2,
        )
        cls2, reg2 = self._stage2_forward(feats, s2["rois"], s2["valid"])
        avg2 = jnp.maximum((s2["label_weights"] > 0).sum(), 1).astype(x.dtype)
        losses.update(
            {
                "loss_cls_s2": cross_entropy_loss(
                    cls2, s2["labels"], weight=s2["label_weights"],
                    avg_factor=avg2,
                ),
                "loss_bbox_s2": smooth_l1_loss(
                    reg2, s2["bbox_targets"], weight=s2["bbox_weights"],
                    beta=1.0, avg_factor=avg2,
                ),
            }
        )
        return losses

    def predict(self, feats, proposals, targets=None):
        rois = proposals["boxes"]
        valid = proposals["valid"]
        x = self._shared_forward(feats, rois, valid)
        reg1 = self.fc_reg(x)
        refined = delta2rbox(
            hbox_to_rbox(rois), reg1, self.target_means, self.target_stds
        )
        cls2, reg2 = self._stage2_forward(feats, refined, valid)
        scores = jax.nn.softmax(cls2, -1)[..., : self.num_classes]
        scores = scores * valid[..., None]
        boxes = delta2rbox(
            refined, reg2, self.target_means, self.stage2_target_stds
        )
        return self._final_nms(boxes, scores, targets)


from .oriented_head import OrientedHead


@HEADS.register_module()
class StripHead(OrientedHead):
    """Strip R-CNN stage-2 head (reference roi_heads/strip_head.py): the
    Oriented head enhanced with depth-wise strip convolutions (1xK + Kx1)
    over the RoI feature map before the FC towers."""

    def __init__(self, *a, strip_k=7, in_channels=256, rngs, **kw):
        super().__init__(*a, in_channels=in_channels, rngs=rngs, **kw)
        pad = strip_k // 2
        self.strip_h = jnn.Conv(
            in_channels, in_channels, (1, strip_k),
            padding=[(0, 0), (pad, pad)], feature_group_count=in_channels,
            rngs=rngs,
        )
        self.strip_v = jnn.Conv(
            in_channels, in_channels, (strip_k, 1),
            padding=[(pad, pad), (0, 0)], feature_group_count=in_channels,
            rngs=rngs,
        )

    def _forward_rois(self, feats, rois, valid):
        x = self.roi_extractor(feats, rois, valid)  # (B, S, P, P, C)
        B, S, P, _, C = x.shape
        xs = x.reshape(B * S, P, P, C)
        xs = xs + self.strip_v(self.strip_h(xs))
        x = xs.reshape(B, S, -1)
        for fc in self.shared_fcs:
            x = jax.nn.relu(fc(x))
        return (self.fc_cls(x).astype(jnp.float32),
                self.fc_reg(x).astype(jnp.float32))


class _RiRoIExtractor:
    """Stage-2 extractor wrapper using riroi_align with level routing."""

    def __init__(self, out_size=7, featmap_strides=(4, 8, 16, 32),
                 finest_scale=56):
        self.out_size = out_size
        self.featmap_strides = tuple(featmap_strides)
        self.finest_scale = finest_scale

    def __call__(self, feats, rois, valid=None):
        from ...ops.riroi_align import riroi_align_multilevel
        from ..roi_extractors.single_level import _map_levels

        num_levels = len(self.featmap_strides)
        scale = jnp.sqrt(jnp.maximum(rois[..., 2] * rois[..., 3], 1e-6))
        lvl = _map_levels(scale, num_levels, self.finest_scale)
        return riroi_align_multilevel(
            feats[:num_levels], rois, lvl, self.featmap_strides,
            self.out_size, 2, valid=valid,
        )


@HEADS.register_module()
class ReDetHead(RoITransHead):
    """ReDet cascade head (networks/redet.py:64-227): identical cascade to
    RoI-Transformer but the rotated stage samples rotation-invariant
    features via RiRoIAlign (ops/riroi_align.py)."""

    def __init__(self, *a, roi_size=7, featmap_strides=(4, 8, 16, 32), **kw):
        super().__init__(*a, roi_size=roi_size,
                         featmap_strides=featmap_strides, **kw)
        self.roi_extractor2 = _RiRoIExtractor(
            out_size=roi_size, featmap_strides=featmap_strides
        )

    def _stage2_forward(self, feats, rois, valid):
        x = self.roi_extractor2(feats, rois, valid)
        B, S = x.shape[:2]
        x = x.reshape(B, S, -1)
        for fc in self.shared_fcs2:
            x = jax.nn.relu(fc(x))
        return (self.fc_cls2(x).astype(jnp.float32),
                self.fc_reg2(x).astype(jnp.float32))
