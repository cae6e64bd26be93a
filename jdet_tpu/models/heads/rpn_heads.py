"""RPN heads: classic horizontal RPN and Oriented RPN (midpoint offset).

Capability mirrors of the reference proposal heads
(`python/jdet/models/roi_heads/rpn_head.py`,
`oriented_rpn_head.py:10-492`): a shared 3x3 conv followed by 1x1
objectness and regression convs over horizontal anchors; proposals are
per-level top-k -> decode -> per-level NMS on enclosing hbbs -> top
nms_post (oriented_rpn_head.py:128-229). The oriented variant regresses
the 6-parameter midpoint offsets and emits rotated proposals.

Fixed-shape redesign: every stage uses static budgets + validity masks;
proposal output is (B, nms_post, 5|4) + valid.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .. import nn as jnn

from ..layers import normal_init
from ..boxes.anchor_generator import AnchorGeneratorHBB
from ..boxes.anchor_target import anchor_target_batch
from ..boxes.coder import midpoint_offset_decode, midpoint_offset_encode
from ..losses import binary_cross_entropy_loss, smooth_l1_loss
from ...ops.box_convert import delta2hbox, hbox2delta, rbox_to_hbox
from ...ops.nms import nms
from ...utils.registry import HEADS


DEFAULT_RPN_TRAIN_CFG = dict(
    assigner=dict(
        pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
        match_low_quality=True,
    ),
    sampler=dict(type="random", num=256, pos_fraction=0.5, neg_pos_ub=-1),
    allowed_border=0,
    pos_weight=-1,
)


class _RPNBase(nnx.Module):
    reg_dim = 4
    # reference RPNHead NMSes per level (rpn_head.py:111-145); the gliding
    # variant concatenates all levels first (gliding_rpn_head.py:148-171)
    cross_level_nms = False

    def __init__(
        self,
        in_channels,
        feat_channels=256,
        anchor_scales=(8,),
        anchor_ratios=(0.5, 1.0, 2.0),
        anchor_strides=(4, 8, 16, 32, 64),
        target_means=None,
        target_stds=None,
        nms_pre=2000,
        nms_post=2000,
        nms_thresh=0.8,
        min_bbox_size=0,
        train_cfg=None,
        loss_weight=1.0,
        *,
        rngs: nnx.Rngs,
    ):
        self.anchor_strides = tuple(anchor_strides)
        self.anchor_generator = AnchorGeneratorHBB(
            strides=anchor_strides, ratios=anchor_ratios, scales=anchor_scales
        )
        self.num_anchors = self.anchor_generator.num_base_anchors
        self.target_means = tuple(target_means or (0.0,) * self.reg_dim)
        self.target_stds = tuple(target_stds or (1.0,) * self.reg_dim)
        self.nms_pre = nms_pre
        self.nms_post = nms_post
        self.nms_thresh = nms_thresh
        self.min_bbox_size = min_bbox_size
        self.loss_weight = loss_weight
        self.train_cfg = {**DEFAULT_RPN_TRAIN_CFG, **(train_cfg or {})}

        self.rpn_conv = jnn.Conv(
            in_channels, feat_channels, (3, 3),
            kernel_init=normal_init(0.01), rngs=rngs,
        )
        self.rpn_cls = jnn.Conv(
            feat_channels, self.num_anchors, (1, 1),
            kernel_init=normal_init(0.01), rngs=rngs,
        )
        self.rpn_reg = jnn.Conv(
            feat_channels, self.num_anchors * self.reg_dim, (1, 1),
            kernel_init=normal_init(0.01), rngs=rngs,
        )

    def forward_single(self, x, train=False):
        feat = jax.nn.relu(self.rpn_conv(x))
        return self.rpn_cls(feat), self.rpn_reg(feat)

    def __call__(self, feats, train: bool = False):
        return [self.forward_single(f, train) for f in feats]

    # -- anchors --------------------------------------------------------
    def _level_anchors(self, featmap_sizes):
        return [
            jnp.asarray(self.anchor_generator.grid_anchors(tuple(fs), lvl))
            for lvl, fs in enumerate(featmap_sizes)
        ]

    # -- regression target hooks (overridden by oriented variant) -------
    def _encode(self, anchors, gts):
        return hbox2delta(anchors, gts, self.target_means, self.target_stds)

    def _decode(self, anchors, deltas):
        return delta2hbox(anchors, deltas, self.target_means, self.target_stds)

    def _gt_for_reg(self, targets):
        return targets["gt_hboxes"]

    def _proposal_hbb(self, proposals):
        return proposals

    # -- loss -----------------------------------------------------------
    def loss(self, outs, targets, key=None):
        outs = jax.tree.map(lambda t: t.astype(jnp.float32), outs)
        featmap_sizes = [o[0].shape[1:3] for o in outs]
        B = outs[0][0].shape[0]
        anchors = jnp.concatenate(self._level_anchors(featmap_sizes), 0)
        n = anchors.shape[0]
        cls = jnp.concatenate([o[0].reshape(B, -1) for o in outs], 1)
        reg = jnp.concatenate(
            [o[1].reshape(B, -1, self.reg_dim) for o in outs], 1
        )

        cfg = self.train_cfg
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, B)
        # assignment is on horizontal boxes vs gt hboxes (RPN is
        # class-agnostic); regression targets use the subclass encoding
        tgt, num_pos, num_neg = anchor_target_batch(
            anchors,
            jnp.ones(n, bool),
            targets["gt_hboxes"],
            targets["gt_mask"],
            jnp.where(targets["gt_mask"], 1, 0).astype(jnp.int32),
            keys=keys,
            assigner_cfg=cfg["assigner"],
            sampler_cfg=cfg["sampler"],
            allowed_border=cfg.get("allowed_border", 0),
            pos_weight=cfg.get("pos_weight", -1),
            rotated=False,
            reg_decoded_bbox=True,  # we re-encode below with subclass codec
        )
        num_total = jnp.maximum(num_pos + num_neg, 1).astype(cls.dtype)

        loss_cls = binary_cross_entropy_loss(
            cls,
            (tgt["labels"] > 0),
            weight=tgt["label_weights"],
            avg_factor=num_total,
        )

        # re-encode regression targets against the matched rotated/h gts.
        # one-hot matmul, not a row gather: take_along_axis here is a
        # (B*n)-row gather from a K=32-row table — per-row transaction
        # cost made it 27 ms/step of the Oriented R-CNN B=16 profile;
        # the (B, n, K) @ (B, K, d) contraction is <1 ms on the MXU
        # (same trade as anchor_target.py, HIGHEST to keep f32 coords).
        gt_reg = self._gt_for_reg(targets)  # (B, K, d)
        k = gt_reg.shape[1]
        safe = jnp.clip(tgt["gt_inds"] - 1, 0, k - 1)
        oh = jax.nn.one_hot(safe, k, dtype=gt_reg.dtype)
        matched = jnp.matmul(oh, gt_reg, precision=jax.lax.Precision.HIGHEST)
        enc = self._encode(jnp.broadcast_to(anchors, (B, n, 4)), matched)
        pos = tgt["pos_mask"]
        loss_reg = smooth_l1_loss(
            reg,
            jnp.where(pos[..., None], enc, 0.0),
            weight=pos.astype(cls.dtype),
            beta=1.0 / 9.0,
            avg_factor=num_total,
        )
        return {
            "loss_rpn_cls": loss_cls * self.loss_weight,
            "loss_rpn_bbox": loss_reg * self.loss_weight,
        }

    # -- proposals ------------------------------------------------------
    def get_proposals(self, outs):
        """Fixed-shape proposals: (B, nms_post, reg_decode_dim) + valid +
        scores (oriented_rpn_head.py:128-229)."""
        outs = jax.tree.map(lambda t: t.astype(jnp.float32), outs)
        featmap_sizes = [o[0].shape[1:3] for o in outs]
        anchors_per_level = self._level_anchors(featmap_sizes)
        B = outs[0][0].shape[0]

        cand_boxes, cand_scores = [], []
        for lvl, (cls, reg) in enumerate(outs):
            scores = jax.nn.sigmoid(cls.reshape(B, -1))
            deltas = reg.reshape(B, -1, self.reg_dim)
            anchors = anchors_per_level[lvl]
            n_lvl = anchors.shape[0]
            if self.nms_pre > 0 and n_lvl > self.nms_pre:
                scores, topk = jax.lax.top_k(scores, self.nms_pre)
                deltas = jnp.take_along_axis(deltas, topk[..., None], 1)
                anchors_b = anchors[topk]
            else:
                anchors_b = jnp.broadcast_to(anchors, (B, n_lvl, 4))
            boxes = self._decode(anchors_b, deltas)
            cand_boxes.append(boxes)
            cand_scores.append(scores)
        boxes = jnp.concatenate(cand_boxes, 1)
        scores = jnp.concatenate(cand_scores, 1)

        level_sizes = [s.shape[1] for s in cand_scores]

        def _one(boxes, scores):
            hbb = self._proposal_hbb(boxes)
            if self.min_bbox_size >= 0:
                if boxes.shape[-1] == 5:
                    w, h = boxes[:, 2], boxes[:, 3]
                else:
                    w = hbb[:, 2] - hbb[:, 0]
                    h = hbb[:, 3] - hbb[:, 1]
                size_ok = (w > self.min_bbox_size) & (h > self.min_bbox_size)
            else:
                size_ok = jnp.ones(boxes.shape[0], bool)
            if self.cross_level_nms:
                _, keep_o = nms(hbb, scores, self.nms_thresh, valid=size_ok)
                order = jnp.argsort(-jnp.where(size_ok, scores, -jnp.inf))
                keep = keep_o
            else:
                # NMS within levels independently (reference per-level
                # loop, rpn_head.py). Levels can never suppress each
                # other, so the n_total^2 IoU matrix of the offset-trick
                # formulation decomposes EXACTLY into one <=nms_pre^2
                # matrix per level — at the 1024^2/5-level config this
                # replaces an 8768^2 pairwise block (2.5 GB of f32
                # intermediates per 4-image batch, the single largest
                # allocation of the Oriented R-CNN train step) with five
                # <=2000^2 ones.
                keep_parts = []
                off = 0
                for nl in level_sizes:
                    sl = slice(off, off + nl)
                    o_l, k_l = nms(hbb[sl], scores[sl], self.nms_thresh,
                                   valid=size_ok[sl])
                    # map keep flags back to pre-sort positions
                    keep_parts.append(
                        jnp.zeros((nl,), bool).at[o_l].set(k_l))
                    off += nl
                keep_pre = jnp.concatenate(keep_parts)
                s = jnp.where(size_ok, scores, -jnp.inf)
                order = jnp.argsort(-s)
                keep = keep_pre[order]
            sel = jnp.argsort(~keep, stable=True)[: self.nms_post]
            idx = order[sel]
            v = keep[sel]
            return (
                jnp.where(v[:, None], boxes[idx], 0.0),
                jnp.where(v, scores[idx], 0.0),
                v,
            )

        p_boxes, p_scores, p_valid = jax.vmap(_one)(boxes, scores)
        return {"boxes": p_boxes, "scores": p_scores, "valid": p_valid}


@HEADS.register_module()
class RPNHead(_RPNBase):
    """Classic hbb RPN (reference rpn_head.py)."""


@HEADS.register_module()
class GlidingRPNHead(_RPNBase):
    """Gliding Vertex RPN (reference gliding_rpn_head.py): hbb deltas via
    the GV coder (identical codec math, coder.py:234-320) but a single
    NMS over the concatenation of all pyramid levels, capped at nms_post,
    with a higher default nms_thresh (0.7)."""

    cross_level_nms = True

    def __init__(self, *args, nms_thresh=0.7, **kw):
        super().__init__(*args, nms_thresh=nms_thresh, **kw)


@HEADS.register_module()
class OrientedRPNHead(_RPNBase):
    """Oriented RPN: 6-param midpoint-offset regression emitting rotated
    proposals (oriented_rpn_head.py:10-492)."""

    reg_dim = 6

    def __init__(self, *args, target_means=None, target_stds=None, **kw):
        super().__init__(
            *args,
            target_means=target_means or (0.0,) * 6,
            target_stds=target_stds or (1.0,) * 6,
            **kw,
        )

    def _encode(self, anchors, gt_rboxes):
        return midpoint_offset_encode(
            anchors, gt_rboxes, self.target_means, self.target_stds
        )

    def _decode(self, anchors, deltas):
        return midpoint_offset_decode(
            anchors, deltas, self.target_means, self.target_stds
        )

    def _gt_for_reg(self, targets):
        return targets["gt_bboxes"]  # rotated gts

    def _proposal_hbb(self, proposals):
        return rbox_to_hbox(proposals)
