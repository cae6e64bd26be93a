"""S2ANet head: Feature Alignment Module + Oriented Detection Module.

Capability mirror of the reference S2ANetHead
(`python/jdet/models/roi_heads/s2anet_head.py:21-723`):
  - FAM: conv towers -> fam_cls / fam_reg over one square anchor per
    location (AnchorGeneratorRotatedS2ANet); FAM deltas (detached) decode
    init anchors into refined anchors (s2anet_head.py:222-234, 630-654).
  - AlignConv: a deformable conv whose offsets are derived analytically
    from the refined anchors — each 3x3 tap moves to the matching point of
    the rotated anchor (s2anet_head.py:657-723); here the offset field is
    computed fully vectorized over (B, H, W, 9) with stop_gradient.
  - ODM: ORConv2d (1->8 orientations) + rotation-invariant max-pool for
    the cls branch (s2anet_head.py:154-160, 236-250), then towers ->
    odm_cls / odm_reg.
  - Losses: anchor targets twice — FAM on init anchors, ODM on refined
    anchors (s2anet_head.py:322-428) — both focal + smooth-L1 averaged by
    their own positive counts.
  - Detection decodes ODM predictions from refined anchors
    (s2anet_head.py:510-601).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .. import nn as jnn

from ..layers import ConvModule, bias_init_with_prob, normal_init
from ..boxes.anchor_generator import AnchorGeneratorRotatedS2ANet
from ..boxes.anchor_target import anchor_target_batch
from ..losses import sigmoid_focal_loss, smooth_l1_loss
from ...ops.box_convert import delta2rbox, rbox_to_poly
from ...ops.deform_conv import DeformConv
from ...ops.orn import ORConv2d, rotation_invariant_pooling
from ...ops.nms_rotated import multiclass_nms_rotated
from ...utils.registry import HEADS


DEFAULT_TRAIN_CFG = dict(
    fam_cfg=dict(
        assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0),
        allowed_border=-1,
        pos_weight=-1,
    ),
    odm_cfg=dict(
        assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0),
        allowed_border=-1,
        pos_weight=-1,
    ),
)

DEFAULT_TEST_CFG = dict(
    nms_pre=2000, score_thr=0.05, nms_iou_thr=0.1, max_per_img=2000
)


class AlignConv(nnx.Module):
    """Anchor-guided deformable alignment (s2anet_head.py:657-723)."""

    def __init__(self, in_channels, out_channels, kernel_size=3, *, rngs):
        self.kernel_size = kernel_size
        self.deform_conv = DeformConv(
            in_channels,
            out_channels,
            kernel_size,
            padding=(kernel_size - 1) // 2,
            rngs=rngs,
        )

    def get_offset(self, anchors, stride):
        """anchors (B, H, W, 5) -> offsets (B, H, W, k*k, 2) (dy, dx)."""
        k = self.kernel_size
        pad = (k - 1) // 2
        idx = jnp.arange(-pad, pad + 1, dtype=anchors.dtype)
        yy, xx = jnp.meshgrid(idx, idx, indexing="ij")
        xx = xx.reshape(-1)  # (k*k,)
        yy = yy.reshape(-1)

        B, H, W, _ = anchors.shape
        xc = jnp.arange(W, dtype=anchors.dtype)
        yc = jnp.arange(H, dtype=anchors.dtype)
        x_conv = xc[None, :, None] + xx[None, None, :]  # (1, W, kk)
        y_conv = yc[:, None, None] + yy[None, None, :]  # (H, 1, kk)

        ax = anchors[..., 0] / stride
        ay = anchors[..., 1] / stride
        aw = anchors[..., 2] / stride
        ah = anchors[..., 3] / stride
        aa = anchors[..., 4]
        cos = jnp.cos(aa)[..., None]
        sin = jnp.sin(aa)[..., None]
        dw = (aw / k)[..., None]
        dh = (ah / k)[..., None]
        x = dw * xx
        y = dh * yy
        xr = cos * x - sin * y
        yr = sin * x + cos * y
        x_anchor = xr + ax[..., None]
        y_anchor = yr + ay[..., None]
        off_y = y_anchor - y_conv[None]
        off_x = x_anchor - x_conv[None]
        return jax.lax.stop_gradient(jnp.stack([off_y, off_x], -1))

    def __call__(self, x, anchors, stride):
        offsets = self.get_offset(anchors, stride)
        return jax.nn.relu(self.deform_conv(x, offsets))


@HEADS.register_module()
class S2ANetHead(nnx.Module):
    def __init__(
        self,
        num_classes,
        in_channels,
        feat_channels=256,
        stacked_convs=2,
        with_orconv=True,
        anchor_ratios=(1.0,),
        anchor_strides=(8, 16, 32, 64, 128),
        anchor_scales=(4,),
        anchor_base_sizes=None,
        target_means=(0.0,) * 5,
        target_stds=(1.0,) * 5,
        loss_fam_cls=dict(gamma=2.0, alpha=0.25, loss_weight=1.0),
        loss_fam_bbox=dict(beta=1.0 / 9.0, loss_weight=1.0),
        loss_odm_cls=dict(gamma=2.0, alpha=0.25, loss_weight=1.0),
        loss_odm_bbox=dict(beta=1.0 / 9.0, loss_weight=1.0),
        train_cfg=None,
        test_cfg=None,
        *,
        rngs: nnx.Rngs,
    ):
        self.num_classes = num_classes
        self.cls_out_channels = num_classes - 1
        self.in_channels = in_channels
        self.feat_channels = feat_channels
        self.stacked_convs = stacked_convs
        self.with_orconv = with_orconv
        self.anchor_strides = tuple(anchor_strides)
        self.target_means = tuple(target_means)
        self.target_stds = tuple(target_stds)
        self.loss_cfgs = dict(
            fam_cls=dict(loss_fam_cls),
            fam_bbox=dict(loss_fam_bbox),
            odm_cls=dict(loss_odm_cls),
            odm_bbox=dict(loss_odm_bbox),
        )
        self.train_cfg = {**DEFAULT_TRAIN_CFG, **(train_cfg or {})}
        self.test_cfg = {**DEFAULT_TEST_CFG, **(test_cfg or {})}

        base_sizes = (
            list(anchor_strides) if anchor_base_sizes is None else anchor_base_sizes
        )
        self.anchor_generators = [
            AnchorGeneratorRotatedS2ANet(bs, anchor_scales, anchor_ratios)
            for bs in base_sizes
        ]

        def towers(n, first_ch):
            return nnx.List(
                [
                    ConvModule(
                        first_ch if i == 0 else feat_channels,
                        feat_channels,
                        3,
                        kernel_init=normal_init(0.01),
                        rngs=rngs,
                    )
                    for i in range(n)
                ]
            )

        self.fam_reg_convs = towers(stacked_convs, in_channels)
        self.fam_cls_convs = towers(stacked_convs, in_channels)
        self.fam_reg = jnn.Conv(
            feat_channels, 5, (1, 1), kernel_init=normal_init(0.01), rngs=rngs
        )
        self.fam_cls = jnn.Conv(
            feat_channels,
            self.cls_out_channels,
            (1, 1),
            kernel_init=normal_init(0.01),
            bias_init=nnx.initializers.constant(bias_init_with_prob(0.01)),
            rngs=rngs,
        )

        self.align_conv = AlignConv(feat_channels, feat_channels, 3, rngs=rngs)

        if with_orconv:
            self.or_conv = ORConv2d(
                feat_channels,
                feat_channels // 8,
                kernel_size=3,
                padding=1,
                arf_config=(1, 8),
                rngs=rngs,
            )
            odm_cls_first = feat_channels // 8
        else:
            self.or_conv = jnn.Conv(
                feat_channels, feat_channels, (3, 3),
                kernel_init=normal_init(0.01), rngs=rngs,
            )
            odm_cls_first = feat_channels
        self.odm_reg_convs = towers(stacked_convs, feat_channels)
        self.odm_cls_convs = towers(stacked_convs, odm_cls_first)
        self.odm_cls = jnn.Conv(
            feat_channels,
            self.cls_out_channels,
            (3, 3),
            kernel_init=normal_init(0.01),
            bias_init=nnx.initializers.constant(bias_init_with_prob(0.01)),
            rngs=rngs,
        )
        self.odm_reg = jnn.Conv(
            feat_channels, 5, (3, 3), kernel_init=normal_init(0.01), rngs=rngs
        )

    # ------------------------------------------------------------------
    def forward_single(self, x, level, train=False):
        stride = self.anchor_strides[level]
        B, H, W, _ = x.shape

        fam_reg_feat = x
        for conv in self.fam_reg_convs:
            fam_reg_feat = conv(fam_reg_feat, train)
        fam_bbox_pred = self.fam_reg(fam_reg_feat)

        fam_cls_feat = x
        for conv in self.fam_cls_convs:
            fam_cls_feat = conv(fam_cls_feat, train)
        fam_cls_score = self.fam_cls(fam_cls_feat)

        init_anchors = jnp.asarray(
            self.anchor_generators[level].grid_anchors((H, W), stride)
        )  # (H*W, 5)
        deltas = jax.lax.stop_gradient(fam_bbox_pred).reshape(B, H * W, 5)
        refine_anchor = delta2rbox(
            init_anchors[None],
            deltas,
            self.target_means,
            self.target_stds,
            wh_ratio_clip=1e-6,
        ).reshape(B, H, W, 5)

        align_feat = self.align_conv(x, refine_anchor, stride)
        or_feat = self.or_conv(align_feat)
        odm_reg_feat = or_feat
        odm_cls_feat = (
            rotation_invariant_pooling(or_feat, 8)
            if self.with_orconv
            else or_feat
        )
        for conv in self.odm_reg_convs:
            odm_reg_feat = conv(odm_reg_feat, train)
        for conv in self.odm_cls_convs:
            odm_cls_feat = conv(odm_cls_feat, train)
        odm_cls_score = self.odm_cls(odm_cls_feat)
        odm_bbox_pred = self.odm_reg(odm_reg_feat)
        return (
            fam_cls_score,
            fam_bbox_pred,
            refine_anchor,
            odm_cls_score,
            odm_bbox_pred,
        )

    def __call__(self, feats, train: bool = False):
        return [
            self.forward_single(f, lvl, train) for lvl, f in enumerate(feats)
        ]

    # ------------------------------------------------------------------
    def _flat_init_anchors(self, featmap_sizes):
        return jnp.concatenate(
            [
                gen.grid_anchors(tuple(fs), s)
                for gen, fs, s in zip(
                    self.anchor_generators, featmap_sizes, self.anchor_strides
                )
            ],
            0,
        )

    def loss(self, outs, targets):
        outs = jax.tree.map(lambda t: t.astype(jnp.float32), outs)
        featmap_sizes = [o[0].shape[1:3] for o in outs]
        B = outs[0][0].shape[0]
        fam_cls = jnp.concatenate(
            [o[0].reshape(B, -1, self.cls_out_channels) for o in outs], 1
        )
        fam_reg = jnp.concatenate([o[1].reshape(B, -1, 5) for o in outs], 1)
        refine = jnp.concatenate([o[2].reshape(B, -1, 5) for o in outs], 1)
        odm_cls = jnp.concatenate(
            [o[3].reshape(B, -1, self.cls_out_channels) for o in outs], 1
        )
        odm_reg = jnp.concatenate([o[4].reshape(B, -1, 5) for o in outs], 1)

        init_anchors = jnp.asarray(self._flat_init_anchors(featmap_sizes))
        n = init_anchors.shape[0]
        valid = jnp.ones(n, bool)

        losses = {}
        for name, anchors, cls_p, reg_p, cfg_key in (
            ("fam", init_anchors, fam_cls, fam_reg, "fam_cfg"),
            ("odm", refine, odm_cls, odm_reg, "odm_cfg"),
        ):
            cfg = self.train_cfg[cfg_key]
            bcfg = self.loss_cfgs[f"{name}_bbox"]
            bkind = bcfg.get("type", "smooth_l1")
            # RIDet (and other decoded-box losses) compare decoded preds
            # against raw gt boxes (reference s2anet ridet config sets
            # reg_decoded_bbox=True; s2anet_head.py:492-502)
            reg_decoded = bool(cfg.get("reg_decoded_bbox", bkind == "ridet"))
            tgt, num_pos, num_neg = anchor_target_batch(
                anchors,
                valid,
                targets["gt_bboxes"],
                targets["gt_mask"],
                targets["gt_labels"],
                target_means=self.target_means,
                target_stds=self.target_stds,
                assigner_cfg=cfg["assigner"],
                allowed_border=cfg.get("allowed_border", -1),
                pos_weight=cfg.get("pos_weight", -1),
                rotated=True,
                reg_decoded_bbox=reg_decoded,
            )
            num_total = jnp.maximum(num_pos, 1).astype(cls_p.dtype)
            ccfg = self.loss_cfgs[f"{name}_cls"]
            losses[f"loss_{name}_cls"] = (
                sigmoid_focal_loss(
                    cls_p,
                    tgt["labels"],
                    weight=tgt["label_weights"],
                    gamma=ccfg.get("gamma", 2.0),
                    alpha=ccfg.get("alpha", 0.25),
                    avg_factor=num_total,
                )
                * ccfg.get("loss_weight", 1.0)
            )
            if bkind == "ridet":
                from ..losses import ridet_loss

                decoded = delta2rbox(
                    anchors if anchors.ndim == 3 else anchors[None],
                    reg_p, self.target_means, self.target_stds,
                )
                losses[f"loss_{name}_bbox"] = (
                    ridet_loss(
                        decoded.reshape(-1, 5),
                        tgt["bbox_targets"].reshape(-1, 5),
                        weight=tgt["bbox_weights"][..., 0].reshape(-1),
                        beta=bcfg.get("beta", 1.0),
                        avg_factor=num_total,
                    )
                    * bcfg.get("loss_weight", 1.0)
                )
            else:
                losses[f"loss_{name}_bbox"] = (
                    smooth_l1_loss(
                        reg_p,
                        tgt["bbox_targets"],
                        weight=tgt["bbox_weights"],
                        beta=bcfg.get("beta", 1.0 / 9.0),
                        avg_factor=num_total,
                    )
                    * bcfg.get("loss_weight", 1.0)
                )
        return losses

    # ------------------------------------------------------------------
    def predict(self, outs, targets=None):
        """ODM detection from refined anchors (s2anet_head.py:510-601)."""
        cfg = self.test_cfg
        outs = jax.tree.map(lambda t: t.astype(jnp.float32), outs)
        nms_pre = cfg["nms_pre"]
        level_scores, level_boxes = [], []
        for (fc, fr, refine, cls, reg) in outs:
            B, H, W, _ = cls.shape
            scores = jax.nn.sigmoid(cls.reshape(B, -1, self.cls_out_channels))
            deltas = reg.reshape(B, -1, 5)
            anchors = refine.reshape(B, -1, 5)
            n_lvl = anchors.shape[1]
            if nms_pre > 0 and n_lvl > nms_pre:
                max_scores = scores.max(-1)
                _, topk = jax.lax.top_k(max_scores, nms_pre)
                scores = jnp.take_along_axis(scores, topk[..., None], 1)
                deltas = jnp.take_along_axis(deltas, topk[..., None], 1)
                anchors = jnp.take_along_axis(anchors, topk[..., None], 1)
            boxes = delta2rbox(anchors, deltas, self.target_means, self.target_stds)
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
