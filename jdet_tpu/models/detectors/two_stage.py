"""Two-stage detectors: RCNN base + Oriented R-CNN.

Capability mirror of the reference RCNN composition
(`python/jdet/models/networks/rcnn.py:9-52`,
`networks/oriented_rcnn.py:6`): backbone -> neck -> rpn (losses +
proposals) -> roi head (losses | detections); RPN losses are merged into
the final dict.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ...ops.box_convert import rbox_to_hbox
from ...utils.registry import MODELS


@MODELS.register_module()
class RCNN(nnx.Module):
    def __init__(self, backbone, neck=None, rpn_head=None, bbox_head=None):
        self.backbone = backbone
        self.neck = neck
        self.rpn_head = rpn_head
        self.bbox_head = bbox_head

    def extract_feat(self, images, train=False):
        feats = self.backbone(images, train)
        if self.neck is not None:
            feats = self.neck(feats, train)
        return feats

    def _with_hboxes(self, targets):
        if "gt_hboxes" not in targets:
            targets = dict(targets)
            targets["gt_hboxes"] = rbox_to_hbox(targets["gt_bboxes"])
        return targets

    def loss(self, images, targets, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        targets = self._with_hboxes(targets)
        feats = self.extract_feat(images, train=True)
        rpn_outs = self.rpn_head(feats, train=True)
        losses = self.rpn_head.loss(rpn_outs, targets, key=k1)
        proposals = self.rpn_head.get_proposals(rpn_outs)
        proposals = jax.tree.map(jax.lax.stop_gradient, proposals)
        losses.update(
            self.bbox_head.loss(feats, proposals, targets, key=k2)
        )
        return losses

    def predict(self, images, targets=None):
        feats = self.extract_feat(images, train=False)
        rpn_outs = self.rpn_head(feats, train=False)
        proposals = self.rpn_head.get_proposals(rpn_outs)
        return self.bbox_head.predict(feats, proposals, targets)

    def __call__(self, images, targets=None, train=False):
        if train:
            return self.loss(images, targets)
        return self.predict(images, targets)


@MODELS.register_module()
class OrientedRCNN(RCNN):
    """networks/oriented_rcnn.py:6 — RCNN with OrientedRPNHead +
    OrientedHead."""


@MODELS.register_module()
class FasterRCNNOBB(RCNN):
    """networks/faster_rcnn_obb.py:9 — hbb RPN + OBB-regressing head."""


@MODELS.register_module()
class GlidingVertex(RCNN):
    """networks/gliding_vertex.py:6 — RCNN with GlidingHead."""


@MODELS.register_module()
class RoITransformer(RCNN):
    """networks/roi_transformer.py — RCNN with the RoITransHead cascade."""


@MODELS.register_module()
class StripRCNN(RCNN):
    """networks/strip_rcnn.py:6 — StripNet backbone + StripHead."""


@MODELS.register_module()
class ReDet(RCNN):
    """networks/redet.py — ReResNet + ReFPN backbone with the
    RiRoIAlign cascade head."""
