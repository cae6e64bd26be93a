"""Generic single-stage detector: backbone -> neck -> head.

Capability mirror of `SingleStageDetector` / `RotatedRetinaNet` / `S2ANet`
wrappers (`python/jdet/models/networks/single_stage.py:7-32`,
`networks/rotated_retinanet.py:8`, `networks/s2anet.py:8`): the detector is
a thin composition; all logic lives in the head.
"""
from __future__ import annotations

from flax import nnx

from ...utils.registry import MODELS


@MODELS.register_module()
class SingleStageDetector(nnx.Module):
    def __init__(self, backbone, neck=None, bbox_head=None):
        self.backbone = backbone
        self.neck = neck
        self.bbox_head = bbox_head

    def extract_feat(self, images, train=False):
        feats = self.backbone(images, train)
        if self.neck is not None:
            feats = self.neck(feats, train)
        return feats

    def loss(self, images, targets):
        """Training forward: images (B, H, W, 3) NHWC, targets dict with
        gt_bboxes/gt_labels/gt_mask. Returns dict of scalar losses."""
        feats = self.extract_feat(images, train=True)
        outs = self.bbox_head(feats, train=True)
        return self.bbox_head.loss(outs, targets)

    def predict(self, images, targets=None):
        feats = self.extract_feat(images, train=False)
        outs = self.bbox_head(feats, train=False)
        return self.bbox_head.predict(outs, targets)

    def __call__(self, images, targets=None, train=False):
        if train:
            return self.loss(images, targets)
        return self.predict(images, targets)


@MODELS.register_module()
class RotatedRetinaNet(SingleStageDetector):
    """networks/rotated_retinanet.py:8 — thin wrapper."""


@MODELS.register_module()
class S2ANet(SingleStageDetector):
    """networks/s2anet.py:8 — thin wrapper; all logic in S2ANetHead."""


@MODELS.register_module()
class FCOS(SingleStageDetector):
    """networks/fcos.py:5 — thin wrapper."""
