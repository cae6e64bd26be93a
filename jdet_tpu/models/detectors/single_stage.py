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

    def loss(self, images, targets, key=None):
        """Training forward: images (B, H, W, 3) NHWC, targets dict with
        gt_bboxes/gt_labels/gt_mask. Returns dict of scalar losses.
        `key` is the per-step PRNG key threaded by the Runner; single-stage
        anchor targeting is deterministic so it is unused here, but
        subclasses with stochastic training paths (H2RBox) consume it."""
        del key
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


@MODELS.register_module()
class KnowledgeDistillationSingleStageDetector(SingleStageDetector):
    """LD wrapper (networks/kd_one_stage.py:26-45): a frozen teacher built
    from its own config/checkpoint provides box-distribution targets.

    The teacher lives under the `teacher` attribute; build_optimizer
    freezes any parameter whose path contains 'teacher'.
    """

    def __init__(self, backbone, neck=None, bbox_head=None, teacher=None,
                 teacher_ckpt=None):
        super().__init__(backbone, neck, bbox_head)
        self.teacher = teacher
        if teacher is not None and teacher_ckpt:
            from ...runner.checkpoint import load_checkpoint

            load_checkpoint(teacher_ckpt, self.teacher, model_only=True)

    def loss(self, images, targets, key=None):
        import jax

        del key
        feats = self.extract_feat(images, train=True)
        outs = self.bbox_head(feats, train=True)
        if self.teacher is None:
            return self.bbox_head.loss(outs, targets)
        t_feats = self.teacher.extract_feat(images, train=False)
        t_outs = self.teacher.bbox_head(t_feats, train=False)
        t_outs = jax.tree.map(jax.lax.stop_gradient, t_outs)
        return self.bbox_head.loss_with_teacher(outs, t_outs, targets)


@MODELS.register_module()
class RotatedRepPoints(SingleStageDetector):
    """RepPoints wrapper (reference uses SingleStageDetector with
    RotatedRepPointsHead)."""


@MODELS.register_module()
class SSD(SingleStageDetector):
    """SSD single-stage detector (reference projects/ssd; SSD_VGG +
    SSDNeck + SSDHead)."""


@MODELS.register_module()
class R3Det(SingleStageDetector):
    """networks/r3det.py — working completion (the reference file is
    unfinished; see R3DetHead docstring)."""
