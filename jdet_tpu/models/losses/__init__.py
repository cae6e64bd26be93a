from .basic import (
    sigmoid_focal_loss,
    smooth_l1_loss,
    l1_loss,
    cross_entropy_loss,
    binary_cross_entropy_loss,
    weight_reduce_loss,
)
from .gaussian_dist_loss import gwd_loss, kld_loss, bcd_loss, gaussian_dist_loss
from .poly_iou_loss import poly_iou_loss, poly_giou_loss
from .ridet_loss import ridet_loss
from .kf_iou_loss import kf_iou_loss
from .iou_loss import rotated_iou_loss
from .smooth_focal_loss import smooth_focal_loss
from .misc_losses import (
    rsdet_loss,
    knowledge_distillation_kl_div_loss,
    im_loss,
    jd_loss,
    kld_symmax_loss,
    kld_symmin_loss,
)

# ---------------------------------------------------------------------------
# LOSSES registry parity (reference SURVEY §2.6: 13 LOSSES-registered rows,
# python/jdet/models/losses/*). Our losses are pure jax functions (the
# TPU-first design: heads close over configured partials instead of holding
# stateful loss Modules), so the registry maps the reference class names to
# configured partials — `build_from_cfg(dict(type="FocalLoss", ...), LOSSES)`
# returns a callable with the reference's call signature.
# ---------------------------------------------------------------------------
from functools import partial as _partial

from ...utils.registry import LOSSES as _LOSSES
from ...ops.convex import convex_giou_loss as _convex_giou_loss


def _register_fn(name, fn):
    _LOSSES.register_module(name=name)(
        lambda **cfg: _partial(fn, **cfg) if cfg else fn
    )


for _name, _fn in {
    "FocalLoss": sigmoid_focal_loss,
    "SmoothL1Loss": smooth_l1_loss,
    "L1Loss": l1_loss,
    "CrossEntropyLoss": cross_entropy_loss,
    "CrossEntropyLossForRcnn": cross_entropy_loss,
    "BCEWithLogitsLoss": binary_cross_entropy_loss,
    "SmoothFocalLoss": smooth_focal_loss,
    "GDLoss": gaussian_dist_loss,
    "GDLoss_v1": gaussian_dist_loss,
    "KFLoss": kf_iou_loss,
    "IoULoss": rotated_iou_loss,
    "PolyIoULoss": poly_iou_loss,
    "PolyGIoULoss": poly_giou_loss,
    "ConvexGIoULoss": _convex_giou_loss,
    "KnowledgeDistillationKLDivLoss": knowledge_distillation_kl_div_loss,
    "IMLoss": im_loss,
    "RSDetLoss": rsdet_loss,
    "RIDetLoss": ridet_loss,
}.items():
    _register_fn(_name, _fn)
