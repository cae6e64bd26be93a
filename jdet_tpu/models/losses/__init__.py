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
