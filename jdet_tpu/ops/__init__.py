from .box_convert import (
    norm_angle,
    regular_theta,
    regular_obb,
    mintheta_obb,
    rbox_to_poly,
    rbox_to_corners,
    poly_to_rbox,
    poly_to_hbox,
    rbox_to_hbox,
    hbox_to_rbox,
    get_best_begin_point,
    rbox2delta,
    delta2rbox,
    hbox2delta,
    delta2hbox,
    distance2hbox,
    distance2obb,
    points_in_rbox,
    integral,
    integral_angle,
)
from .box_iou_rotated import (
    box_iou_rotated,
    box_iou_rotated_aligned,
    rotated_intersection_area,
)
from .nms_rotated import nms_rotated, ml_nms_rotated, multiclass_nms_rotated
from .deform_conv import deform_conv2d, DeformConv, DCNv2, bilinear_sample_nhwc
from .orn import ORConv2d, rotate_arf, rotation_invariant_pooling, rotation_invariant_encoding
from .roi_align_rotated import roi_align, roi_align_rotated
from .nms import nms, hbb_iou_matrix
from .riroi_align import riroi_align
from .roi_ops_extra import (
    psroi_align, roi_pool, FeatureRefineModule, dcn_v2_pooling, DCNPooling,
)
