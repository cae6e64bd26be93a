from .rotated_retina_head import RotatedRetinaHead
from .s2anet_head import S2ANetHead
from .rpn_heads import RPNHead, OrientedRPNHead, GlidingRPNHead
from .oriented_head import OrientedHead
from .rotated_retina_head import (
    GWDRetinaHead, KLDRetinaHead, KFIoURRetinaHead, RotatedATSSHead,
)
from .csl_retina_head import CSLRRetinaHead
from .fcos_head import FCOSHead
from .h2rbox_head import H2RBoxHead
from .obb_roi_heads import FasterrcnnHead, GlidingHead, RoITransHead
from .obb_roi_heads import StripHead
from .obb_roi_heads import ReDetHead
from .rotated_retina_head import RSDetHead
from .ld_retina_head import RotatedRetinaDistributionHead, LDRotatedRetinaHead
from .reppoints_head import RotatedRepPointsHead
from .ssd_head import SSDHead
from .r3det_head import R3DetHead
