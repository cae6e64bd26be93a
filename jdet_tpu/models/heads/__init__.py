from .rotated_retina_head import RotatedRetinaHead
from .s2anet_head import S2ANetHead
from .rpn_heads import RPNHead, OrientedRPNHead
from .oriented_head import OrientedHead
