from .econv import (
    REConv2d, REConv2dLift, InnerBatchNorm, N_ORIENT,
    rotation_interp_matrix,
)
