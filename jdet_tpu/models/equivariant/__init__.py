from .econv import (
    REConv2d, REConv2dLift, InnerBatchNorm, N_ORIENT,
    cache_expanded_weights, rotation_interp_matrix,
)
