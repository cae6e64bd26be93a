from .anchor_generator import (
    AnchorGeneratorRotated,
    AnchorGeneratorRotatedS2ANet,
    AnchorGeneratorHBB,
    multi_level_grid_anchors,
)
from .assigner import (
    assign_wrt_overlaps,
    max_iou_assign_rotated,
    max_iou_assign_hbb,
    hbb_overlaps,
)
from .sampler import pseudo_sample, random_sample
from .anchor_target import anchor_target_single, anchor_target_batch
