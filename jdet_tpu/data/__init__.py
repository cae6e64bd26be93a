from .custom import CustomDataset
from .dota import (
    DOTADataset, FAIRDataset, FAIR1M_1_5_Dataset, SSDDDataset, ImageDataset,
)
from .transforms import (
    Compose, Resize, RotatedResize, RandomFlip, RotatedRandomFlip,
    RandomRotateAug, Pad, Normalize,
)
from .coco import COCODataset, coco_map
from .dota import DOTAWSOODDataset
from .yolo import YoloDataset
