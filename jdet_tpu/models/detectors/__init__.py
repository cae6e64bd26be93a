from .single_stage import SingleStageDetector, RotatedRetinaNet
from .single_stage import S2ANet
from .two_stage import RCNN, OrientedRCNN
from .single_stage import FCOS
from .two_stage import FasterRCNNOBB, GlidingVertex, RoITransformer
from .two_stage import StripRCNN
from .two_stage import ReDet
from .h2rbox import H2RBox
from .single_stage import KnowledgeDistillationSingleStageDetector
from .single_stage import RotatedRepPoints
from .single_stage import SSD
from .single_stage import R3Det
from .yolo import YOLO
