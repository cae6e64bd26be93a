from .resnet import ResNet, ResNet_v1d, load_torch_resnet
from .lsknet import LSKNet, StripNet
from .res2net import Res2Net
from .re_resnet import ReResNet
from .ssd_vgg import SSDVGG, SSDNeck, L2Norm
