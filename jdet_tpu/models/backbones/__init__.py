from .resnet import ResNet, ResNet_v1d, load_torch_resnet
