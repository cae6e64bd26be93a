# Rotated RetinaNet OBB with the ResNet50-v1d backbone (deep stem +
# avg-down; reference configs/retinanet_r50v1d_fpn_dota.py uses v1d for
# its published retinanet rows).
_base_ = ["rotated_retinanet_obb_r50_fpn_1x_dota.py"]

model = dict(
    backbone=dict(
        _cover_=True,
        type="ResNet_v1d", depth=50, frozen_stages=1,
        pretrained="data/pretrained/resnet50_v1d.ckpt",
    ),
)
