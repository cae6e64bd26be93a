# Rotated FCOS R50-FPN 1x (reference: 70.40 mAP, README.md:114)
_base_ = ["_base_/dota_1024.py", "_base_/sgd_1x.py"]
model = dict(
    type="FCOS",
    backbone=dict(type="ResNet", depth=50, frozen_stages=1,
                  pretrained="data/pretrained/resnet50.ckpt"),
    neck=dict(type="FPN", out_channels=256, num_outs=5, start_level=1,
              add_extra_convs="on_output", relu_before_extra_convs=True),
    bbox_head=dict(type="FCOSHead", num_classes=15, in_channels=256),
)
