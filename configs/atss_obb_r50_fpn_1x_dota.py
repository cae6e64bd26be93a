# Rotated ATSS R50-FPN 1x (reference: 72.44 mAP, README.md:119)
_base_ = ["_base_/dota_1024.py", "_base_/sgd_1x.py"]
model = dict(
    type="RotatedRetinaNet",
    backbone=dict(type="ResNet", depth=50, frozen_stages=1,
                  pretrained="data/pretrained/resnet50.ckpt"),
    neck=dict(type="FPN", out_channels=256, num_outs=5, start_level=1,
              add_extra_convs="on_input"),
    bbox_head=dict(type="RotatedATSSHead", num_classes=16, in_channels=256,
                   octave_base_scale=4, scales_per_octave=1,
                   anchor_ratios=[1.0]),
)
