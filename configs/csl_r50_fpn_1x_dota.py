# CSL R50-FPN 1x (reference: 67.99 mAP, README.md:117)
_base_ = ["_base_/dota_1024.py", "_base_/sgd_1x.py"]
model = dict(
    type="RotatedRetinaNet",
    backbone=dict(type="ResNet", depth=50, frozen_stages=1,
                  pretrained="data/pretrained/resnet50.ckpt"),
    neck=dict(type="FPN", out_channels=256, num_outs=5, start_level=1,
              add_extra_convs="on_input"),
    bbox_head=dict(type="CSLRRetinaHead", num_classes=16, in_channels=256),
)
