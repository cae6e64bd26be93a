# Oriented R-CNN R50-FPN 1x (reference: 75.62 mAP, README.md:115)
_base_ = ["_base_/dota_1024.py", "_base_/sgd_1x.py"]
optimizer = dict(lr=0.005)
model = dict(
    type="OrientedRCNN",
    backbone=dict(type="ResNet", depth=50, frozen_stages=1,
                  pretrained="data/pretrained/resnet50.ckpt"),
    neck=dict(type="FPN", out_channels=256, num_outs=5),
    rpn_head=dict(type="OrientedRPNHead", in_channels=256, feat_channels=256),
    bbox_head=dict(type="OrientedHead", num_classes=15, in_channels=256),
)
