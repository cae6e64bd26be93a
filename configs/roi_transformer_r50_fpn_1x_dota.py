# RoI-Transformer R50-FPN 1x (reference: 73.842 mAP, README.md:113)
_base_ = ["_base_/dota_1024.py", "_base_/sgd_1x.py"]
optimizer = dict(lr=0.005)
model = dict(
    type="RoITransformer",
    backbone=dict(type="ResNet", depth=50, frozen_stages=1,
                  pretrained="data/pretrained/resnet50.ckpt"),
    neck=dict(type="FPN", out_channels=256, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256),
    bbox_head=dict(type="RoITransHead", num_classes=15, in_channels=256),
)
