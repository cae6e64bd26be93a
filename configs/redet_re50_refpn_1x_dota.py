# ReDet ReResNet50-ReFPN 1x (reference: 76.23 mAP, README.md:116)
_base_ = ["_base_/dota_1024.py", "_base_/sgd_1x.py"]
optimizer = dict(lr=0.005)
model = dict(
    type="ReDet",
    backbone=dict(type="ReResNet", depth=50, base_fields=8,
                  frozen_stages=1,  # reference ReDet config parity
                  pretrained="data/pretrained/reresnet50.ckpt"),
    neck=dict(type="ReFPN", out_channels=256, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256),
    bbox_head=dict(type="ReDetHead", num_classes=15, in_channels=256),
)
