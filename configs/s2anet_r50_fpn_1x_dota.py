# S2ANet R50-FPN 1x (reference headline: 74.11 mAP, README.md:100)
_base_ = ["_base_/dota_1024.py", "_base_/sgd_1x.py"]
optimizer = dict(lr=0.0025)
model = dict(
    type="S2ANet",
    backbone=dict(type="ResNet", depth=50, frozen_stages=1,
                  pretrained="data/pretrained/resnet50.ckpt"),
    neck=dict(type="FPN", out_channels=256, num_outs=5, start_level=1,
              add_extra_convs="on_input"),
    bbox_head=dict(
        type="S2ANetHead", num_classes=16, in_channels=256,
        feat_channels=256, stacked_convs=2,
    ),
)
