# R3Det R50-FPN 1x (reference configs/r3det_r50_fpn_1x_dota.py; the
# reference network file is unfinished — ours is a working completion,
# see jdet_tpu/models/heads/r3det_head.py).
_base_ = ["_base_/dota_1024.py", "_base_/sgd_1x.py"]
optimizer = dict(lr=0.0025)
model = dict(
    type="R3Det",
    backbone=dict(type="ResNet", depth=50, frozen_stages=1,
                  pretrained="data/pretrained/resnet50.ckpt"),
    neck=dict(type="FPN", out_channels=256, num_outs=5, start_level=1,
              add_extra_convs="on_input"),
    bbox_head=dict(
        type="R3DetHead", num_classes=16, in_channels=256,
        feat_channels=256,
    ),
)
