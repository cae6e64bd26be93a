# H2RBox R50-FPN 1x AdamW (reference: 67.62 mAP, README.md:106)
_base_ = ["_base_/dota_1024.py"]
optimizer = dict(type="AdamW", lr=0.0001, weight_decay=0.05,
                 grad_clip=dict(max_norm=35))
scheduler = dict(type="StepLR", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, milestones=[8, 11], gamma=0.1)
model = dict(
    type="H2RBox",
    backbone=dict(type="ResNet", depth=50, frozen_stages=1,
                  pretrained="data/pretrained/resnet50.ckpt"),
    neck=dict(type="FPN", out_channels=256, num_outs=5, start_level=1,
              add_extra_convs="on_output", relu_before_extra_convs=True),
    bbox_head=dict(type="H2RBoxHead", num_classes=15, in_channels=256,
                   rotation_agnostic_classes=[1, 9, 11],
                   rect_classes=[9, 11]),
)
