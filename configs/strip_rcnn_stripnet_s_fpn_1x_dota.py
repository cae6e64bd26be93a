# Strip R-CNN StripNet-S FPN 1x AdamW (reference: 77.36 mAP, README.md:122)
_base_ = ["_base_/dota_1024.py"]
optimizer = dict(type="AdamW", lr=0.0002, weight_decay=0.05,
                 grad_clip=dict(max_norm=35))
scheduler = dict(type="StepLR", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, milestones=[8, 11], gamma=0.1)
model = dict(
    type="StripRCNN",
    backbone=dict(type="StripNet", arch="s",
                  pretrained="data/pretrained/stripnet_s.ckpt"),
    neck=dict(type="FPN", out_channels=256, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256),
    bbox_head=dict(type="StripHead", num_classes=15, in_channels=256),
)
