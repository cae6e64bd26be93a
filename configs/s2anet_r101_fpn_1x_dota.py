# S2ANet R101-FPN 1x (reference: 74.28 mAP, README.md:103)
_base_ = ["s2anet_r50_fpn_1x_dota.py"]
model = dict(backbone=dict(depth=101,
                            pretrained="data/pretrained/resnet101.ckpt"))
