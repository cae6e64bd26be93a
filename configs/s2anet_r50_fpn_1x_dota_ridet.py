# S2ANet R50-FPN 1x with RIDet ODM loss (reference
# configs/s2anet/s2anet_r50_fpn_1x_dota_ridet.py: RIDetLoss as
# loss_odm_bbox, reg_decoded_bbox=True on the ODM stage).
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
        loss_odm_bbox=dict(type="ridet", beta=1.0, loss_weight=1.0),
        train_cfg=dict(
            fam_cfg=dict(
                assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4,
                              min_pos_iou=0.0),
                allowed_border=-1, pos_weight=-1,
            ),
            odm_cfg=dict(
                assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4,
                              min_pos_iou=0.0),
                allowed_border=-1, pos_weight=-1,
                reg_decoded_bbox=True,
            ),
        ),
    ),
)
