# Rotated RetinaNet hbb R50-FPN 1x (reference: 68.02 mAP, README.md:107;
# configs/rotated_retinanet/rotated_retinanet_hbb_r50_fpn_1x_dota.py —
# identical to the obb recipe except assignment runs on the minimum
# circumscribed hbbs, FakeBboxOverlaps2D_rotated).
_base_ = ["rotated_retinanet_obb_r50_fpn_1x_dota.py"]
model = dict(
    bbox_head=dict(
        train_cfg=dict(
            assigner=dict(
                pos_iou_thr=0.5,
                neg_iou_thr=0.4,
                min_pos_iou=0.0,
                iou_calculator="fake_rbb",
            ),
            allowed_border=-1,
            pos_weight=-1,
        ),
    ),
)
