# Gliding Vertex with flip + random 90-degree rotate + category-balance
# resampling (reference
# configs/gliding_r50_fpn_1x_dota_with_flip_rotate_balance_cate.py,
# 74.93 mAP README.md:105).
_base_ = ["gliding_r50_fpn_1x_dota.py"]
dataset = dict(
    train=dict(
        balance_category=True,
        transforms=[
            dict(type="RotatedResize", min_size=1024, max_size=1024),
            dict(type="RotatedRandomFlip", prob=0.5),
            dict(type="RandomRotateAug", rotate_ratio=1.0),
            dict(type="Normalize", mean=[123.675, 116.28, 103.53],
                 std=[58.395, 57.12, 57.375], to_bgr=False),
        ],
    ),
)
