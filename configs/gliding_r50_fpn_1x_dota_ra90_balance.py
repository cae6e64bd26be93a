# Gliding Vertex with flip + random 90-degree rotate + category-balance
# resampling (reference
# configs/gliding_r50_fpn_1x_dota_with_flip_rotate_balance_cate.py,
# 74.93 mAP README.md:105). Flip/rot90 run device-side inside the jitted
# step (base config's device_augment; same math as RotatedRandomFlip /
# RandomRotateAug).
_base_ = ["gliding_r50_fpn_1x_dota.py"]
dataset = dict(
    train=dict(balance_category=True),
)
device_augment = dict(flip_h=0.5, rot90=1.0)
