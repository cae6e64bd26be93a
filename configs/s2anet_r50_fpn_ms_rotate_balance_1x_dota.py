# S2ANet R50-FPN 1x multi-scale + rotate aug + class balance (reference
# headline: 79.72 mAP, README.md:102; recipe of
# configs/s2anet/s2anet_r50_fpn_1x_dota_rotate_balance_ms_fair.py applied
# to DOTA-1.0: tiles preprocessed at rates 0.5/1.0/1.5, RandomRotateAug,
# balance_category resampling; ms test merges over the same 3-rate tiling).
_base_ = ["s2anet_r50_fpn_1x_dota.py"]

dataset_root = "data/dota_1024_ms"

dataset = dict(
    train=dict(
        annotations_file=dataset_root + "/trainval/labels.pkl",
        images_dir=dataset_root + "/trainval/images",
        balance_category=True,
    ),
    val=dict(
        annotations_file=dataset_root + "/trainval/labels.pkl",
        images_dir=dataset_root + "/trainval/images",
    ),
    test=dict(
        images_dir=dataset_root + "/test/images",
    ),
)

# flip + random 90-degree rotate run device-side inside the jitted step
# (same math as RotatedRandomFlip / RandomRotateAug)
device_augment = dict(flip_h=0.5, rot90=1.0)

# multi-scale tiling: each source image is tiled at 3 zoom rates; the
# merge step rescales per-tile offsets by the rate encoded in the tile
# name (devkits/result_merge.py:35)
preprocess = dict(
    dataset_type="DOTA",
    subsize=1024,
    gap=200,
    rates=[0.5, 1.0, 1.5],
    tasks=[
        dict(image_dir="data/dota/trainval/images",
             label_dir="data/dota/trainval/labelTxt",
             out_dir=dataset_root + "/trainval"),
        dict(image_dir="data/dota/test/images", label_dir=None,
             out_dir=dataset_root + "/test"),
    ],
)
