# S2ANet R50-FPN 1x on SSDD+ (rotated SAR ship detection; reference
# projects/s2anet/configs/s2anet_r50_fpn_1x_ssdd_plus.py: 1 fg class,
# rotated-NMS iou 0.1). SSDD images are small — the converter resizes to
# 512 and no tiling is needed.
_base_ = ["s2anet_r50_fpn_1x_dota.py"]

dataset_root = "data/ssdd_plus_dota"

model = dict(bbox_head=dict(num_classes=2,
                            test_cfg=dict(nms_iou_thr=0.1)))

_tf = [dict(type="RotatedResize", min_size=512, max_size=512)]

dataset = dict(
    train=dict(
        type="SSDDDataset",
        annotations_file=dataset_root + "/train/labels.pkl",
        images_dir=dataset_root + "/train/images",
        transforms=_tf,
        image_size=(512, 512),
    ),
    val=dict(
        type="SSDDDataset",
        annotations_file=dataset_root + "/test/labels.pkl",
        images_dir=dataset_root + "/test/images",
        transforms=_tf,
        image_size=(512, 512),
    ),
    test=dict(
        dataset_type="SSDD+",
        images_dir=dataset_root + "/test/images",
        transforms=_tf,
        image_size=(512, 512),
    ),
)

preprocess = dict(
    dataset_type="SSDD+",
    convert=dict(type="SSDD+", resize=512, tasks=[
        dict(image_dir="data/ssdd_plus/train/images",
             label_dir="data/ssdd_plus/train/labelTxt",
             out_dir=dataset_root + "/train"),
        dict(image_dir="data/ssdd_plus/test/images",
             label_dir="data/ssdd_plus/test/labelTxt",
             out_dir=dataset_root + "/test"),
    ]),
)
