# SSD300-VGG16 on COCO (reference: projects/ssd/configs/ssd300_coco.py).
# Exercises the SSD train-aug stack (PhotoMetricDistortion / Expand /
# MinIoURandomCrop, reference data/transforms.py:155,228,255).
input_size = 300
img_norm_mean = [123.675, 116.28, 103.53]

model = dict(
    type="SSD",
    backbone=dict(type="SSDVGG",
                  pretrained="data/pretrained/vgg16.ckpt"),
    neck=dict(
        type="SSDNeck",
        in_channels=(512, 1024),
        extra_channels=(512, 256, 256, 256),
    ),
    bbox_head=dict(
        type="SSDHead",
        num_classes=80,
        in_channels=(512, 1024, 512, 256, 256, 256),
        strides=(8, 16, 32, 64, 100, 300),
        target_means=(0.0, 0.0, 0.0, 0.0),
        target_stds=(0.1, 0.1, 0.2, 0.2),
        neg_pos_ratio=3,
        test_cfg=dict(nms_pre=1000, nms_iou_thr=0.45, score_thr=0.02,
                      max_per_img=200),
    ),
)

_train_transforms = [
    dict(type="PhotoMetricDistortion", brightness_delta=32,
         contrast_range=(0.5, 1.5), saturation_range=(0.5, 1.5),
         hue_delta=18),
    dict(type="Expand", mean=img_norm_mean, ratio_range=(1, 4), prob=0.5),
    dict(type="MinIoURandomCrop", min_ious=(0.1, 0.3, 0.5, 0.7, 0.9),
         min_crop_size=0.3),
    dict(type="Resize", min_size=input_size, max_size=input_size,
         keep_ratio=False),
    dict(type="RandomFlip", prob=0.5),
    dict(type="Normalize", mean=img_norm_mean, std=[1, 1, 1], to_bgr=True),
]
_test_transforms = [
    dict(type="Resize", min_size=input_size, max_size=input_size,
         keep_ratio=False),
    dict(type="Normalize", mean=img_norm_mean, std=[1, 1, 1], to_bgr=True),
]

dataset = dict(
    train=dict(
        type="COCODataset",
        anno_file="data/coco/annotations/instances_train2017.json",
        images_dir="data/coco/images/train2017",
        transforms=_train_transforms,
        image_size=(input_size, input_size),
        batch_size=32,
        shuffle=True,
    ),
    val=dict(
        type="COCODataset",
        anno_file="data/coco/annotations/instances_val2017.json",
        images_dir="data/coco/images/val2017",
        transforms=_test_transforms,
        image_size=(input_size, input_size),
        batch_size=8,
        drop_last=False,
    ),
    test=dict(
        type="COCODataset",
        anno_file="data/coco/annotations/instances_val2017.json",
        images_dir="data/coco/images/val2017",
        transforms=_test_transforms,
        image_size=(input_size, input_size),
        batch_size=8,
        drop_last=False,
    ),
)

optimizer = dict(type="SGD", lr=2e-3, momentum=0.9, weight_decay=5e-4)
scheduler = dict(type="StepLR", warmup="linear", warmup_iters=1000,
                 warmup_ratio=0.001, milestones=[45, 55])

max_epoch = 60
eval_interval = 3
checkpoint_interval = 3
log_interval = 50
