# DOTA-1.0 tiled dataset (1024x1024, gap 200) — shared dataset config.
# Paths follow the reference layout (preprocessed with tools/preprocess.py).
#
# TPU-native input path: batches ship as raw uint8 (4x less host->device
# transfer); normalization and the random flip run INSIDE the jitted
# step (device_normalize / device_augment below — exact math of the
# reference's Normalize + RotatedRandomFlip transforms, tested in
# tests/test_device_aug.py). Host keeps only decode + resize.
dataset_root = "data/dota_1024"

_train_transforms = [
    dict(type="RotatedResize", min_size=1024, max_size=1024),
]
_test_transforms = [
    dict(type="RotatedResize", min_size=1024, max_size=1024),
]

dataset = dict(
    train=dict(
        type="DOTADataset",
        version="1",
        annotations_file=dataset_root + "/trainval/labels.pkl",
        images_dir=dataset_root + "/trainval/images",
        transforms=_train_transforms,
        image_size=(1024, 1024),
        max_gt=512,
        batch_size=4,
        shuffle=True,
        image_dtype="uint8",
    ),
    val=dict(
        type="DOTADataset",
        version="1",
        annotations_file=dataset_root + "/trainval/labels.pkl",
        images_dir=dataset_root + "/trainval/images",
        transforms=_test_transforms,
        image_size=(1024, 1024),
        max_gt=512,
        batch_size=4,
        filter_empty_gt=False,
        drop_last=False,
        image_dtype="uint8",
    ),
    test=dict(
        type="ImageDataset",
        dataset_type="DOTA",
        images_dir=dataset_root + "/test/images",
        transforms=_test_transforms,
        image_size=(1024, 1024),
        batch_size=4,
        drop_last=False,
        image_dtype="uint8",
    ),
)

device_normalize = dict(mean=[123.675, 116.28, 103.53],
                        std=[58.395, 57.12, 57.375], to_bgr=False)
device_augment = dict(flip_h=0.5)

preprocess = dict(
    dataset_type="DOTA",
    subsize=1024,
    gap=200,
    rates=[1.0],
    tasks=[
        dict(image_dir="data/dota/trainval/images",
             label_dir="data/dota/trainval/labelTxt",
             out_dir=dataset_root + "/trainval"),
        dict(image_dir="data/dota/test/images", label_dir=None,
             out_dir=dataset_root + "/test"),
    ],
)

max_epoch = 12
log_interval = 50
checkpoint_interval = 1
eval_interval = 12
seed = 0
