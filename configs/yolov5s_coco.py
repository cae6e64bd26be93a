# YOLOv5s COCO 12-epoch with EMA (reference:
# projects/yolo/configs/yolov5s_coco_12epoch_ema.py).
imgsz = 640

model = dict(type="YOLO", nc=80, imgsz=imgsz)
ema = dict(decay=0.9999)

dataset = dict(
    train=dict(
        type="YoloDataset",
        images_dir="data/coco/images/train2017",
        labels_dir="data/coco/labels/train2017",
        img_size=imgsz,
        augment=True,
        mosaic=True,
        batch_size=16,
        shuffle=True,
    ),
    val=dict(
        type="YoloDataset",
        images_dir="data/coco/images/val2017",
        labels_dir="data/coco/labels/val2017",
        img_size=imgsz,
        augment=False,
        mosaic=False,
        batch_size=16,
        drop_last=False,
    ),
)

optimizer = dict(type="SGD", lr=0.01, momentum=0.937, weight_decay=0.0005,
                 nesterov=True)
scheduler = dict(type="CosineAnnealingLR", warmup="linear",
                 warmup_iters=1000, warmup_ratio=0.1)

max_epoch = 12
eval_interval = 12
checkpoint_interval = 1
log_interval = 10
