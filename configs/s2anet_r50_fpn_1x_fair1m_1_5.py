# S2ANet R50-FPN 1x on FAIR1M-1.5 (reference
# configs/s2anet/s2anet_r50_fpn_1x_fair1m_1_5.py: 10 fg classes,
# 1024/200 tiles).
_base_ = ["s2anet_r50_fpn_1x_dota.py"]

dataset_root = "data/fair1m_1_5_1024"

model = dict(bbox_head=dict(num_classes=11))

dataset = dict(
    train=dict(
        type="FAIR1M_1_5_Dataset",
        annotations_file=dataset_root + "/train/labels.pkl",
        images_dir=dataset_root + "/train/images",
    ),
    val=dict(
        type="FAIR1M_1_5_Dataset",
        annotations_file=dataset_root + "/train/labels.pkl",
        images_dir=dataset_root + "/train/images",
    ),
    test=dict(
        dataset_type="FAIR1M_1_5",
        images_dir=dataset_root + "/test/images",
    ),
)

preprocess = dict(
    dataset_type="FAIR1M_1_5",
    convert=dict(type="FAIR1M_1_5", tasks=[
        dict(in_dir="data/fair1m_1_5/train", out_dir="data/fair1m_1_5_dota/train"),
        dict(in_dir="data/fair1m_1_5/test", out_dir="data/fair1m_1_5_dota/test"),
    ]),
    subsize=1024,
    gap=200,
    rates=[1.0],
    tasks=[
        dict(image_dir="data/fair1m_1_5_dota/train/images",
             label_dir="data/fair1m_1_5_dota/train/labelTxt",
             out_dir=dataset_root + "/train"),
        dict(image_dir="data/fair1m_1_5_dota/test/images", label_dir=None,
             out_dir=dataset_root + "/test"),
    ],
)
