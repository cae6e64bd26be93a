# Rotated RetinaNet OBB on DOTA-1.5 (16 fg classes incl.
# container-crane; reference configs/retinanet_r50v1d_fpn_dota1_5.py).
_base_ = ["rotated_retinanet_obb_r50_fpn_1x_dota.py"]

dataset_root = "data/dota1_5_1024"

model = dict(bbox_head=dict(num_classes=17))

dataset = dict(
    train=dict(version="1_5",
               annotations_file=dataset_root + "/trainval/labels.pkl",
               images_dir=dataset_root + "/trainval/images"),
    val=dict(version="1_5",
             annotations_file=dataset_root + "/trainval/labels.pkl",
             images_dir=dataset_root + "/trainval/images"),
    test=dict(dataset_type="DOTA1_5",
              images_dir=dataset_root + "/test/images"),
)

preprocess = dict(
    dataset_type="DOTA1_5",
    subsize=1024,
    gap=200,
    rates=[1.0],
    tasks=[
        dict(image_dir="data/dota1_5/trainval/images",
             label_dir="data/dota1_5/trainval/labelTxt",
             out_dir=dataset_root + "/trainval"),
        dict(image_dir="data/dota1_5/test/images", label_dir=None,
             out_dir=dataset_root + "/test"),
    ],
)
