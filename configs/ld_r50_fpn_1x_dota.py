# Localization Distillation (student R18 <- teacher R50 distribution head)
_base_ = ["_base_/dota_1024.py", "_base_/sgd_1x.py"]
_head = dict(num_classes=16, in_channels=256)
model = dict(
    type="KnowledgeDistillationSingleStageDetector",
    backbone=dict(type="ResNet", depth=18, frozen_stages=1,
                  pretrained="data/pretrained/resnet18.ckpt"),
    neck=dict(type="FPN", out_channels=256, num_outs=5, start_level=1,
              add_extra_convs="on_input"),
    bbox_head=dict(type="LDRotatedRetinaHead", reg_max=8, **_head),
    teacher=dict(
        type="RotatedRetinaNet",
        backbone=dict(type="ResNet", depth=50, frozen_stages=4,
                      pretrained="data/pretrained/resnet50.ckpt"),
        neck=dict(type="FPN", out_channels=256, num_outs=5, start_level=1,
                  add_extra_convs="on_input"),
        bbox_head=dict(type="RotatedRetinaDistributionHead", reg_max=8, **_head),
    ),
    teacher_ckpt=None,  # set to the trained teacher checkpoint
)
