# (reference: configs/fsaf/fsaf_r101_fpn_1x_coco.py — same recipe, this framework's schema)
_base_ = './fsaf_r50_fpn_1x_coco.py'
model = dict(pretrained='torchvision://resnet101',
             backbone=dict(depth=101))
