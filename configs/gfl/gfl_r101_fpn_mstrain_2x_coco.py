# (reference: configs/gfl/gfl_r101_fpn_mstrain_2x_coco.py — same recipe, this framework's schema)
_base_ = './gfl_r50_fpn_mstrain_2x_coco.py'
model = dict(pretrained='torchvision://resnet101',
             backbone=dict(depth=101))
