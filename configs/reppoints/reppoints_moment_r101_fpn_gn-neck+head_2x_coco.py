# (reference: configs/reppoints/reppoints_moment_r101_fpn_gn-neck+head_2x_coco.py — same recipe, this framework's schema)
_base_ = './reppoints_moment_r50_fpn_gn-neck+head_2x_coco.py'
model = dict(pretrained='torchvision://resnet101',
             backbone=dict(depth=101))
