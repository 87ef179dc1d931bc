# (reference: configs/refinemask/coco/r101-refinemask-1x.py — same recipe, this framework's schema)
_base_ = './r50_refinemask_1x.py'
model = dict(pretrained='torchvision://resnet101',
             backbone=dict(depth=101))
