# (reference: configs/refinemask/coco/r50-refinemask-2x.py — same recipe, this framework's schema)
_base_ = './r50_refinemask_1x.py'
lr_config = dict(step=[16, 22])
total_epochs = 24
