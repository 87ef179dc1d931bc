# (reference: configs/retinanet/retinanet_r101_fpn_2x_coco.py — same recipe, this framework's schema)
_base_ = './retinanet_r101_fpn_1x_coco.py'
lr_config = dict(step=[16, 22])
total_epochs = 24
