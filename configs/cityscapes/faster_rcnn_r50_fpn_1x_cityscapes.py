# (reference: configs/cityscapes/faster_rcnn_r50_fpn_1x_cityscapes.py — same recipe, this framework's schema)
_base_ = './mask_rcnn_r50_fpn_1x_cityscapes.py'
model = dict(roi_head=dict(mask_roi_extractor=None, mask_head=None))
evaluation = dict(metric=['bbox'])
