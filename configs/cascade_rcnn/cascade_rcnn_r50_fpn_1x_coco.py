# (reference: configs/cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py — same recipe, this framework's schema)
_base_ = './cascade_mask_rcnn_r50_fpn_1x_coco.py'
model = dict(roi_head=dict(mask_roi_extractor=None, mask_head=None))
evaluation = dict(metric=['bbox'])
