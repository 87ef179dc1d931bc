# (reference: configs/legacy_1.x/cascade_mask_rcnn_r50_fpn_1x_coco_v1.py — same recipe, this framework's schema)
_base_ = '../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py'
model = dict(rpn_head=dict(
    anchor_generator=dict(type='LegacyAnchorGenerator',
                          center_offset=0.5),
    bbox_coder=dict(type='LegacyDeltaXYWHBBoxCoder'),
    loss_bbox=dict(type='SmoothL1Loss', beta=0.1111,
                   loss_weight=1.0)))
