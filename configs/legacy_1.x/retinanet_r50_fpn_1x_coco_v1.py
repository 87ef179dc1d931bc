# v1.x-compatible anchors/coder (reference:
# configs/legacy_1.x/retinanet_r50_fpn_1x_coco_v1.py)
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
model = dict(bbox_head=dict(
    anchor_generator=dict(type='LegacyAnchorGenerator', center_offset=0.5),
    bbox_coder=dict(type='LegacyDeltaXYWHBBoxCoder'),
    loss_bbox=dict(type='SmoothL1Loss', beta=0.11, loss_weight=1.0)))
