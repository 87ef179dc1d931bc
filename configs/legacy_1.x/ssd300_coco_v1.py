# (reference: configs/legacy_1.x/ssd300_coco_v1.py)
_base_ = '../ssd/ssd300_coco.py'
model = dict(bbox_head=dict(
    anchor_generator=dict(type='LegacySSDAnchorGenerator'),
    bbox_coder=dict(type='LegacyDeltaXYWHBBoxCoder')))
