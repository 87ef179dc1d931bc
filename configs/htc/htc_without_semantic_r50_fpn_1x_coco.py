# (reference: configs/htc/htc_without_semantic_r50_fpn_1x_coco.py — same recipe, this framework's schema)
_base_ = './htc_r50_fpn_1x_coco.py'
model = dict(roi_head=dict(semantic_roi_extractor=None,
                           semantic_head=None))
