# (reference: configs/mask_rcnn/mask_rcnn_r50_fpn_poly_1x_coco.py — same recipe, this framework's schema)
_base_ = './mask_rcnn_r50_fpn_1x_coco.py'
# poly2mask=False is this framework's default instance pipeline
