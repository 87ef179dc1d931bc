# (reference: configs/reppoints/bbox_r50_grid_fpn_gn-neck+head_1x_coco.py — same recipe, this framework's schema)
_base_ = './reppoints_moment_r50_fpn_gn-neck+head_1x_coco.py'
model = dict(bbox_head=dict(transform_method='minmax',
                            use_grid_points=True))
# the reference trains this variant with an anchor-style MaxIoU init
# assigner; the PointAssigner path is kept (single-controller static form)
