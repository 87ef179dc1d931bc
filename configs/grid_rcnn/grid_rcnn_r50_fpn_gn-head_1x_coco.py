# (reference: configs/grid_rcnn/grid_rcnn_r50_fpn_gn-head_1x_coco.py — same recipe, this framework's schema)
_base_ = './grid_rcnn_r50_fpn_gn-head_2x_coco.py'
lr_config = dict(step=[8, 11], warmup_iters=3665,
                 warmup_ratio=1.0 / 80)
total_epochs = 12
