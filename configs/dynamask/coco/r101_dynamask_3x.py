# DynaMask R101 3x COCO with multi-scale training (BASELINE.json config #3)
_base_ = './r50_dynamask_1x.py'
model = dict(backbone=dict(depth=101))
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
data = dict(
    train=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True, with_mask=True,
             poly2mask=False),
        dict(type='Resize', img_scale=[(1333, 640), (1333, 800)],
             multiscale_mode='range', keep_ratio=True),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize', **img_norm_cfg),
        dict(type='Pad', size_divisor=32),
    ]))
lr_config = dict(step=[28, 34])
total_epochs = 36
