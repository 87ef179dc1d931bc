# (reference: configs/fcos/fcos_r50_caffe_fpn_gn-head_4x4_1x_coco.py — same recipe, this framework's schema)
_base_ = './fcos_r50_fpn_1x_coco.py'
model = dict(
    pretrained='open-mmlab://detectron/resnet50_caffe',
    backbone=dict(norm_cfg=dict(requires_grad=False), style='caffe'),
    bbox_head=dict(norm_cfg=dict(type='GN', num_groups=32,
                                 requires_grad=True)))
img_norm_cfg = dict(mean=[102.9801, 115.9465, 122.7717],
                    std=[1.0, 1.0, 1.0], to_rgb=False)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
data = dict(samples_per_gpu=4, workers_per_gpu=4,
            train=dict(pipeline=train_pipeline),
            val=dict(pipeline=test_pipeline),
            test=dict(pipeline=test_pipeline))
optimizer = dict(lr=0.01, paramwise_cfg=dict(bias_lr_mult=2.,
                                             bias_decay_mult=0.))
lr_config = dict(warmup_ratio=1.0 / 3)
