# (reference: configs/hrnet/fcos_hrnetv2p_w40_gn-head_mstrain_640-800_4x4_2x_coco.py — same recipe, this framework's schema)
_base_ = '../fcos/fcos_r50_fpn_1x_coco.py'
model = dict(
    pretrained='open-mmlab://msra/hrnetv2_w40',
    backbone=dict(
        _delete_=True,
        type='HRNet',
        extra=dict(
            stage1=dict(num_modules=1, num_branches=1,
                        block='BOTTLENECK', num_blocks=(4,),
                        num_channels=(64,)),
            stage2=dict(num_modules=1, num_branches=2,
                        block='BASIC', num_blocks=(4, 4),
                        num_channels=(40, 80)),
            stage3=dict(num_modules=4, num_branches=3,
                        block='BASIC', num_blocks=(4, 4, 4),
                        num_channels=(40, 80, 160)),
            stage4=dict(num_modules=3, num_branches=4,
                        block='BASIC', num_blocks=(4, 4, 4, 4),
                        num_channels=(40, 80, 160, 320)))),
    neck=dict(
        _delete_=True,
        type='HRFPN', in_channels=[40, 80, 160, 320],
        out_channels=256, stride=2, num_outs=5))
data = dict(samples_per_gpu=4, workers_per_gpu=4)
lr_config = dict(step=[16, 22])
total_epochs = 24
img_norm_cfg = dict(mean=[102.9801, 115.9465, 122.7717],
                    std=[1.0, 1.0, 1.0], to_rgb=False)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=[(1333, 640), (1333, 800)],
         multiscale_mode='value', keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
data = dict(train=dict(pipeline=train_pipeline))
