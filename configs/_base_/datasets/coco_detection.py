# COCO detection data (reference: configs/_base_/datasets/coco_detection.py,
# recast as static-shape canvases)
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
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
data_root = './data/coco'
data = dict(
    samples_per_gpu=4,
    workers_per_gpu=4,
    max_gts=100,
    train=dict(type='CocoDataset',
               ann_file='annotations/instances_train2017.json',
               img_prefix='train2017', data_root=data_root,
               pipeline=train_pipeline),
    val=dict(type='CocoDataset',
             ann_file='annotations/instances_val2017.json',
             img_prefix='val2017', data_root=data_root,
             pipeline=test_pipeline),
    test=dict(type='CocoDataset',
              ann_file='annotations/instances_val2017.json',
              img_prefix='val2017', data_root=data_root,
              pipeline=test_pipeline))
evaluation = dict(metric=['bbox'], interval=1)
