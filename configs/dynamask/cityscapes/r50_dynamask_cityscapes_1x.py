# DynaMask on Cityscapes fine instance seg (BASELINE.json config #5)
_base_ = '../coco/r50_dynamask_1x.py'
model = dict(
    roi_head=dict(
        bbox_head=dict(num_classes=8),
        mask_head=dict(stage_num_classes=[8, 8, 8, 1])))
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True,
         poly2mask=False),
    dict(type='Resize', img_scale=[(2048, 800), (2048, 1024)],
         multiscale_mode='range', keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='Resize', img_scale=(2048, 1024), keep_ratio=True),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
data_root = './data/cityscapes'
data = dict(
    samples_per_gpu=1,
    train=dict(_delete_=True, type='CityscapesDataset',
               ann_file='annotations/instancesonly_filtered_gtFine_train.json',
               img_prefix='leftImg8bit/train', data_root=data_root,
               pipeline=train_pipeline),
    test=dict(_delete_=True, type='CityscapesDataset',
              ann_file='annotations/instancesonly_filtered_gtFine_val.json',
              img_prefix='leftImg8bit/val', data_root=data_root,
              pipeline=test_pipeline))
lr_config = dict(step=[18, 22])
total_epochs = 24
