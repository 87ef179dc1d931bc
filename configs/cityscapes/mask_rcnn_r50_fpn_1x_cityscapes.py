# (reference: configs/cityscapes/mask_rcnn_r50_fpn_1x_cityscapes.py)
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
model = dict(roi_head=dict(bbox_head=dict(num_classes=8),
                           mask_head=dict(num_classes=8)))
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
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
    train=dict(type='RepeatDataset', times=8, dataset=dict(
        type='CityscapesDataset',
        ann_file='annotations/instancesonly_filtered_gtFine_train.json',
        img_prefix='leftImg8bit/train', data_root=data_root,
        pipeline=train_pipeline)),
    val=dict(type='CityscapesDataset',
             ann_file='annotations/instancesonly_filtered_gtFine_val.json',
             img_prefix='leftImg8bit/val', data_root=data_root,
             pipeline=test_pipeline),
    test=dict(type='CityscapesDataset',
              ann_file='annotations/instancesonly_filtered_gtFine_val.json',
              img_prefix='leftImg8bit/val', data_root=data_root,
              pipeline=test_pipeline))
optimizer = dict(lr=0.01)
lr_config = dict(step=[7])
total_epochs = 8
