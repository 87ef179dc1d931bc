# (reference: configs/pascal_voc/faster_rcnn_r50_fpn_1x_voc0712.py)
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(roi_head=dict(bbox_head=dict(num_classes=20)))
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(1000, 600), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='Resize', img_scale=(1000, 600), keep_ratio=True),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
data_root = './data/VOCdevkit'
data = dict(
    train=dict(_delete_=True, type='RepeatDataset', times=3,
               dataset=dict(
                   type='ConcatDataset',
                   datasets=[
                       dict(type='VOCDataset',
                            ann_file='VOC2007/ImageSets/Main/trainval.txt',
                            img_prefix='VOC2007', data_root=data_root,
                            pipeline=train_pipeline),
                       dict(type='VOCDataset',
                            ann_file='VOC2012/ImageSets/Main/trainval.txt',
                            img_prefix='VOC2012', data_root=data_root,
                            pipeline=train_pipeline),
                   ])),
    val=dict(_delete_=True, type='VOCDataset',
             ann_file='VOC2007/ImageSets/Main/test.txt',
             img_prefix='VOC2007', data_root=data_root,
             pipeline=test_pipeline),
    test=dict(_delete_=True, type='VOCDataset',
              ann_file='VOC2007/ImageSets/Main/test.txt',
              img_prefix='VOC2007', data_root=data_root,
              pipeline=test_pipeline))
evaluation = dict(metric='mAP', interval=1)
# actual epoch = 4 * 3 = 12 (RepeatDataset times=3)
lr_config = dict(step=[3])
total_epochs = 4
