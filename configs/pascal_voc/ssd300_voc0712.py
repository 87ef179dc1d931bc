# (reference: configs/pascal_voc/ssd300_voc0712.py — same recipe, this framework's schema)
_base_ = '../ssd/ssd300_coco.py'
# VOC anchor recipe (reference ssd300_voc0712: ratio range 0.2-0.9)
model = dict(bbox_head=dict(
    num_classes=20,
    anchor_generator=dict(basesize_ratio_range=(0.2, 0.9))))
data_root = './data/VOCdevkit'
data = dict(
    train=dict(
        _delete_=True,
        type='RepeatDataset', times=10,
        dataset=dict(
            type='VOCDataset',
            ann_file=['VOC2007/ImageSets/Main/trainval.txt',
                      'VOC2012/ImageSets/Main/trainval.txt'],
            img_prefix=['VOC2007/', 'VOC2012/'],
            data_root=data_root,
            pipeline=[
                dict(type='LoadImageFromFile'),
                dict(type='LoadAnnotations', with_bbox=True,
                     with_mask=False),
                dict(type='Resize', img_scale=(300, 300),
                     keep_ratio=False),
                dict(type='RandomFlip', flip_ratio=0.5),
                dict(type='Normalize',
                     mean=[123.675, 116.28, 103.53],
                     std=[1, 1, 1], to_rgb=True),
                dict(type='Pad', size_divisor=1),
            ])),
    val=dict(_delete_=True, type='VOCDataset',
             ann_file='VOC2007/ImageSets/Main/test.txt',
             img_prefix='VOC2007/', data_root=data_root),
    test=dict(_delete_=True, type='VOCDataset',
              ann_file='VOC2007/ImageSets/Main/test.txt',
              img_prefix='VOC2007/', data_root=data_root))
evaluation = dict(interval=1, metric='mAP')
optimizer = dict(type='SGD', lr=1e-3, momentum=0.9,
                 weight_decay=5e-4)
lr_config = dict(policy='step', step=[16, 20])
total_epochs = 24
