# (reference: configs/pascal_voc/retinanet_r50_fpn_1x_voc0712.py — same recipe, this framework's schema)
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
model = dict(bbox_head=dict(num_classes=20))
data_root = './data/VOCdevkit'
data = dict(
    train=dict(
        _delete_=True,
        type='RepeatDataset', times=3,
        dataset=dict(
            type='VOCDataset',
            ann_file=['VOC2007/ImageSets/Main/trainval.txt',
                      'VOC2012/ImageSets/Main/trainval.txt'],
            img_prefix=['VOC2007/', 'VOC2012/'],
            data_root=data_root)),
    val=dict(_delete_=True, type='VOCDataset',
             ann_file='VOC2007/ImageSets/Main/test.txt',
             img_prefix='VOC2007/', data_root=data_root),
    test=dict(_delete_=True, type='VOCDataset',
              ann_file='VOC2007/ImageSets/Main/test.txt',
              img_prefix='VOC2007/', data_root=data_root))
evaluation = dict(interval=1, metric='mAP')
optimizer = dict(type='SGD', lr=0.01, momentum=0.9,
                 weight_decay=0.0001)
lr_config = dict(policy='step', step=[3])
total_epochs = 4
