# (reference: configs/lvis/mask_rcnn_r50_fpn_sample1e-3_mstrain_2x_lvis_v0.5.py — same recipe, this framework's schema)
_base_ = './mask_rcnn_r50_fpn_sample1e-3_mstrain_1x_lvis_v1.py'
model = dict(roi_head=dict(bbox_head=dict(num_classes=1230),
                           mask_head=dict(num_classes=1230)))
data_root = './data/lvis'
data = dict(
    train=dict(dataset=dict(
        type='LVISV05Dataset',
        ann_file='annotations/lvis_v0.5_train.json',
        img_prefix='train2017', data_root=data_root)),
    val=dict(type='LVISV05Dataset',
             ann_file='annotations/lvis_v0.5_val.json',
             img_prefix='val2017', data_root=data_root),
    test=dict(type='LVISV05Dataset',
              ann_file='annotations/lvis_v0.5_val.json',
              img_prefix='val2017', data_root=data_root))
lr_config = dict(step=[16, 22])
total_epochs = 24
