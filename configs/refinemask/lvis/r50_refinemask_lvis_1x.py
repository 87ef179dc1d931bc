# RefineMask on LVIS v1 (reference: configs/refinemask/lvis/)
_base_ = '../coco/r50_refinemask_1x.py'
model = dict(
    roi_head=dict(
        bbox_head=dict(num_classes=1203),
        mask_head=dict(stage_num_classes=[1203, 1203, 1203, 1],
                       mask_use_sigmoid=True)))
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True,
         poly2mask=False),
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
data_root = './data/lvis'
data = dict(
    train=dict(_delete_=True, type='ClassBalancedDataset',
               oversample_thr=0.001,
               dataset=dict(type='LVISV1Dataset',
                            ann_file='annotations/lvis_v1_train.json',
                            img_prefix='', data_root=data_root,
                            with_semantic=True, pipeline=train_pipeline)),
    test=dict(_delete_=True, type='LVISV1Dataset',
              ann_file='annotations/lvis_v1_val.json',
              img_prefix='', data_root=data_root, pipeline=test_pipeline))
test_cfg = dict(rcnn=dict(score_thr=0.0001, max_per_img=300))
