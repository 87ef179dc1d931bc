# Fast R-CNN R-50-FPN 1x COCO (precomputed proposals)
# (reference: configs/fast_rcnn/fast_rcnn_r50_fpn_1x_coco.py).
_base_ = ['../_base_/datasets/coco_instance.py',
          '../_base_/schedules/schedule_1x.py',
          '../_base_/default_runtime.py']
model = dict(
    type='FastRCNN',
    pretrained='torchvision://resnet50',
    backbone=dict(type='ResNet', depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_eval=True, style='pytorch'),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, num_outs=5),
    roi_head=dict(
        type='StandardRoIHead',
        bbox_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=7,
                           sampling_ratio=0),
            out_channels=256, featmap_strides=[4, 8, 16, 32]),
        bbox_head=dict(
            type='Shared2FCBBoxHead', in_channels=256,
            fc_out_channels=1024, roi_feat_size=7, num_classes=80,
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0., 0., 0., 0.],
                            target_stds=[0.1, 0.1, 0.2, 0.2]),
            reg_class_agnostic=False,
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                          loss_weight=1.0),
            loss_bbox=dict(type='L1Loss', loss_weight=1.0))))
train_cfg = dict(
    rcnn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                            neg_iou_thr=0.5, min_pos_iou=0.5,
                            match_low_quality=False, ignore_iof_thr=-1),
              sampler=dict(type='RandomSampler', num=512, pos_fraction=0.25,
                           neg_pos_ub=-1, add_gt_as_proposals=True),
              pos_weight=-1, debug=False))
test_cfg = dict(rcnn=dict(score_thr=0.05,
                          nms=dict(type='nms', iou_threshold=0.5),
                          max_per_img=100))
optimizer = dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=0.0001)
# precomputed proposals (reference fast_rcnn config: LoadProposals +
# data.*.proposal_file)
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadProposals', num_max_proposals=2000),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadProposals', num_max_proposals=None),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
data = dict(
    train=dict(proposal_file='proposals/rpn_r50_fpn_1x_train2017.pkl',
               pipeline=train_pipeline),
    val=dict(proposal_file='proposals/rpn_r50_fpn_1x_val2017.pkl',
             pipeline=test_pipeline),
    test=dict(proposal_file='proposals/rpn_r50_fpn_1x_val2017.pkl',
              pipeline=test_pipeline))
evaluation = dict(metric=['bbox'])
