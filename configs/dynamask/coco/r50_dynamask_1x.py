# DynaMask R50-FPN 1x COCO — port of the reference config
# (reference: configs/dynamask/coco/r50-dynamask-1x.py, flat/self-contained).
# Only the data section differs: static-shape canvases + per-GT mask crops
# replace the reference's DataContainer pipeline.

TARGET_FLOPS = 1.0
DETAIL_LOSS_WEIGHT = 1.0
CB_LOSS_WEIGHT = 0.8
FLOPS_LOSS_WEIGHT = 0.8

model = dict(
    type='MaskRCNN',
    pretrained=None,  # reference points r50 at torchvision resnet101 (quirk)
    backbone=dict(
        type='ResNet',
        depth=50,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
        style='pytorch'),
    neck=dict(
        type='FPN',
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        num_outs=5),
    rpn_head=dict(
        type='RPNHead',
        in_channels=256,
        feat_channels=256,
        anchor_generator=dict(
            type='AnchorGenerator',
            scales=[8],
            ratios=[0.5, 1.0, 2.0],
            strides=[4, 8, 16, 32, 64]),
        bbox_coder=dict(
            type='DeltaXYWHBBoxCoder',
            target_means=[0.0, 0.0, 0.0, 0.0],
            target_stds=[1.0, 1.0, 1.0, 1.0]),
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                      loss_weight=1.0),
        loss_bbox=dict(type='L1Loss', loss_weight=1.0)),
    roi_head=dict(
        type='DynaMaskRoIHead',
        # static admission fractions for the bucketed dynamic-inference
        # path (28/56/112 stages), CALIBRATED from the trained switch's
        # routing demand at full capacity (CAPACITY.json, q=1.0 -> zero
        # clipping on the calibration set; tools/gen_accuracy.py
        # --calibrate-out). bench.py and ACCURACY.json run this SAME
        # operating point.
        dynamic_capacity=(1.0, 1.0, 0.01),
        bbox_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=7, sampling_ratio=0),
            out_channels=256,
            featmap_strides=[4, 8, 16, 32]),
        bbox_head=dict(
            type='Shared2FCBBoxHead',
            in_channels=256,
            fc_out_channels=1024,
            roi_feat_size=7,
            num_classes=80,
            bbox_coder=dict(
                type='DeltaXYWHBBoxCoder',
                target_means=[0.0, 0.0, 0.0, 0.0],
                target_stds=[0.1, 0.1, 0.2, 0.2]),
            reg_class_agnostic=False,
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                          loss_weight=2.0),
            loss_bbox=dict(type='L1Loss', loss_weight=2.0)),
        mask_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=14, sampling_ratio=0),
            out_channels=256,
            featmap_strides=[4, 8, 16, 32]),
        mask_head=dict(
            type='DynaMaskHead',
            num_convs_instance=2,
            num_convs_semantic=4,
            conv_in_channels_instance=256,
            conv_in_channels_semantic=256,
            conv_kernel_size_instance=3,
            conv_kernel_size_semantic=3,
            conv_out_channels_instance=256,
            conv_out_channels_semantic=256,
            conv_cfg=None,
            norm_cfg=None,
            semantic_out_stride=[16, 8, 4],
            mask_use_sigmoid=True,
            pre_upsample_last_stage=False,
            stage_num_classes=[80, 80, 80, 1],
            stage_sup_size=[14, 28, 56, 112],
            upsample_cfg=dict(type='bilinear', scale_factor=2),
            loss_cfg=dict(
                type='DynaCrossEntropyLoss',
                stage_instance_loss_weight=[0.5, 0.75, 0.75, 1.0],
                stage_detail_loss_weight=[0.5, 0.5, 0.5, 0.5],
                detail_loss_weight=DETAIL_LOSS_WEIGHT,
                cb_loss_weight=CB_LOSS_WEIGHT,
                boundary_width=2,
                start_stage=4))))

train_cfg = dict(
    rpn=dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                      neg_iou_thr=0.3, min_pos_iou=0.3,
                      match_low_quality=True, ignore_iof_thr=-1),
        sampler=dict(type='RandomSampler', num=256, pos_fraction=0.5,
                     neg_pos_ub=-1, add_gt_as_proposals=False),
        allowed_border=-1, pos_weight=-1, debug=False),
    rpn_proposal=dict(nms_across_levels=False, nms_pre=2000, nms_post=1000,
                      max_num=1000, nms_thr=0.7, min_bbox_size=0),
    rcnn=dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                      neg_iou_thr=0.5, min_pos_iou=0.5,
                      match_low_quality=True, ignore_iof_thr=-1),
        sampler=dict(type='RandomSampler', num=512, pos_fraction=0.25,
                     neg_pos_ub=-1, add_gt_as_proposals=True),
        flops=[0.23, 0.62, 1.01, 1.4],
        Lambda=0.3,
        mask_size=28,
        pos_weight=-1,
        debug=False))

test_cfg = dict(
    rpn=dict(nms_across_levels=False, nms_pre=1000, nms_post=1000,
             max_num=1000, nms_thr=0.7, min_bbox_size=0),
    rcnn=dict(score_thr=0.05, nms=dict(type='nms', iou_threshold=0.5),
              max_per_img=100, mask_thr_binary=0.5))

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)

# static-shape data pipeline: keep-ratio resize to (1333, 800), orientation
# buckets, per-GT 128x128 mask crops, max 100 GTs per image
data_root = './data/coco'
data = dict(
    samples_per_gpu=4,
    workers_per_gpu=4,
    max_gts=100,
    mask_crop_size=128,
    train=dict(
        type='CocoDataset',
        ann_file='annotations/instances_train2017.json',
        img_prefix='train2017',
        data_root=data_root,
        pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='LoadAnnotations', with_bbox=True, with_mask=True,
                 poly2mask=False),
            dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
            dict(type='RandomFlip', flip_ratio=0.5),
            dict(type='Normalize', **img_norm_cfg),
            dict(type='Pad', size_divisor=32),
        ]),
    val=dict(
        type='CocoDataset',
        ann_file='annotations/instances_val2017.json',
        img_prefix='val2017',
        data_root=data_root,
        pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
            dict(type='Normalize', **img_norm_cfg),
            dict(type='Pad', size_divisor=32),
        ]),
    test=dict(
        type='CocoDataset',
        ann_file='annotations/instances_val2017.json',
        img_prefix='val2017',
        data_root=data_root,
        pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
            dict(type='Normalize', **img_norm_cfg),
            dict(type='Pad', size_divisor=32),
        ]))

evaluation = dict(metric=['bbox', 'segm'], classwise=True, interval=12)
optimizer = dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2),
                        msm_grad_scale=None)  # set 0.05 for OptimizerHook_
total_epochs = 12
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.001, step=[8, 11])
checkpoint_config = dict(interval=1)
log_config = dict(interval=50)
log_level = 'INFO'
workflow = [('train', 1)]
work_dir = None
load_from = None
resume_from = None
