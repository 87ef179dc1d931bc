# Hybrid Task Cascade R-50-FPN 1x COCO.
# Mirrors the reference schema (reference: configs/htc/htc_r50_fpn_1x_coco.py
# + htc_without_semantic_r50_fpn_1x_coco.py).
_base_ = '../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py'

_stage_head = dict(
    type='Shared2FCBBoxHead', in_channels=256, fc_out_channels=1024,
    roi_feat_size=7, num_classes=80, reg_class_agnostic=True,
    loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                  loss_weight=1.0),
    loss_bbox=dict(type='SmoothL1Loss', beta=1.0, loss_weight=1.0))
_mask_head = dict(
    type='HTCMaskHead', num_convs=4, in_channels=256,
    conv_out_channels=256, num_classes=80,
    loss_mask=dict(type='CrossEntropyLoss', use_mask=True, loss_weight=1.0))

model = dict(
    type='HybridTaskCascade',
    roi_head=dict(
        _delete_=True,
        type='HybridTaskCascadeRoIHead',
        interleaved=True,
        mask_info_flow=True,
        num_stages=3,
        stage_loss_weights=[1, 0.5, 0.25],
        bbox_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=7, sampling_ratio=0),
            out_channels=256, featmap_strides=[4, 8, 16, 32]),
        bbox_head=[
            dict(bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                 target_means=[0., 0., 0., 0.],
                                 target_stds=[0.1, 0.1, 0.2, 0.2]),
                 **_stage_head),
            dict(bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                 target_means=[0., 0., 0., 0.],
                                 target_stds=[0.05, 0.05, 0.1, 0.1]),
                 **_stage_head),
            dict(bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                 target_means=[0., 0., 0., 0.],
                                 target_stds=[0.033, 0.033, 0.067, 0.067]),
                 **_stage_head),
        ],
        mask_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=14, sampling_ratio=0),
            out_channels=256, featmap_strides=[4, 8, 16, 32]),
        mask_head=[
            dict(with_conv_res=False, **_mask_head),
            dict(**_mask_head),
            dict(**_mask_head),
        ],
        semantic_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=14, sampling_ratio=0),
            out_channels=256, featmap_strides=[8]),
        semantic_head=dict(
            type='FusedSemanticHead', num_ins=5, fusion_level=1, num_convs=4,
            in_channels=256, conv_out_channels=256, num_classes=183,
            ignore_label=255, loss_weight=0.2)))
