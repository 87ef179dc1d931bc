# RefineMask R50 1x COCO (reference: configs/refinemask/coco/r50-refinemask-1x.py)
_base_ = ['../../_base_/models/mask_rcnn_r50_fpn.py',
          '../../_base_/datasets/coco_instance.py',
          '../../_base_/schedules/schedule_1x.py',
          '../../_base_/default_runtime.py']
model = dict(
    roi_head=dict(
        type='RefineRoIHead',
        mask_head=dict(
            _delete_=True,
            type='RefineMaskHead',
            num_convs_instance=2,
            num_convs_semantic=4,
            conv_in_channels_instance=256,
            conv_in_channels_semantic=256,
            conv_out_channels_instance=256,
            conv_out_channels_semantic=256,
            semantic_out_stride=4,
            fusion_type='MultiBranchFusion',
            dilations=[1, 3, 5],
            mask_use_sigmoid=True,
            stage_num_classes=[80, 80, 80, 80],
            stage_sup_size=[14, 28, 56, 112],
            loss_cfg=dict(type='BARCrossEntropyLoss',
                          stage_instance_loss_weight=[0.25, 0.5, 0.75, 1.0],
                          semantic_loss_weight=1.0,
                          boundary_width=2,
                          start_stage=1))))
data = dict(train=dict(with_semantic=True))
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
