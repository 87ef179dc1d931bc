# PointRefine R50 1x (reference: configs/point_refine/r50-point-refine-1x.py)
_base_ = ['../_base_/models/mask_rcnn_r50_fpn.py',
          '../_base_/datasets/coco_instance.py',
          '../_base_/schedules/schedule_1x.py',
          '../_base_/default_runtime.py']
model = dict(
    roi_head=dict(
        type='PointRefineRoIHead',
        mask_head=dict(
            _delete_=True,
            type='PointRefineMaskHead',
            num_convs_instance=2,
            num_convs_semantic=4,
            num_fcs=3,
            conv_out_channels_instance=256,
            conv_out_channels_semantic=256,
            semantic_out_stride=4,
            mask_use_sigmoid=True,
            coarse_pred_each_layer=True,
            stage_num_classes=[80, 80, 80, 1],
            stage_sup_size=[14, 28, 56, 112],
            num_points=196,
            loss_cfg=dict(type='PointRefineCrossEntropyLoss',
                          stage_instance_loss_weight=[0.5, 0.5, 0.5, 0.5],
                          semantic_loss_weight=1.0,
                          detail_loss_weight=1.0,
                          boundary_width=2,
                          start_stage=4))))
data = dict(train=dict(with_semantic=True))
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
