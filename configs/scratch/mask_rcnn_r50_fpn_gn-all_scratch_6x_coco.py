# (reference: configs/scratch/mask_rcnn_r50_fpn_gn-all_scratch_6x_coco.py — same recipe, this framework's schema)
_base_ = '../gn+ws/mask_rcnn_r50_fpn_gn_ws-all_2x_coco.py'
norm_cfg = dict(type='GN', num_groups=32, requires_grad=True)
model = dict(
    pretrained=None,
    backbone=dict(frozen_stages=-1, zero_init_residual=False,
                  norm_cfg=norm_cfg, conv_cfg=None))
optimizer = dict(paramwise_cfg=dict(norm_decay_mult=0))
lr_config = dict(warmup_ratio=0.1, step=[65, 71])
total_epochs = 73
