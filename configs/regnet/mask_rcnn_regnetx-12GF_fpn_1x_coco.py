# (reference: configs/regnet/mask_rcnn_regnetx-12GF_fpn_1x_coco.py — same recipe, this framework's schema)
_base_ = './mask_rcnn_regnetx-3.2GF_fpn_1x_coco.py'
model = dict(
    pretrained='open-mmlab://regnetx_12gf',
    backbone=dict(
        _delete_=True,
        type='RegNet',
        arch='regnetx_12gf',
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_cfg=dict(type='BN', requires_grad=True),
        norm_eval=True,
        style='pytorch'),
    neck=dict(type='FPN', in_channels=[224, 448, 896, 2240],
              out_channels=256, num_outs=5))
img_norm_cfg = dict(mean=[103.53, 116.28, 123.675],
                    std=[57.375, 57.12, 58.395], to_rgb=False)
optimizer = dict(type='SGD', lr=0.02, momentum=0.9,
                 weight_decay=0.00005)
