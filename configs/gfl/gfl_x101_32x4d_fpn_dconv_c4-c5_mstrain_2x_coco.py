# (reference: configs/gfl/gfl_x101_32x4d_fpn_dconv_c4-c5_mstrain_2x_coco.py — same recipe, this framework's schema)
_base_ = './gfl_r50_fpn_mstrain_2x_coco.py'
model = dict(
    pretrained='open-mmlab://resnext101_32x4d',
    backbone=dict(type='ResNeXt', depth=101, groups=32, base_width=4,
                  dcn=dict(type='DCN', deform_groups=1),
                  stage_with_dcn=(False, False, True, True)))
