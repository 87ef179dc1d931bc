# Mask R-CNN Res2Net-101 FPN 2x COCO
# (reference: configs/res2net/mask_rcnn_r2_101_fpn_2x_coco.py).
_base_ = ['../_base_/models/mask_rcnn_r50_fpn.py',
          '../_base_/datasets/coco_instance.py',
          '../_base_/schedules/schedule_1x.py',
          '../_base_/default_runtime.py']
model = dict(
    pretrained='open-mmlab://res2net101_v1d_26w_4s',
    backbone=dict(type='Res2Net', depth=101, scales=4, base_width=26))
lr_config = dict(step=[16, 22])
total_epochs = 24
