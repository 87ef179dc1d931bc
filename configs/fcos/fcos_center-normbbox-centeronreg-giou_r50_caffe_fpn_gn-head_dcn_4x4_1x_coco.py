# (reference: configs/fcos/fcos_center-normbbox-centeronreg-giou_r50_caffe_fpn_gn-head_dcn_4x4_1x_coco.py — same recipe, this framework's schema)
_base_ = './fcos_center-normbbox-centeronreg-giou_r50_caffe_fpn_gn-head_4x4_1x_coco.py'
model = dict(bbox_head=dict(dcn_on_last_conv=True))
