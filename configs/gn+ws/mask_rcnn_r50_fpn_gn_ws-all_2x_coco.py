# GN + weight standardization
# (reference: configs/gn+ws/mask_rcnn_r50_fpn_gn_ws-all_2x_coco.py)
_base_ = '../gn/mask_rcnn_r50_fpn_gn-all_2x_coco.py'
conv_cfg = dict(type='ConvWS')
model = dict(backbone=dict(conv_cfg=conv_cfg))
