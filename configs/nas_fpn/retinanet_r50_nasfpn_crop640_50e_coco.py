# NAS-FPN RetinaNet with the SepBN head (reference:
# configs/nas_fpn/retinanet_r50_nasfpn_crop640_50e_coco.py)
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
model = dict(
    neck=dict(_delete_=True, type='NASFPN',
              in_channels=[512, 1024, 2048], out_channels=256,
              num_outs=5, stack_times=7, start_level=1,
              add_extra_convs=True),
    bbox_head=dict(type='RetinaSepBNHead', num_ins=5, norm_cfg=None))
optimizer = dict(lr=0.08, paramwise_cfg=dict(norm_decay_mult=0,
                                             bypass_duplicate=True))
