# (reference: configs/rpn/rpn_r50_caffe_c4_1x_coco.py — same recipe, this framework's schema)
_base_ = '../faster_rcnn/faster_rcnn_r50_caffe_c4_1x_coco.py'
model = dict(type='RPN', roi_head=None)
evaluation = dict(interval=1, metric='proposal_fast')
