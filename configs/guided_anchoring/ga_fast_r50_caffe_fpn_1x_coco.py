# (reference: configs/guided_anchoring/ga_fast_r50_caffe_fpn_1x_coco.py — same recipe, this framework's schema)
_base_ = '../fast_rcnn/fast_rcnn_r50_caffe_fpn_1x_coco.py'
# Fast R-CNN trained on precomputed GA-RPN proposals (reference
# ga_fast_r50_caffe_fpn_1x_coco.py: proposal_file from ga_rpn)
data = dict(
    train=dict(proposal_file='proposals/ga_rpn_r50_fpn_1x_train2017.pkl'),
    val=dict(proposal_file='proposals/ga_rpn_r50_fpn_1x_val2017.pkl'),
    test=dict(proposal_file='proposals/ga_rpn_r50_fpn_1x_val2017.pkl'))
