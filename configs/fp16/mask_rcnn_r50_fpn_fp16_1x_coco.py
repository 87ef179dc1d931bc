# mixed precision (reference: configs/fp16/mask_rcnn_r50_fpn_fp16_1x_coco.py;
# fp16 static loss scaling maps to bf16 compute with fp32 master weights on
# TPU — engine/train_state.py make_train_step compute_dtype)
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
fp16 = dict(loss_scale=512.)
