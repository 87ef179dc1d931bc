_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
model = dict(type='FasterRCNN',
             roi_head=dict(mask_roi_extractor=None, mask_head=None))
