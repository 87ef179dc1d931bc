# (reference: configs/wider_face/ssd300_wider_face.py)
_base_ = '../ssd/ssd300_coco.py'
model = dict(bbox_head=dict(num_classes=1))
data_root = './data/WIDERFace'
data = dict(
    train=dict(type='WIDERFaceDataset', data_root=data_root,
               ann_file='train.txt', img_prefix='WIDER_train'),
    val=dict(type='WIDERFaceDataset', data_root=data_root,
             ann_file='val.txt', img_prefix='WIDER_val'),
    test=dict(type='WIDERFaceDataset', data_root=data_root,
              ann_file='val.txt', img_prefix='WIDER_val'))
evaluation = dict(metric='mAP', interval=1)
optimizer = dict(lr=0.012)
lr_config = dict(step=[16, 20])
total_epochs = 24
