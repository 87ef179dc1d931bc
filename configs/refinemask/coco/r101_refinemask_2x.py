_base_ = './r50_refinemask_1x.py'
model = dict(backbone=dict(depth=101))
lr_config = dict(step=[16, 22])
total_epochs = 24
