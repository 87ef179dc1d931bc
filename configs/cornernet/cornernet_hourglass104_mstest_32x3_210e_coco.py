# (reference: configs/cornernet/cornernet_hourglass104_mstest_32x3_210e_coco.py — same recipe, this framework's schema)
_base_ = './cornernet_hourglass104_mstest_8x6_210e_coco.py'
# 32 hosts x 3 imgs/device variant — only the data layout differs
data = dict(samples_per_gpu=3, workers_per_gpu=3)
