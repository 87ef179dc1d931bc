# default runtime (reference: configs/_base_/default_runtime.py)
checkpoint_config = dict(interval=1)
log_config = dict(interval=50)
log_level = 'INFO'
workflow = [('train', 1)]
work_dir = None
load_from = None
resume_from = None
