"""Full-stack integration: synthetic COCO -> train steps -> checkpoint ->
test loop -> COCO evaluation. The closest equivalent of actually running the
reference's train.py/test.py CLIs (which its own tests never did)."""

import json
import os

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.utils.config import Config


def toy_cfg(ann_file, img_dir, tmp_path, roi_head_type='StandardRoIHead'):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_models import mini_mask_rcnn_cfg
    from test_dynamask import dynamask_toy_cfg
    if roi_head_type == 'StandardRoIHead':
        model, train_cfg, test_cfg = mini_mask_rcnn_cfg(num_classes=2)
        model['roi_head']['bbox_head']['num_classes'] = 2
        model['roi_head']['mask_head']['num_classes'] = 2
    else:
        model, train_cfg, test_cfg = dynamask_toy_cfg()

    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
        dict(type='Resize', img_scale=(160, 128), keep_ratio=True),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375], to_rgb=True),
        dict(type='Pad', size_divisor=32),
    ]
    test_pipeline = [t for t in pipeline
                     if t['type'] not in ('RandomFlip', 'LoadAnnotations')]
    data = dict(
        samples_per_gpu=2, workers_per_gpu=2, max_gts=8, mask_crop_size=32,
        train=dict(type='CocoDataset', ann_file=ann_file,
                   img_prefix=img_dir, pipeline=pipeline,
                   canvases=[(128, 160), (160, 128)], max_gts=8,
                   mask_crop_size=32,
                   classes=['person', 'car']),
        test=dict(type='CocoDataset', ann_file=ann_file,
                  img_prefix=img_dir, pipeline=test_pipeline, test_mode=True,
                  canvases=[(128, 160), (160, 128)],
                  classes=['person', 'car']))
    return Config(dict(
        model=model, train_cfg=train_cfg, test_cfg=test_cfg, data=data,
        optimizer=dict(type='SGD', lr=0.002, momentum=0.9,
                       weight_decay=0.0001),
        optimizer_config=dict(grad_clip=dict(max_norm=35, norm_type=2)),
        lr_config=dict(policy='step', warmup='linear', warmup_iters=5,
                       warmup_ratio=0.001, step=[1]),
        total_epochs=1, log_config=dict(interval=1),
        checkpoint_config=dict(interval=1),
        work_dir=str(tmp_path / 'work')))


@pytest.mark.parametrize('roi_head_type', ['StandardRoIHead',
                                           'DynaMaskRoIHead'])
def test_train_and_eval_loop(tmp_path, roi_head_type):
    from test_data import make_synthetic_coco
    from dynamask_tpu.apis import train_detector
    from dynamask_tpu.apis.test import single_device_test
    from dynamask_tpu.data import build_dataset
    from dynamask_tpu.models import build_detector

    ann_file, img_dir = make_synthetic_coco(tmp_path, num_imgs=4)
    cfg = toy_cfg(ann_file, img_dir, tmp_path, roi_head_type)
    if roi_head_type == 'DynaMaskRoIHead':
        # the toy dynamask cfg has 8 classes; synthetic data uses 2
        cfg.model.roi_head.bbox_head['num_classes'] = 2
        cfg.model.roi_head.mask_head['stage_num_classes'] = [2, 2, 2, 1]

    # single device: the 8-virtual-device conftest mesh would scale the
    # global batch past this 4-image toy dataset (sharded-vs-single parity
    # has its own test in test_sharded.py)
    state = train_detector(cfg, work_dir=str(tmp_path / 'work'), seed=0,
                           max_steps_per_epoch=2,
                           devices=jax.devices()[:1])
    assert int(np.asarray(state.step)) == 2
    assert (tmp_path / 'work' / 'epoch_1').exists()
    assert (tmp_path / 'work' / 'latest').exists()

    # eval loop with the trained params
    det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    dataset = build_dataset(dict(cfg.data['test']),
                            default_args=dict(test_mode=True))
    results = single_device_test(det, variables, dataset, samples_per_gpu=2,
                                 mask_canvas=(160, 160), progress=False)
    assert len(results) == 4
    metrics = dataset.evaluate(results, metric=['bbox', 'segm'])
    assert 'bbox_mAP' in metrics and 'segm_mAP' in metrics
    assert np.isfinite(metrics['bbox_mAP'])


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from dynamask_tpu.engine import (build_optimizer, create_train_state)
    from dynamask_tpu.engine.checkpoint import (save_checkpoint,
                                                load_checkpoint,
                                                load_params_only)

    params = {'w': jnp.arange(4.0), 'b': jnp.ones(2)}
    tx = build_optimizer(params, base_lr=0.1)
    state = create_train_state({'params': params, 'batch_stats': {}}, tx)
    state = state._replace(step=jnp.asarray(7, jnp.int32))

    save_checkpoint(str(tmp_path), state, epoch=3, meta={'CLASSES': ['a']})
    restored, meta = load_checkpoint(str(tmp_path), state)
    assert meta['epoch'] == 3
    np.testing.assert_array_equal(np.asarray(restored.params['w']),
                                  np.arange(4.0))
    assert int(np.asarray(restored.step)) == 7

    p, _ = load_params_only(str(tmp_path), params)
    np.testing.assert_array_equal(np.asarray(p['b']), np.ones(2))
