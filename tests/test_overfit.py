"""Overfit accuracy proxy: train the toy DynaMask config on the synthetic
COCO set until segm mAP is high (north-star accuracy evidence above the op
level — the reference's semantics target is
mmdet/models/roi_heads/dynamask_roi_head.py:117-158 end-to-end).

This is the slowest test in the suite (one model compile + ~tens of train
steps on CPU); it lives behind the ``overfit`` marker so the default slow
selection stays bounded: run with ``pytest -m overfit``.
"""

import os
import sys

import numpy as np
import jax
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.overfit]

sys.path.insert(0, os.path.dirname(__file__))


def test_dynamask_overfits_synthetic_coco(tmp_path):
    from test_data import make_synthetic_coco
    from test_integration import toy_cfg
    from dynamask_tpu.apis import train_detector
    from dynamask_tpu.apis.test import single_device_test
    from dynamask_tpu.data import build_dataset
    from dynamask_tpu.models import build_detector

    ann_file, img_dir = make_synthetic_coco(tmp_path, num_imgs=4)
    cfg = toy_cfg(ann_file, img_dir, tmp_path,
                  roi_head_type='DynaMaskRoIHead')
    cfg.model.roi_head.bbox_head['num_classes'] = 2
    cfg.model.roi_head.mask_head['stage_num_classes'] = [2, 2, 2, 1]
    # overfit recipe: higher LR + enough epochs over the 4 images; no decay
    # inside the run (step at the very end). The backbone trains from
    # SCRATCH here, so the imagenet-finetune defaults (frozen random stem,
    # frozen BN statistics) would cripple memorization — unfreeze.
    cfg.model.backbone['frozen_stages'] = -1
    cfg.model.backbone['norm_eval'] = False
    # directly supervise every cascade stage's instance logits: with the
    # faithful last-stage-only quirk, the intermediate per-class stages only
    # learn through the fused-feature side path — far too weak a signal for a
    # 4-image set — and the test-time boundary fusion then overwrites the
    # well-trained class-agnostic final stage with their garbage (measured:
    # person/class-0 masks stayed at init while class 1 absorbed the signal).
    cfg.model.roi_head.mask_head['loss_cfg']['all_stage_instance_loss'] = True
    cfg.optimizer['lr'] = 0.01
    cfg.lr_config.update(step=[1000], warmup_iters=10)
    cfg.total_epochs = 80
    # deterministic pipeline: no flip (4 fixed images, memorize them)
    cfg.data['train']['pipeline'] = [
        t for t in cfg.data['train']['pipeline']
        if t['type'] != 'RandomFlip']

    state = train_detector(cfg, work_dir=str(tmp_path / 'work'), seed=0,
                           devices=jax.devices()[:1])

    det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
    variables = {'params': jax.device_get(state.params),
                 'batch_stats': jax.device_get(state.batch_stats)}
    dataset = build_dataset(dict(cfg.data['test']),
                            default_args=dict(test_mode=True))
    results = single_device_test(det, variables, dataset, samples_per_gpu=2,
                                 mask_canvas=(160, 160), progress=False)
    metrics = dataset.evaluate(results, metric=['bbox', 'segm'])
    print(f"overfit metrics: {metrics}")
    assert metrics['bbox_mAP'] >= 0.6, metrics
    assert metrics['segm_mAP'] >= 0.5, metrics
