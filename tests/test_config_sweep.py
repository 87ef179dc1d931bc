"""Config sweep: load and BUILD every config in configs/ — the reference's
registry/config drift catcher (tests/test_config.py:357 strategy)."""

import glob
import os

import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.utils.config import Config
from dynamask_tpu.models import build_detector
import dynamask_tpu.data  # noqa: F401 — registers datasets/pipelines

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), '..', 'configs')
ALL_CONFIGS = sorted(
    p for p in glob.glob(os.path.join(CONFIG_ROOT, '**', '*.py'),
                         recursive=True)
    if '_base_' not in p)


@pytest.mark.parametrize('cfg_path', ALL_CONFIGS,
                         ids=[os.path.relpath(p, CONFIG_ROOT)
                              for p in ALL_CONFIGS])
def test_config_builds(cfg_path):
    cfg = Config.fromfile(cfg_path)
    assert 'model' in cfg
    det = build_detector(cfg.model, cfg.get('train_cfg'), cfg.get('test_cfg'))
    assert det is not None
    # data section must name a registered dataset type
    if 'data' in cfg:
        from dynamask_tpu.utils.registry import DATASETS
        for split in ('train', 'test'):
            if split in cfg.data:
                t = cfg.data[split]['type']
                if t in ('RepeatDataset', 'ClassBalancedDataset',
                         'ConcatDataset'):
                    t = cfg.data[split].get(
                        'dataset', {'type': 'CocoDataset'})['type']
                assert t in DATASETS, t
