"""Root CLI smoke tests: the actual ``python train.py`` / ``python test.py``
processes a user runs (reference: root train.py/test.py), end to end on the
synthetic COCO set. The api-level loops are covered by test_integration.py;
these run the argparse surface, config-file loading, checkpoint handoff and
metric printing through real subprocesses (CPU-forced via JAX_PLATFORMS,
which both CLIs now honor even under a platform-registering sitecustomize).
"""

import json
import glob
import os
import pprint
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_cfg(tmp_path):
    sys.path.insert(0, os.path.dirname(__file__))
    from test_data import make_synthetic_coco
    from test_integration import toy_cfg
    ann_file, img_dir = make_synthetic_coco(tmp_path, num_imgs=4)
    cfg = toy_cfg(ann_file, img_dir, tmp_path)
    cfg_path = tmp_path / 'toy_cfg.py'
    body = ''.join(f'{k} = {pprint.pformat(v, width=100)}\n'
                   for k, v in cfg.to_dict().items())
    cfg_path.write_text(body)
    return str(cfg_path)


def _cli_env():
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    # do NOT inherit the suite's 8-virtual-device XLA_FLAGS — the CLI run
    # should see one CPU device (global batch must fit the 4-image set)
    env.pop('XLA_FLAGS', None)
    # share the suite's persistent compile cache (jax reads these env vars)
    env['JAX_COMPILATION_CACHE_DIR'] = os.path.join(REPO, '.jax_cache')
    env['JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS'] = '5'
    env['JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES'] = '0'
    return env


@pytest.fixture(scope='module')
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('cli')
    cfg_path = _write_cfg(tmp)
    work = tmp / 'work'
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'train.py'), cfg_path,
         '--work-dir', str(work), '--max-steps-per-epoch', '1',
         '--no-validate'],
        cwd=REPO, env=_cli_env(), capture_output=True, text=True,
        timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    return cfg_path, work


class TestTrainCLI:
    def test_logs_and_checkpoint(self, trained):
        _, work = trained
        logs = glob.glob(str(work / '*.log.json'))
        assert logs, 'no json log written'
        rows = [json.loads(l) for l in open(sorted(logs)[-1])]
        train_rows = [r for r in rows if r.get('mode') == 'train']
        assert train_rows and np.isfinite(train_rows[-1]['loss'])
        assert (work / 'epoch_1').exists()
        assert (work / 'latest').exists()


class TestTestCLI:
    def test_eval_from_checkpoint(self, trained, tmp_path):
        cfg_path, work = trained
        out = tmp_path / 'results.json'
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, 'test.py'), cfg_path,
             str(work), '--eval', 'bbox', 'segm', '--out', str(out)],
            cwd=REPO, env=_cli_env(), capture_output=True, text=True,
            timeout=900)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        assert 'bbox_mAP' in r.stdout and 'segm_mAP' in r.stdout
        assert out.exists()
