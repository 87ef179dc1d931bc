"""2-process multi-host test on localhost (CPU, Gloo collectives).

Turns the multi-host code paths — ``jax.distributed.initialize``
(train.py:50), the multi-process ``place`` branch
(engine/train_state.py:207-219), per-process loader sharding and
``process_allgather`` eval collection (apis/test.py:254-280) — from claims
into tested code. Reference behavior being replaced:
mmdet/apis/test.py:117-189 (collect_results) + scripts/dist_train.sh.

Parity oracle: the same global batch stepped on a single-process mesh
(test_sharded.py already proves that equals the unsharded step).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [pytest.mark.slow, pytest.mark.multidevice]


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope='module')
def worker_outputs(tmp_path_factory):
    sys.path.insert(0, os.path.dirname(__file__))
    from test_data import make_synthetic_coco
    tmp = tmp_path_factory.mktemp('multihost')
    make_synthetic_coco(tmp, num_imgs=8)        # ann.json + imgs/
    (tmp / 'work_shared').mkdir()
    port = _free_port()
    outs = [str(tmp / f'out{i}.json') for i in range(2)]
    worker = os.path.join(os.path.dirname(__file__), 'multihost_worker.py')
    env = {k: v for k, v in os.environ.items()
           if k not in ('JAX_PLATFORMS', 'XLA_FLAGS')}
    procs = []
    logs = []
    for i in range(2):
        log = open(str(tmp / f'worker{i}.log'), 'w')
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, worker, '--coordinator', f'localhost:{port}',
             '--num-processes', '2', '--process-id', str(i),
             '--out', outs[i], '--data-dir', str(tmp),
             '--work-dir', str(tmp / 'work_shared')],
            stdout=log, stderr=subprocess.STDOUT, env=env))
    rcs = [p.wait(timeout=900) for p in procs]
    for log in logs:
        log.close()
    if any(rc != 0 for rc in rcs):
        tails = []
        for i in range(2):
            with open(str(tmp / f'worker{i}.log')) as f:
                tails.append(f'--- worker {i} (rc={rcs[i]}) ---\n'
                             + f.read()[-3000:])
        pytest.fail('multihost worker failed:\n' + '\n'.join(tails))
    return [json.load(open(o)) for o in outs]


class TestMultiHost:
    def test_topology(self, worker_outputs):
        for o in worker_outputs:
            assert o['n_proc'] == 2
            assert o['n_local'] == 2
            assert o['n_global'] == 4

    def test_processes_agree(self, worker_outputs):
        """Replicated state must be bit-identical across processes."""
        a, b = worker_outputs
        assert a['losses'] == pytest.approx(b['losses'], rel=1e-6)
        np.testing.assert_allclose(a['param_heads'], b['param_heads'],
                                   rtol=1e-6)
        assert a['param_norm'] == pytest.approx(b['param_norm'], rel=1e-6)

    def test_parity_with_single_process(self, worker_outputs):
        """2-process x 2-device training on the same global batch must match
        the single-process sharded step (which test_sharded.py proves equals
        the unsharded step)."""
        sys.path.insert(0, os.path.dirname(__file__))
        from test_sharded import _tiny_detector, _batch
        from dynamask_tpu.engine import (build_optimizer, create_train_state,
                                         data_parallel_mesh,
                                         jit_train_step_sharded)
        det = _tiny_detector()
        gbatch = _batch(8)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      _batch(2))
        tx = build_optimizer(variables['params'], base_lr=0.01, momentum=0.9,
                             weight_decay=1e-4, grad_clip_norm=35.0,
                             frozen_backbone_prefixes=det.backbone
                             .frozen_param_paths())
        state = create_train_state(variables, tx)
        mesh = data_parallel_mesh(jax.devices()[:4])
        step_fn, place = jit_train_step_sharded(det, tx, mesh)
        state, bt, rt = place(state, gbatch, jax.random.PRNGKey(7))
        losses = []
        for _ in range(len(worker_outputs[0]['losses'])):
            state, log = step_fn(state, bt, rt)
            losses.append(float(log['loss']))

        ref = worker_outputs[0]
        assert losses == pytest.approx(ref['losses'], rel=1e-4)
        params = jax.device_get(state.params)
        leaves = jax.tree_util.tree_leaves(params)
        heads = np.concatenate([np.ravel(np.asarray(x))[:4] for x in leaves])
        np.testing.assert_allclose(heads, np.asarray(ref['param_heads']),
                                   rtol=1e-4, atol=1e-6)
        pnorm = float(np.sqrt(sum(float(np.sum(np.asarray(x) ** 2.0))
                                  for x in leaves)))
        assert pnorm == pytest.approx(ref['param_norm'], rel=1e-5)

    def test_train_detector_api_multiprocess(self, worker_outputs):
        """The FULL train_detector API (per-process loader shards, shared
        multi-process place(), rank-0-only checkpoint write into a SHARED
        work dir) runs 2-process and leaves both processes bit-identical."""
        a, b = worker_outputs
        ta, tb = a['train_api'], b['train_api']
        assert ta and tb
        assert ta['step'] == tb['step'] == 2
        assert ta['losses'] and np.isfinite(ta['losses']).all()
        assert ta['losses'] == pytest.approx(tb['losses'], rel=1e-6)
        np.testing.assert_allclose(ta['param_heads'], tb['param_heads'],
                                   rtol=1e-6)
        # the shared-dir checkpoint exists for BOTH processes (single
        # writer, barrier before anyone proceeds)
        assert ta['ckpt_exists'] and tb['ckpt_exists']
        assert ta['latest_exists'] and tb['latest_exists']

    def test_eval_gather_complete_on_every_process(self, worker_outputs):
        """process_allgather must leave the FULL 8-image result set on both
        processes, identical across them."""
        a, b = worker_outputs
        assert [r[0] for r in a['eval']] == list(range(8))
        assert a['eval'] == b['eval']

    def test_eval_matches_single_device(self, worker_outputs):
        """The gathered multi-process eval must agree with a single-device
        eval of the same (re-trained, deterministic) model. We re-derive the
        trained params via the single-process parity path rather than
        shipping them across, then compare det checksums."""
        sys.path.insert(0, os.path.dirname(__file__))
        from test_sharded import _tiny_detector, _batch
        from dynamask_tpu.engine import (build_optimizer, create_train_state,
                                         data_parallel_mesh,
                                         jit_train_step_sharded)
        from dynamask_tpu.apis.test import single_device_test
        det = _tiny_detector()
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      _batch(2))
        tx = build_optimizer(variables['params'], base_lr=0.01, momentum=0.9,
                             weight_decay=1e-4, grad_clip_norm=35.0,
                             frozen_backbone_prefixes=det.backbone
                             .frozen_param_paths())
        state = create_train_state(variables, tx)
        mesh = data_parallel_mesh(jax.devices()[:4])
        step_fn, place = jit_train_step_sharded(det, tx, mesh)
        state, bt, rt = place(state, _batch(8), jax.random.PRNGKey(7))
        for _ in range(len(worker_outputs[0]['losses'])):
            state, _ = step_fn(state, bt, rt)

        class FakeDataset:
            flags = np.zeros(8, np.int64)
            img_infos = [{'id': i, 'height': 64, 'width': 64}
                         for i in range(8)]

            def __len__(self):
                return 8

            def __getitem__(self, i):
                b = _batch(1, seed=100 + i)
                return {
                    'image': np.asarray(b['image'][0]),
                    'img_shape': np.asarray([64, 64], np.float32),
                    'ori_shape': np.asarray([64, 64], np.float32),
                    'scale_factor': np.ones(4, np.float32),
                    'img_id': np.asarray(i, np.int64),
                }

        eval_vars = {'params': jax.device_get(state.params),
                     'batch_stats': jax.device_get(state.batch_stats)}
        r_single = single_device_test(det, eval_vars, FakeDataset(),
                                      progress=False)
        single_summary = sorted(
            (int(r['img_id']), float(np.sum(r['dets'])),
             int(np.sum(r['valid']))) for r in r_single)
        ref = worker_outputs[0]['eval']
        assert [r[0] for r in single_summary] == [r[0] for r in ref]
        for (i1, s1, v1), (i2, s2, v2) in zip(single_summary, ref):
            assert v1 == v2, (i1, v1, v2)
            assert s1 == pytest.approx(s2, rel=1e-3, abs=1e-2), (i1, s1, s2)


if __name__ == '__main__':
    sys.exit(pytest.main([__file__, '-v', '-m', '']))
