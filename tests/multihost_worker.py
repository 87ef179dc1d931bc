"""One process of the 2-process localhost multi-host test.

Spawned by tests/test_multihost.py. Exercises, for real, the code paths the
single-process suite cannot reach (the reference equivalents are
mmdet/apis/test.py:117-189 collect_results and scripts/dist_train.sh):

  * ``jax.distributed.initialize`` on a localhost coordinator (the
    ``--launcher jax`` path of root train.py);
  * the multi-process branch of ``jit_train_step_sharded``'s ``place``
    (``make_array_from_process_local_data`` +
    ``host_local_array_to_global_array``, engine/train_state.py:207-219);
  * the multi-process branch of ``apis.test.multi_device_test``
    (per-process loader shards + ``process_allgather`` result collection,
    apis/test.py:254-280).

Each process holds 2 virtual CPU devices (4 global); cross-process
collectives run over Gloo. Writes a JSON summary for the parent to compare
against the single-process reference.
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--coordinator', required=True)
    ap.add_argument('--num-processes', type=int, required=True)
    ap.add_argument('--process-id', type=int, required=True)
    ap.add_argument('--out', required=True)
    ap.add_argument('--steps', type=int, default=2)
    ap.add_argument('--data-dir', default=None,
                    help='synthetic COCO dir (ann.json + imgs/) prepared by '
                         'the parent; enables the full train_detector phase')
    ap.add_argument('--work-dir', default=None)
    args = ap.parse_args()

    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '')
        + ' --xla_force_host_platform_device_count=2').strip()
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(__file__))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
    from test_sharded import _tiny_detector, _batch
    from dynamask_tpu.engine import (build_optimizer, create_train_state,
                                     data_parallel_mesh,
                                     jit_train_step_sharded)

    n_proc = jax.process_count()
    pid = jax.process_index()
    assert n_proc == args.num_processes, (n_proc, args.num_processes)
    n_local = jax.local_device_count()

    det = _tiny_detector()
    global_bs = 8
    gbatch = _batch(global_bs)  # deterministic: identical on every process
    lo = pid * (global_bs // n_proc)
    hi = lo + global_bs // n_proc
    local_batch = jax.tree_util.tree_map(lambda x: np.asarray(x)[lo:hi],
                                         gbatch)

    variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                  _batch(2))
    tx = build_optimizer(variables['params'], base_lr=0.01, momentum=0.9,
                         weight_decay=1e-4, grad_clip_norm=35.0,
                         frozen_backbone_prefixes=det.backbone
                         .frozen_param_paths())
    state = create_train_state(variables, tx)

    mesh = data_parallel_mesh(jax.devices())  # all 4 global devices
    step_fn, place = jit_train_step_sharded(det, tx, mesh)
    rng = jax.random.PRNGKey(7)
    # place() takes host-local arrays once; later steps feed back the
    # already-global state
    state, gbatch_dev, grng = place(state, local_batch, rng)
    losses = []
    for s in range(args.steps):
        state, log = step_fn(state, gbatch_dev, grng)
        losses.append(float(log['loss']))

    # summary: loss history + a strong param fingerprint (first 4 elements
    # of every leaf — params are replicated, so device_get is local)
    params = jax.device_get(state.params)
    leaves = jax.tree_util.tree_leaves(params)
    heads = np.concatenate([np.ravel(np.asarray(x))[:4] for x in leaves])
    pnorm = float(np.sqrt(sum(float(np.sum(np.asarray(x) ** 2.0))
                              for x in leaves)))

    # ---- multi-process eval gather -------------------------------------
    from dynamask_tpu.apis.test import multi_device_test

    class FakeDataset:
        flags = np.zeros(8, np.int64)
        img_infos = [{'id': i, 'height': 64, 'width': 64} for i in range(8)]

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

    eval_vars = {'params': state.params, 'batch_stats': state.batch_stats}
    results = multi_device_test(det, eval_vars, FakeDataset(),
                                samples_per_device=1)
    # every process must hold the FULL result set (allgathered)
    res_summary = sorted(
        (int(r['img_id']), float(np.sum(r['dets'])),
         int(np.sum(r['valid']))) for r in results)

    # ---- full train_detector API, multi-process ------------------------
    # exercises apis/train.py's per-process loader sharding
    # (num_shards=n_proc), the shared multi-process place(), and the
    # rank-0-only checkpoint write (engine/checkpoint.py)
    train_api = None
    if args.data_dir:
        import glob
        from pathlib import Path
        from test_integration import toy_cfg
        from dynamask_tpu.apis import train_detector
        data = Path(args.data_dir)
        work = Path(args.work_dir or (data / f'work{pid}'))
        cfg = toy_cfg(str(data / 'ann.json'), str(data / 'imgs'), work)
        cfg.data['samples_per_gpu'] = 1      # global batch = 1 x 4 devices
        cfg.total_epochs = 1
        state2 = train_detector(cfg, work_dir=str(work), seed=0,
                                max_steps_per_epoch=2, validate=False)
        p2 = jax.device_get(state2.params)
        leaves2 = jax.tree_util.tree_leaves(p2)
        heads2 = np.concatenate([np.ravel(np.asarray(x))[:4]
                                 for x in leaves2])
        logs = sorted(glob.glob(str(work / '*.log.json')))
        losses2 = []
        for line in open(logs[-1]):
            r = json.loads(line)
            if r.get('mode') == 'train':
                losses2.append(float(r['loss']))
        # the meta/latest sidecars are rank-0-only and land AFTER orbax's
        # cross-process commit barrier — give rank 0 a moment
        import time as _time
        for _ in range(100):
            if (work / 'latest').exists():
                break
            _time.sleep(0.1)
        train_api = {
            'losses': losses2,
            'param_heads': heads2.tolist(),
            'step': int(jax.device_get(state2.step)),
            'ckpt_exists': (work / 'epoch_1').exists(),
            'latest_exists': (work / 'latest').exists(),
        }

    with open(args.out, 'w') as f:
        json.dump({'pid': pid, 'n_proc': n_proc, 'n_local': n_local,
                   'n_global': jax.device_count(), 'losses': losses,
                   'param_norm': pnorm, 'param_heads': heads.tolist(),
                   'eval': res_summary, 'train_api': train_api}, f)
    print(f'[worker {pid}] OK', flush=True)


if __name__ == '__main__':
    main()
