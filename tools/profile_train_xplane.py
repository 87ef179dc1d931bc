#!/usr/bin/env python
"""Device-trace profile of the flagship TRAINING step (xplane parse).

The inference roofline (tools/profile_xplane.py) drove three rounds of real
wins; this applies the same methodology to the train step: run the REAL
``make_train_step`` (forward_train + backward + optax update, bf16 compute,
fp32 master weights — exactly what apis/train.py executes per iteration)
under ``jax.profiler.trace``, parse the XSpace proto, and print per-HLO /
per-category device ms per step. Dispatch floor (~30 ms on this transport)
is negligible against the ~1 s step, so steps are traced as individual
dispatches — no fori loop needed.

Also prints a training MFU line: flops from XLA cost analysis of the
compiled step / (step wall x chip bf16 peak).

Reference cost envelope: the 12-epoch COCO recipe
(configs/dynamask/coco/r50-dynamask-1x.py:273-282).

    python tools/profile_train_xplane.py [--batch-size 4] [--steps 3]
"""

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

V5E_PEAK_FLOPS = 197e12


def parse_xplane(trace_dir, n):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, 'plugins/profile/*/*.xplane.pb')), key=os.path.getmtime)
    if not paths:
        print('no xplane capture found', file=sys.stderr)
        return None
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(paths[-1], 'rb') as f:
        xs.ParseFromString(f.read())

    by_name = defaultdict(float)
    by_cat = defaultdict(float)
    dev_total = 0.0
    for plane in xs.planes:
        if 'TPU' not in plane.name:
            continue
        meta = {m_id: m for m_id, m in plane.event_metadata.items()}
        stat_meta = {s_id: s.name for s_id, s in plane.stat_metadata.items()}
        for line in plane.lines:
            if line.name != 'XLA Ops':
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = m.name if m else '?'
                cat = ''
                if m:
                    for st in m.stats:
                        if stat_meta.get(st.metadata_id) in ('category',
                                                             'hlo_category'):
                            cat = st.str_value
                dur_ms = ev.duration_ps / 1e9
                by_name[name] += dur_ms
                by_cat[cat or 'uncategorized'] += dur_ms
                if cat != 'while':
                    dev_total += dur_ms
    return dev_total, by_cat, by_name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch-size', type=int, default=4)
    ap.add_argument('--steps', type=int, default=3)
    ap.add_argument('--top', type=int, default=40)
    ap.add_argument('--fp32', action='store_true')
    ap.add_argument('--trace-dir', default='/tmp/dynamask_train_xplane')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from __graft_entry__ import _build_flagship, _demo_batch
    from dynamask_tpu.engine import (build_optimizer, step_lr_schedule,
                                     create_train_state)
    from dynamask_tpu.engine.train_state import make_train_step

    det, cfg = _build_flagship()
    b, h, w = args.batch_size, 800, 1344
    batch = _demo_batch(jnp, b, h, w, g=24, s=128)
    shapes = jax.eval_shape(
        lambda: det.init({'params': jax.random.PRNGKey(0)}, batch))
    variables = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, a.dtype), shapes)

    tx = build_optimizer(
        variables['params'], base_lr=cfg.optimizer['lr'],
        momentum=cfg.optimizer['momentum'],
        weight_decay=cfg.optimizer['weight_decay'],
        grad_clip_norm=cfg.optimizer_config['grad_clip']['max_norm'],
        lr_schedule=step_lr_schedule(cfg.optimizer['lr'],
                                     steps_per_epoch=1000),
        frozen_backbone_prefixes=det.backbone.frozen_param_paths(),
        msm_grad_scale=0.05)
    state = create_train_state(variables, tx)
    step = make_train_step(
        det, tx, compute_dtype=None if args.fp32 else jnp.bfloat16)
    jstep = jax.jit(step, donate_argnums=(0,))

    rng = jax.random.PRNGKey(7)
    t0 = time.time()
    lowered = jstep.lower(state, batch, rng)
    compiled = lowered.compile()
    print(f'# compiled in {time.time() - t0:.1f}s', file=sys.stderr)

    flops = None
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float((cost or {}).get('flops', 0.0)) or None
    except Exception as e:
        print(f'# cost analysis unavailable: {e}', file=sys.stderr)

    def run_steps(state, n, tag):
        ts = []
        for i in range(n):
            bb = dict(batch)
            bb['image'] = batch['image'] + jnp.float32(i) * 2.0 ** -7
            jax.block_until_ready(bb['image'])
            t0 = time.time()
            state, log = compiled(state, bb, jax.random.fold_in(rng, i))
            jax.block_until_ready(log['loss'])
            ts.append(time.time() - t0)
        ts.sort()
        print(f'# {tag}: median {ts[len(ts) // 2]:.3f}s/step over {n}',
              file=sys.stderr)
        return state, ts[len(ts) // 2]

    state, _ = run_steps(state, 2, 'warmup')
    state, med = run_steps(state, args.steps, 'timed')

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        state, _ = run_steps(state, args.steps, 'traced')

    parsed = parse_xplane(args.trace_dir, args.steps)
    n = args.steps
    print(f'train step: {med * 1e3:.0f} ms/step at bs={b} '
          f'({b / med:.2f} img/s/chip)')
    if flops:
        print(f'train MFU: {flops / med / V5E_PEAK_FLOPS:.4f} '
              f'({flops / 1e12:.2f} TFLOPs/step from XLA cost analysis)')
    if parsed:
        dev_total, by_cat, by_name = parsed
        print(f'device total: {dev_total:.1f} ms over {n} steps '
              f'({dev_total / n:.1f} ms/step)')
        print('\n-- by HLO category (ms/step) --')
        for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
            print(f'{ms / n:9.3f}  {cat}')
        print(f'\n-- top {args.top} ops (ms/step) --')
        for name, ms in sorted(by_name.items(),
                               key=lambda kv: -kv[1])[:args.top]:
            print(f'{ms / n:9.3f}  {name[:110]}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
