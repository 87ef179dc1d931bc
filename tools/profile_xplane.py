#!/usr/bin/env python
"""Device-trace profile of the flagship inference loop (xplane parse).

Captures a ``jax.profiler.trace`` of the SAME device-side fori_loop bench.py
times, parses the XSpace proto (tensorflow/xprof, available in-tree), and
prints the top device ops aggregated by HLO name and by category — the
ground truth the stage-prefix profilers (floor-limited on this transport)
cannot give. This is the tool behind the roofline table in README.

    python tools/profile_xplane.py [--iters 10] [--top 30] [--faithful]

Output: per-op total ms over the traced loop, so divide by --iters for
per-image cost.
"""

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--top', type=int, default=30)
    ap.add_argument('--faithful', action='store_true',
                    help='full-cascade mode instead of dynamic routing')
    ap.add_argument('--paste', action='store_true',
                    help='include the paste epilogue in the traced loop')
    ap.add_argument('--trace-dir', default='/tmp/dynamask_xplane')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from __graft_entry__ import _build_flagship, _demo_batch
    from dynamask_tpu.core.fp16 import to_bf16
    from dynamask_tpu.engine.fuse import fuse_conv_bn
    from dynamask_tpu.apis.test import _paste_epilogue

    det, _ = _build_flagship(dynamic=not args.faithful)
    h, w = 800, 1344
    batch = _demo_batch(jnp, 1, h, w, with_gt=False)
    shapes = jax.eval_shape(
        lambda: det.init({'params': jax.random.PRNGKey(0)},
                         _demo_batch(jnp, 1, h, w)))
    rng = np.random.RandomState(0)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    host = [(rng.normal(0, 0.05, x.shape).astype(x.dtype)
             if jnp.issubdtype(x.dtype, jnp.floating)
             else np.zeros(x.shape, x.dtype)) for x in leaves]
    variables = dict(jax.tree_util.tree_unflatten(treedef, host))
    variables['batch_stats'] = jax.tree_util.tree_map(
        lambda x: np.abs(x) + 0.5, variables['batch_stats'])
    variables = jax.device_put(variables)
    variables, _ = fuse_conv_bn(variables)
    variables = to_bf16(variables)

    def one(v, b, i):
        b = dict(b)
        b['image'] = (b['image'] + i * (2.0 ** -7)).astype(jnp.bfloat16)
        out = det.apply(v, b, method='simple_test')
        acc = jnp.sum(out['dets']) + jnp.sum(
            out['mask_probs'].astype(jnp.float32))
        if args.paste:
            res = _paste_epilogue(out, h, w, 0.5)
            acc = acc + jnp.sum(res['masks'].astype(jnp.float32))
        return acc

    @jax.jit
    def loop(v, b):
        def body(i, acc):
            return acc + one(v, b, i.astype(jnp.float32))
        return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0.))

    t0 = time.time()
    float(loop(variables, batch))         # compile + warmup
    print(f'# compiled in {time.time() - t0:.1f}s', file=sys.stderr)
    t0 = time.time()
    float(loop(variables, batch))
    wall = time.time() - t0
    print(f'# timed loop: {wall * 1e3 / args.iters:.2f} ms/img',
          file=sys.stderr)

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        float(loop(variables, batch))

    paths = sorted(glob.glob(os.path.join(
        args.trace_dir, 'plugins/profile/*/*.xplane.pb')), key=os.path.getmtime)
    if not paths:
        print('no xplane capture found (device tracing unsupported on this '
              'transport?)', file=sys.stderr)
        return 1
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
            # the sync 'XLA Ops' line carries per-HLO events ('Async XLA
            # Ops' are overlapped DMA — excluded from the serial total)
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
                # 'while' ops span their children (the driver fori_loop
                # covers the whole iteration; NMS whiles nest too) —
                # children are already counted individually, so whiles are
                # excluded from the serial total to avoid double counting
                if cat != 'while':
                    dev_total += dur_ms

    n = args.iters
    print(f'device total: {dev_total:.1f} ms over {n} iters '
          f'({dev_total / n:.2f} ms/img)')
    print('\n-- by HLO category (ms/img) --')
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f'{ms / n:8.3f}  {cat}')
    print(f'\n-- top {args.top} ops (ms/img) --')
    for name, ms in sorted(by_name.items(),
                           key=lambda kv: -kv[1])[:args.top]:
        print(f'{ms / n:8.3f}  {name[:110]}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
