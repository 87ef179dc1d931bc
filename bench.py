"""Benchmark: dynamask_r50_fpn COCO-scale inference throughput on one chip.

Protocol mirrors the reference's tools/benchmark.py (docs/model_zoo.md:12-14):
steady-state fps over repeated forwards, network forward + post-processing
only (NMS, cascade, boundary fusion, class selection — everything up to
per-RoI mask probabilities), excluding data loading; bs=1 at the standard
(1333, 800) COCO test scale (padded canvas 800×1344).

Baseline anchor: Mask R-CNN R-50-FPN 1x at 16.1 fps on 1×V100
(configs/mask_rcnn/README.md:20) — the closest published in-tree number
(the repo publishes no DynaMask-specific fps; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


BASELINE_FPS = 16.1  # Mask R-CNN R50-FPN 1x, 1xV100 (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _build_flagship, _demo_batch, _zeros_like_tree

    dynamic = os.environ.get('BENCH_DYNAMIC', '1') == '1'
    if dynamic:
        # north-star speed mode: MSM-routed bucketed dynamic resolution
        from dynamask_tpu.utils.config import Config
        from dynamask_tpu.models import build_detector
        cfg = Config.fromfile(os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            'configs/dynamask/coco/r50_dynamask_1x.py'))
        cfg.model.roi_head['dynamic_inference'] = True
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
    else:
        det, _ = _build_flagship()
    h, w = 800, 1344
    batch = _demo_batch(jnp, 1, h, w, with_gt=False)

    shapes = jax.eval_shape(
        lambda: det.init({'params': jax.random.PRNGKey(0)},
                         _demo_batch(jnp, 1, h, w)))
    # host-side init + one bulk transfer: per-leaf device RNG would cost
    # ~1200 sequential dispatch round-trips over the TPU tunnel (~30 ms
    # floor each) before the benchmark even starts
    host_rng = np.random.RandomState(0)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    host_leaves = [
        (host_rng.normal(0, 0.05, x.shape).astype(x.dtype)
         if jnp.issubdtype(x.dtype, jnp.floating)
         else np.zeros(x.shape, x.dtype))
        for x in leaves]
    variables = jax.device_put(
        jax.tree_util.tree_unflatten(treedef, host_leaves))

    bf16 = os.environ.get('BENCH_BF16', '1') == '1'
    if bf16:
        from dynamask_tpu.core.fp16 import to_bf16
        variables = to_bf16(variables)

    @jax.jit
    def fwd(v, b):
        if bf16:
            b = dict(b)
            b['image'] = b['image'].astype(jnp.bfloat16)
        out = det.apply(v, b, method='simple_test')
        return out['dets'], out['labels'], out['det_valid'], out['mask_probs']

    def vary(b, i):
        # distinct input per iteration: defeats any execution caching in the
        # device transport so the timing is honest
        b = dict(b)
        b['image'] = b['image'] + jnp.float32(i) * 1e-6
        return b

    # compile + warmup (first iters excluded per the reference protocol)
    t0 = time.time()
    out = fwd(variables, vary(batch, 9999))
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    for i in range(4):
        out = fwd(variables, vary(batch, 1000 + i))
    jax.block_until_ready(out)

    iters = int(os.environ.get('BENCH_ITERS', '30'))
    inputs = [vary(batch, i) for i in range(iters)]
    jax.block_until_ready(inputs)
    t0 = time.time()
    for i in range(iters):
        out = fwd(variables, inputs[i])
    jax.block_until_ready(out)
    dt = time.time() - t0
    fps = iters / dt

    mode = ('MSM-routed bucketed' if dynamic else 'full cascade')
    print(json.dumps({
        'metric': f'dynamask_r50_fpn COCO 800x1344 inference img/s/chip '
                  f'({mode}, bf16)',
        'value': round(fps, 3),
        'unit': 'img/s',
        'vs_baseline': round(fps / BASELINE_FPS, 3),
    }))
    print(f'# compile={compile_s:.1f}s iters={iters} '
          f'device={jax.devices()[0].platform}', file=sys.stderr)


if __name__ == '__main__':
    main()
