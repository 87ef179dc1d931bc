"""Benchmark: dynamask_r50_fpn COCO-scale inference throughput on one chip.

Protocol mirrors the reference's tools/benchmark.py (docs/model_zoo.md:12-14):
steady-state fps over repeated forwards, network forward + post-processing
only, excluding data loading; bs=1 at the standard (1333, 800) COCO test
scale (padded canvas 800×1344). The HEADLINE number is paste-INCLUSIVE:
forward + NMS + cascade + boundary fusion + device-side paste of all RoI
masks onto the full 800×1344 canvas + 0.5 threshold — the same work the
reference's benchmark does through get_seg_masks' _do_paste_mask
(mmdet/models/roi_heads/mask_heads/dynamask_head.py:279-342); only host RLE
encoding is excluded on both sides. A no-paste number (everything up to
per-RoI mask probabilities — prior rounds' metric) is reported alongside
for continuity, plus an MFU estimate from XLA cost analysis.

Baseline anchor: Mask R-CNN R-50-FPN 1x at 16.1 fps on 1×V100
(configs/mask_rcnn/README.md:20) — the closest published in-tree number
(the repo publishes no DynaMask-specific fps; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

import numpy as np


BASELINE_FPS = 16.1  # Mask R-CNN R50-FPN 1x, 1xV100 (BASELINE.md)
# bf16 peak of one TPU v5e (v5 lite) chip, for the MFU estimate
V5E_PEAK_FLOPS = 197e12


def _graft_toy_msm(variables, ckpt_path):
    """Copy trained mask_predictor leaves from a toy checkpoint (orbax work
    dir, or the checked-in ``artifacts/msm_toy_overfit.npz``) into the
    flagship variable tree (in place, host side). Shape-matching leaves copy
    verbatim; conv1's (1, 1, 32, 128) kernel is zero-embedded into the
    flagship (1, 1, 256, 128)."""
    import sys as _sys
    if ckpt_path.endswith('.npz'):
        flat = np.load(ckpt_path)
        restored = {}
        for key in flat.files:
            parts = key.split('/')
            node = restored.setdefault(parts[0], {}).setdefault(
                'roi_head', {}).setdefault('mask_predictor', {})
            for p in parts[1:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = flat[key]
    else:
        from dynamask_tpu.engine.checkpoint import _resolve_ckpt_path
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(
            _resolve_ckpt_path(os.path.abspath(ckpt_path)))
    stats = {'copied': 0, 'embedded': 0, 'skipped': 0}

    def walk(src, dst):
        for k, dv in dst.items():
            if k not in src:
                stats['skipped'] += 1
                continue
            if isinstance(dv, dict):
                walk(src[k], dv)
                continue
            a = np.asarray(src[k])
            if a.shape == dv.shape:
                dst[k] = a.astype(dv.dtype)
                stats['copied'] += 1
            elif (a.ndim == 4 and a.shape[:2] == (1, 1)
                  and a.shape[3] == dv.shape[3]
                  and a.shape[2] < dv.shape[2]):
                out = np.zeros(dv.shape, dv.dtype)
                out[:, :, :a.shape[2], :] = a
                dst[k] = out
                stats['embedded'] += 1
            else:
                stats['skipped'] += 1

    for coll in ('params', 'batch_stats'):
        src = (restored.get(coll) or {}).get('roi_head',
                                             {}).get('mask_predictor')
        dst = (variables.get(coll) or {}).get('roi_head',
                                              {}).get('mask_predictor')
        if src and dst:
            walk(src, dst)
    print(f'# msm graft from {ckpt_path}: {stats}', file=_sys.stderr)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _build_flagship, _demo_batch, _zeros_like_tree

    dynamic = os.environ.get('BENCH_DYNAMIC', '1') == '1'
    # dynamic=True is the north-star speed mode (MSM-routed bucketed
    # resolution); dynamic=False is the reference-faithful full cascade.
    # BENCH_CAPACITY overrides the static admission fractions — set it to
    # the CAPACITY.json calibration so BENCH and ACCURACY describe the SAME
    # operating point (tools/calibrate_capacity.py).
    capacity = None
    if os.environ.get('BENCH_CAPACITY'):
        capacity = tuple(float(c) for c in
                         os.environ['BENCH_CAPACITY'].split(','))
    det, _ = _build_flagship(dynamic=dynamic, capacity=capacity)
    h, w = 800, 1344
    # BENCH_BS>1: serving-style batched throughput (bs=1 is the reference
    # protocol and the default; img/s scales with the batched work)
    batch = _demo_batch(jnp, int(os.environ.get('BENCH_BS', '1')), h, w,
                        with_gt=False)

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
    variables = jax.tree_util.tree_unflatten(treedef, host_leaves)
    if 'batch_stats' in variables:
        # BN statistics must be well-formed: variances are strictly
        # positive in any real checkpoint (a negative random "var" turns
        # sqrt(var+eps) into NaN and poisons the whole forward)
        variables = dict(variables)
        variables['batch_stats'] = jax.tree_util.tree_map(
            lambda x: np.abs(x) + 0.5, variables['batch_stats'])
    msm_grafted = False
    default_msm = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'artifacts', 'msm_toy_overfit.npz')
    if 'BENCH_MSM_CKPT' not in os.environ and os.path.isfile(default_msm):
        os.environ['BENCH_MSM_CKPT'] = default_msm   # checked-in artifact
    if os.environ.get('BENCH_MSM_CKPT'):
        # graft the toy-overfit-TRAINED Mask Switch Module into the random
        # flagship weights so the routing histogram reflects a trained
        # switch rather than random-init degeneracy. All MSM leaves match
        # the flagship shapes except conv1's kernel (toy P2 has 32 channels,
        # flagship 256): zero-embedding it into the first 32 input channels
        # makes the grafted MSM compute EXACTLY the trained toy switch
        # applied to a 32-channel slice of P2 — a real trained routing
        # function, documented as such.
        _graft_toy_msm(variables, os.environ['BENCH_MSM_CKPT'])
        msm_grafted = True
    variables = jax.device_put(variables)

    fuse = os.environ.get('BENCH_FUSE', '1') == '1'
    if fuse:
        # inference-mode conv+BN folding (= the reference's
        # tools/fuse_conv_bn.py applied before benchmarking)
        from dynamask_tpu.engine.fuse import fuse_conv_bn
        variables, _n_fused = fuse_conv_bn(variables)

    bf16 = os.environ.get('BENCH_BF16', '1') == '1'
    if bf16:
        from dynamask_tpu.core.fp16 import to_bf16
        variables = to_bf16(variables)

    iters = int(os.environ.get('BENCH_ITERS', '50'))
    from dynamask_tpu.apis.test import _paste_epilogue

    def one_iter(v, b, i, paste):
        b = dict(b)
        if bf16:
            b['image'] = b['image'].astype(jnp.bfloat16)
        # distinct input per iteration: defeats any execution/transport
        # caching so the timing is honest. The step must survive bf16
        # rounding (ulp at 1.0 is 2^-7 ≈ 0.0078 — an additive 1e-6 would be
        # absorbed and every iteration would see bit-identical input).
        b['image'] = b['image'] + i.astype(b['image'].dtype) * (2.0 ** -7)
        out = det.apply(v, b, method='simple_test')
        # fold every output into one scalar so fetching it forces the whole
        # computation (block_until_ready over the tunnel transport has been
        # observed to return before remote execution completes)
        acc = (jnp.sum(out['dets'][..., 4]) + jnp.sum(out['labels'])
               + jnp.sum(out['det_valid']))
        if paste:
            # reference-protocol epilogue: paste every RoI mask onto the
            # full padded canvas + 0.5 threshold, on device (= the work
            # get_seg_masks does in the V100 anchor's timed loop)
            res = _paste_epilogue(out, h, w, 0.5)
            acc = acc + jnp.sum(res['masks'].astype(jnp.float32))
        else:
            acc = acc + jnp.sum(out['mask_probs'].astype(jnp.float32))
        return acc

    def make_loop(paste):
        def timed_loop(v, b):
            # device-side loop: ONE dispatch for all iters, so the per-call
            # transport round-trip (~30 ms floor) is amortised out and the
            # wall time between dispatch and the scalar fetch is pure device
            # execution (round-2 measurement: scan loop == dispatch loop
            # img/s when the transport is healthy, but only the former is
            # trustworthy when it is not)
            def body(i, acc):
                return acc + one_iter(v, b, i.astype(jnp.float32), paste)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.))
        # AOT compile so the SAME executable serves warmup, timing, and
        # cost analysis — a second .lower().compile() for cost analysis
        # alone was measured to double the bench's wall clock
        t0 = time.time()
        compiled = jax.jit(timed_loop).lower(variables, batch).compile()
        print(f'# compile(paste={paste})={time.time() - t0:.1f}s',
              file=sys.stderr, flush=True)
        return compiled

    bsz = batch['image'].shape[0]

    def measure(compiled):
        # one warmup execution (excluded per reference protocol)
        t0 = time.time()
        chk = float(compiled(variables, batch))
        warm_s = time.time() - t0
        t0 = time.time()
        chk = float(compiled(variables, batch))
        dt = time.time() - t0
        assert np.isfinite(chk), chk
        print(f'# warmup={warm_s:.1f}s timed={dt:.1f}s', file=sys.stderr,
              flush=True)
        return iters * bsz / dt

    paste_loop = make_loop(paste=True)
    fps = measure(paste_loop)

    fps_np = None
    if os.environ.get('BENCH_NOPASTE', '1') == '1':
        fps_np = measure(make_loop(paste=False))

    # MFU flop count from a SINGLE-ITERATION lowering (no fori loop, so no
    # body-counted-once-or-N-times ambiguity); Lowered.cost_analysis() needs
    # no backend compile. Falls back to the timed executable's count with
    # the magnitude heuristic if single-iter analysis is unavailable.
    mfu = flops_per_img = None
    try:
        single = jax.jit(
            lambda v, b: one_iter(v, b, jnp.float32(0.0), True)
        ).lower(variables, batch)
        cost = single.cost_analysis()
        if cost is None:        # some backends only cost compiled artifacts
            cost = single.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_img = float((cost or {}).get('flops', 0.0)) / bsz
        if not flops_per_img > 0:
            flops_per_img = None
    except Exception as e:
        print(f'# single-iter cost analysis unavailable: {e}',
              file=sys.stderr)
    if flops_per_img is None:
        try:
            cost = paste_loop.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            fl = float(cost.get('flops', 0.0))
            for cand in (fl / (iters * bsz), fl / bsz):
                if 5e10 <= cand <= 2e13:
                    flops_per_img = cand
                    break
        except Exception as e:  # cost analysis unsupported on some backends
            print(f'# cost analysis unavailable: {e}', file=sys.stderr)
    if flops_per_img:
        mfu = flops_per_img * fps / V5E_PEAK_FLOPS

    if dynamic and os.environ.get('BENCH_ROUTING', '1') == '1':
        # routing observability: MSM decision histogram + capacity-clip
        # accounting for this run (flax intermediates sown by
        # _dynamic_test_mask; see routing_clip_stats)
        try:
            _, inter = jax.jit(lambda v, b: det.apply(
                v, b, method='simple_test',
                mutable=['intermediates']))(variables, batch)
            st = inter['intermediates']['roi_head']['msm_routing'][0]
            print('# msm routing hist(14/28/56/112)='
                  f'{np.asarray(st["hist"]).tolist()} '
                  f'demand={np.asarray(st["demand"]).tolist()} '
                  f'capacity={np.asarray(st["capacity"]).tolist()} '
                  f'clipped={np.asarray(st["clipped"]).tolist()}',
                  file=sys.stderr)
        except Exception as e:
            print(f'# routing stats unavailable: {e}', file=sys.stderr)

    mode = ('MSM-routed bucketed' if dynamic else 'full cascade')
    rec = {
        'metric': f'dynamask_r50_fpn COCO 800x1344 inference img/s/chip '
                  f'({mode}, bf16, incl. device mask paste)',
        'value': round(fps, 3),
        'unit': 'img/s',
        'vs_baseline': round(fps / BASELINE_FPS, 3),
        'batch_size': bsz,
    }
    if fps_np is not None:
        rec['no_paste_img_s'] = round(fps_np, 3)
    if dynamic:
        rec['capacities'] = list(capacity) if capacity else \
            list(det.roi_head.dynamic_capacity)
        rec['capacity_source'] = ('BENCH_CAPACITY (CAPACITY.json '
                                  'calibration)' if capacity
                                  else 'config default')
    if msm_grafted:
        rec['msm'] = ('toy-overfit-trained switch grafted '
                      '(conv1 zero-embedded on a 32-channel P2 slice)')
    if mfu is not None:
        rec['mfu'] = round(mfu, 4)
        rec['flops_per_img_g'] = round(flops_per_img / 1e9, 1)
    print(json.dumps(rec))
    print(f'# iters={iters} bs={bsz} '
          f'device={jax.devices()[0].platform}', file=sys.stderr)


if __name__ == '__main__':
    main()
