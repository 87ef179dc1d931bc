#!/usr/bin/env python
"""Microbench: the 1000-RoI multilevel bbox RoIAlign (inference roofline #2).

The inference roofline attributes ~2.5-3.2 ms/img to the bbox extractor's
corner gathers (README). The roofline names two levers that respect the
mmcv-semantics invariant:

  * FEWER SAMPLES — sampling_ratio 2 -> 1 halves the gathered rows. mmcv's
    adaptive rule (sampling_ratio=0) picks ceil(roi_extent/out) samples;
    with FPN level routing the per-bin extent is ~1-2 feature px, so ratio
    1 vs 2 brackets the adaptive choice from below vs above. This tool
    measures the speed delta AND the numeric deviation between the two.
  * DMA-RESIDENT GATHER (Pallas) — REJECTED BY TRAFFIC MODEL, recorded
    here: a kernel DMA-ing the 2 needed plane rows per (RoI, output-row)
    moves 2 rows x W x C x 2B x 14 rows x 1000 RoIs ~= 4.8 GB/img vs the
    point gathers' ~1 GB/img (4 corners x 196 samples x 256ch x 2B x 1000);
    clustering RoIs to share row strips is data-dependent (dynamic shapes).
    The gather path is already chunked to <=128-lane rows, the full-
    bandwidth width (ops/roi_align.py:78-82).

Usage:  python tools/bench_roialign.py [--rois 1000] [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rois', type=int, default=1000)
    ap.add_argument('--iters', type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from dynamask_tpu.ops.roi_align import multilevel_roi_align

    h, w = 800, 1344
    strides = (4, 8, 16, 32)
    feats = [jnp.asarray(np.random.RandomState(i).randn(
        1, h // s, w // s, 256).astype(np.float32)).astype(jnp.bfloat16)
        for i, s in enumerate(strides)]
    rng = np.random.RandomState(7)
    # proposal-like mix: mostly small boxes (routed to P2), some large
    cx = rng.uniform(0, w, args.rois)
    cy = rng.uniform(0, h, args.rois)
    sz = np.exp(rng.uniform(np.log(16), np.log(512), args.rois))
    ar = np.exp(rng.uniform(-0.7, 0.7, args.rois))
    bw, bh = sz * ar, sz / ar
    rois = jnp.asarray(np.stack([
        np.clip(cx - bw / 2, 0, w), np.clip(cy - bh / 2, 0, h),
        np.clip(cx + bw / 2, 0, w), np.clip(cy + bh / 2, 0, h)],
        -1).astype(np.float32))
    rb = jnp.zeros(args.rois, jnp.int32)

    def make(sr):
        def f(fs, r):
            def body(i, acc):
                out = multilevel_roi_align(
                    [x + i.astype(x.dtype) * 0 for x in fs], r, rb, 7,
                    strides, sampling_ratio=sr)
                return acc + jnp.sum(out.astype(jnp.float32))
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0.))
        return jax.jit(f).lower(feats, rois).compile()

    outs = {}
    for sr in (2, 1):
        c = make(sr)
        float(c(feats, rois))
        t0 = time.time()
        float(c(feats, rois))
        dt = (time.time() - t0) / args.iters
        outs[sr] = dt
        print(f'sampling_ratio={sr}: {dt * 1e3:.3f} ms per '
              f'{args.rois}-RoI extract')

    o2 = multilevel_roi_align(feats, rois, rb, 7, strides, sampling_ratio=2)
    o1 = multilevel_roi_align(feats, rois, rb, 7, strides, sampling_ratio=1)
    d = np.abs(np.asarray(o2, np.float32) - np.asarray(o1, np.float32))
    ref = np.abs(np.asarray(o2, np.float32))
    print(f'ratio-1 vs ratio-2 deviation: max {d.max():.4f}, '
          f'mean {d.mean():.5f}, rel-L2 '
          f'{np.linalg.norm(d) / (np.linalg.norm(ref) + 1e-9):.4f}')
    print(f'speedup: {outs[2] / outs[1]:.2f}x '
          f'({(outs[2] - outs[1]) * 1e3:.3f} ms back)')


if __name__ == '__main__':
    main()
