#!/usr/bin/env python
"""Standalone op-level profile of the SFM-stage components at bench shapes.

Times each building block of the three DynaMask SFM stages (semantic plane
1x1, semantic RoI crop, fuse convs, windowed DCN, class-select logits,
upsample) with random parameters at the exact shapes the bucketed dynamic
path runs on a 800x1344 canvas with the shipped capacities (0.5,0.25,0.125)
over 100 detections. Complements tools/profile_mask_branch.py (module-level
prefixes) with per-op attribution.

Timing method: each op runs K times inside one jitted ``lax.fori_loop``
(input perturbed per iteration so nothing folds), one scalar comes back, and
the empty-loop floor is subtracted — the only honest way to time ~100us ops
over a dispatch transport with a ~30 ms round-trip floor (see bench.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import numpy as np
import jax
import jax.numpy as jnp

from dynamask_tpu.ops.roi_align import simple_roi_align
from dynamask_tpu.ops.deform_conv import deform_conv2d
from dynamask_tpu.models.layers import resize_bilinear_2x

K = 32


def timeit(op, x, *rest, iters=4):
    """Median wall time of K device-side repeats of op(x + eps_i, *rest)."""

    @jax.jit
    def loop(x, *rest):
        def body(i, acc):
            xi = x + (i.astype(x.dtype) if jnp.issubdtype(x.dtype,
                                                          jnp.inexact)
                      else 0) * jnp.asarray(1e-6, x.dtype)
            return acc + jnp.sum(op(xi, *rest).astype(jnp.float32))
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.))

    float(loop(x, *rest))  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.time()
        float(loop(x, *rest))
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2] / K


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    D = 100
    caps = (D, 50, 25, 12)
    # FPN plane sizes for the 800x1344 canvas: P2..P4 strides 4/8/16
    planes = {
        'P2': (1, 200, 336, 256),
        'P3': (1, 100, 168, 256),
        'P4': (1, 50, 84, 256),
    }
    # stage idx -> (out_size, in_ch, plane, n_rois)
    stages = [
        (14, 256, 'P4', caps[0]),
        (28, 128, 'P3', caps[1]),
        (56, 64, 'P2', caps[2]),
    ]

    i = np.arange(D, dtype=np.float32)
    x0 = 10.0 + (i % 10) * 60.0
    y0 = 10.0 + (i // 10) * 60.0
    rois_all = jnp.asarray(np.stack([x0, y0, x0 + 120.0, y0 + 100.0], -1))
    rb_all = jnp.zeros(D, jnp.int32)
    labels_all = jnp.zeros(D, jnp.int32)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    # floor: empty-ish loop (one add)
    floor = timeit(lambda x: x * 2.0, jnp.float32(1.0)) * K
    print(f'loop dispatch floor {floor*1e3:.2f} ms (already divided out)')

    total = 0.0
    for idx, (s, cin, pname, n) in enumerate(stages):
        plane = jnp.asarray(rng.normal(0, 1, planes[pname]).astype(np.float32),
                            dt)
        rois = rois_all[:n]
        rb = rb_all[:n]
        labels = labels_all[:n]
        x = jnp.asarray(rng.normal(0, 1, (n, s, s, cin)), dt)

        w_sem = jnp.asarray(rng.normal(0, 0.05, (1, 1, 256, cin)), dt)
        w_f0 = jnp.asarray(rng.normal(0, 0.05, (1, 1, 2 * cin + 2, cin)), dt)
        w_off = jnp.asarray(rng.normal(0, 0.0, (3, 3, cin, 36)), dt)
        w_dcn = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cin)), dt)
        w_log = jnp.asarray(rng.normal(0, 0.05, (1, 1, cin, 80)), dt)
        w_out = jnp.asarray(rng.normal(0, 0.05, (1, 1, cin, cin // 2 - 2)), dt)

        t_sem = timeit(conv, plane, w_sem)

        proj = jax.jit(conv)(plane, w_sem)
        t_crop = timeit(lambda p, r, b_: simple_roi_align(p, r, b_, s, 0.25),
                        proj, rois, rb)

        t_f0 = timeit(conv,
                      jnp.asarray(rng.normal(0, 1, (n, s, s, 2 * cin + 2)),
                                  dt), w_f0)

        t_off = timeit(conv, x, w_off)
        off_v = jax.jit(conv)(x, w_off)

        t_dcn = timeit(lambda a, o, w: deform_conv2d(
            a, o, w, kernel_size=3, padding=1, deform_groups=2, window=3),
            x, off_v, w_dcn)

        t_log = timeit(lambda a, w, lab: jnp.take_along_axis(
            conv(a, w), lab[:, None, None, None], axis=-1),
            x, w_log, labels)

        t_out = timeit(conv, x, w_out)

        t_up = timeit(lambda a: resize_bilinear_2x(a, align_corners=False),
                      jnp.asarray(rng.normal(0, 1, (n, s, s, cin // 2)), dt))

        su = (t_sem + t_crop + t_f0 + t_off + t_dcn + 2 * t_log + t_out
              + t_up)
        total += su
        print(f'stage{idx} (n={n:3d}, {s}x{s}, c={cin}): '
              f'sem_plane {t_sem*1e3:6.2f}  crop {t_crop*1e3:6.2f}  '
              f'fuse0 {t_f0*1e3:6.2f}  off {t_off*1e3:6.2f}  '
              f'dcn {t_dcn*1e3:6.2f}  logits(x2) {2*t_log*1e3:6.2f}  '
              f'out {t_out*1e3:6.2f}  up {t_up*1e3:6.2f}  '
              f'| sum {su*1e3:6.2f} ms')

    # final stage: 1x1 at 56^2 on caps[3] RoIs + 2x upsample of 1ch logits
    n3 = caps[3]
    xf = jnp.asarray(rng.normal(0, 1, (n3, 56, 56, 32)), dt)
    wf = jnp.asarray(rng.normal(0, 0.05, (1, 1, 32, 1)), dt)
    t_fin = timeit(lambda a, w: resize_bilinear_2x(
        conv(a, w), align_corners=True), xf, wf)
    print(f'final  (n={n3:3d}, 56->112): {2*t_fin*1e3:6.2f} ms')
    total += 2 * t_fin
    print(f'sum of parts: {total*1e3:.2f} ms')


if __name__ == '__main__':
    main()
