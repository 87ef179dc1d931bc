"""Golden-value tests for the native-op layer: RoIAlign vs an independent
numpy port of mmcv's aligned semantics, NMS vs a python greedy reference,
paste_masks vs torch grid_sample (the reference's _do_paste_mask backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynamask_tpu.ops import (roi_align, multilevel_roi_align, map_roi_levels,
                              nms, batched_nms, multiclass_nms, paste_masks)


# ---------------------------------------------------------------- reference impls

def np_bilinear(feat, y, x):
    """mmcv bilinear_interpolate: zero outside [-1, H]; edge clamp inside."""
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[2:], feat.dtype)
    y = min(max(y, 0.0), h - 1)
    x = min(max(x, 0.0), w - 1)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return ((1 - ly) * (1 - lx) * feat[y0, x0] + (1 - ly) * lx * feat[y0, x1] +
            ly * (1 - lx) * feat[y1, x0] + ly * lx * feat[y1, x1])


def np_roi_align(feat, roi, out_size, scale, sr, aligned=True):
    """Slow scalar port of mmcv roi_align_cuda_kernel (avg mode)."""
    off = 0.5 if aligned else 0.0
    x1, y1, x2, y2 = [c * scale - off for c in roi]
    rw, rh = x2 - x1, y2 - y1
    if not aligned:
        rw, rh = max(rw, 1.0), max(rh, 1.0)
    bw, bh = rw / out_size, rh / out_size
    out = np.zeros((out_size, out_size) + feat.shape[2:], np.float32)
    for ph in range(out_size):
        for pw_ in range(out_size):
            acc = 0.0
            for iy in range(sr):
                for ix in range(sr):
                    y = y1 + ph * bh + (iy + 0.5) * bh / sr
                    x = x1 + pw_ * bw + (ix + 0.5) * bw / sr
                    acc = acc + np_bilinear(feat, y, x)
            out[ph, pw_] = acc / (sr * sr)
    return out


def py_greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores, kind='stable')
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(a_i + a - inter, 1e-6)
        suppressed |= iou > thr
        suppressed[i] = False
    return keep


# ---------------------------------------------------------------- roi_align

class TestRoIAlign:
    def test_matches_numpy_reference(self):
        rng = np.random.RandomState(0)
        feat = rng.randn(2, 16, 20, 8).astype(np.float32)
        rois = np.array([
            [4.0, 4.0, 40.0, 36.0],
            [0.0, 0.0, 80.0, 64.0],
            [10.5, 7.25, 30.0, 50.0],
            [-4.0, -4.0, 12.0, 12.0],   # partially outside
        ], np.float32)
        batch = np.array([0, 1, 0, 1], np.int32)
        out = roi_align(jnp.asarray(feat), jnp.asarray(rois),
                        jnp.asarray(batch), out_size=7,
                        spatial_scale=0.25, sampling_ratio=2)
        for i in range(len(rois)):
            ref = np_roi_align(feat[batch[i]], rois[i], 7, 0.25, 2)
            np.testing.assert_allclose(np.asarray(out[i]), ref,
                                       rtol=1e-4, atol=1e-5)

    def test_gradients_flow(self):
        feat = jnp.ones((1, 8, 8, 4))
        rois = jnp.array([[0., 0., 16., 16.]])

        def f(x):
            return roi_align(x, rois, jnp.zeros(1, jnp.int32), 7, 0.5).sum()

        g = jax.grad(f)(feat)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_map_roi_levels(self):
        # reference routing (single_level_roi_extractor.py:32-51), finest 56:
        # sqrt(area) < 112 -> 0, <224 -> 1, <448 -> 2, else 3
        rois = jnp.array([
            [0, 0, 30, 30], [0, 0, 150, 150], [0, 0, 300, 300],
            [0, 0, 600, 600]], jnp.float32)
        lvls = map_roi_levels(rois, 4)
        np.testing.assert_array_equal(np.asarray(lvls), [0, 1, 2, 3])

    def test_multilevel_matches_single_level(self):
        rng = np.random.RandomState(1)
        feats = [jnp.asarray(rng.randn(1, 32 // (2 ** i), 40 // (2 ** i), 8)
                             .astype(np.float32)) for i in range(4)]
        strides = (4, 8, 16, 32)
        # one roi per level
        rois = np.array([
            [4., 4., 60., 60.],      # -> lvl 0
            [0., 0., 130., 130.],    # -> lvl 1
            [0., 0., 260., 250.],    # -> lvl 2
            [0., 0., 600., 500.]], np.float32)  # -> lvl 3
        batch = jnp.zeros(4, jnp.int32)
        out = multilevel_roi_align(feats, jnp.asarray(rois), batch, 7, strides)
        for i in range(4):
            single = roi_align(feats[i], jnp.asarray(rois[i:i + 1]),
                               jnp.zeros(1, jnp.int32), 7, 1.0 / strides[i])
            np.testing.assert_allclose(np.asarray(out[i]), np.asarray(single[0]),
                                       rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- nms

class TestNMS:
    def test_matches_python_greedy(self):
        rng = np.random.RandomState(42)
        n = 200
        centers = rng.uniform(0, 100, (n, 2))
        sizes = rng.uniform(5, 30, (n, 2))
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                               axis=1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)

        ref_keep = py_greedy_nms(boxes, scores, 0.5)
        _, out_scores, out_inds, out_valid = nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool),
            iou_threshold=0.5, max_out=n)
        got = list(np.asarray(out_inds)[np.asarray(out_valid)])
        assert got == ref_keep

    def test_suppression_chain(self):
        # A sup B, B sup C, A !sup C -> greedy keeps A and C (fast-NMS would drop C)
        # IoU(A,B)=IoU(B,C)=0.43 > thr; IoU(A,C)=0.11 < thr
        boxes = np.array([[0, 0, 10, 10], [4, 0, 14, 10], [8, 0, 18, 10]],
                         np.float32)
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        _, _, out_inds, out_valid = nms(jnp.asarray(boxes), jnp.asarray(scores),
                                        jnp.ones(3, bool), 0.3, 3)
        got = list(np.asarray(out_inds)[np.asarray(out_valid)])
        assert got == [0, 2]

    def test_invalid_excluded(self):
        boxes = jnp.asarray(np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32))
        scores = jnp.array([0.5, 0.9])
        valid = jnp.array([True, False])
        _, out_scores, out_inds, out_valid = nms(boxes, scores, valid, 0.5, 2)
        assert int(out_valid.sum()) == 1
        assert int(out_inds[0]) == 0

    def test_batched_nms_no_cross_class(self):
        boxes = jnp.asarray(np.array([[0, 0, 10, 10], [1, 1, 10, 10]], np.float32))
        scores = jnp.array([0.9, 0.8])
        idxs = jnp.array([0, 1])
        _, _, _, out_valid = batched_nms(boxes, scores, idxs,
                                         jnp.ones(2, bool), 0.5, 2)
        assert int(out_valid.sum()) == 2  # different classes, both kept

    def test_multiclass_nms(self):
        n, c = 10, 3
        rng = np.random.RandomState(0)
        boxes = np.tile(np.array([[0., 0., 20., 20.]], np.float32), (n, 1))
        boxes += rng.uniform(0, 1, (n, 4)).astype(np.float32)
        scores = rng.uniform(0, 0.04, (n, c)).astype(np.float32)
        scores[3, 1] = 0.9  # only this one above score_thr
        dets, labels, valid = multiclass_nms(
            jnp.asarray(boxes), jnp.asarray(scores), score_thr=0.05,
            iou_threshold=0.5, max_per_img=5)
        assert int(valid.sum()) == 1
        assert int(labels[0]) == 1
        np.testing.assert_allclose(float(dets[0, 4]), 0.9, rtol=1e-5)


# ---------------------------------------------------------------- paste

class TestPasteMasks:
    def test_matches_torch_grid_sample(self):
        torch = pytest.importorskip('torch')
        import torch.nn.functional as F

        rng = np.random.RandomState(0)
        n, p = 4, 14
        masks = rng.uniform(0, 1, (n, p, p)).astype(np.float32)
        boxes = np.array([
            [5., 5., 25., 30.],
            [0., 0., 64., 48.],
            [-4., -3., 20., 21.],
            [40., 30., 63., 47.]], np.float32)
        h, w = 48, 64

        # torch reference — the reference's _do_paste_mask math
        # (fcn_mask_head.py:240-309)
        tm = torch.from_numpy(masks)[:, None]
        x0, y0, x1, y1 = [torch.from_numpy(boxes[:, i:i + 1]) for i in range(4)]
        img_y = (torch.arange(h, dtype=torch.float32) + 0.5)[None]
        img_x = (torch.arange(w, dtype=torch.float32) + 0.5)[None]
        gy = (img_y - y0) / (y1 - y0) * 2 - 1
        gx = (img_x - x0) / (x1 - x0) * 2 - 1
        gx_e = gx[:, None, :].expand(n, h, w)
        gy_e = gy[:, :, None].expand(n, h, w)
        grid = torch.stack([gx_e, gy_e], dim=3)
        ref = F.grid_sample(tm, grid, align_corners=False)[:, 0].numpy()

        out = paste_masks(jnp.asarray(masks), jnp.asarray(boxes), h, w)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    def test_chunked_equals_unchunked(self):
        rng = np.random.RandomState(1)
        masks = jnp.asarray(rng.uniform(0, 1, (10, 8, 8)).astype(np.float32))
        boxes = jnp.asarray(
            np.array([[2, 2, 20, 20]] * 10, np.float32) +
            rng.uniform(0, 5, (10, 4)).astype(np.float32))
        a = paste_masks(masks, boxes, 32, 32, chunk=3)
        b = paste_masks(masks, boxes, 32, 32, chunk=100)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestSoftNMS:
    def test_linear_decay_matches_numpy(self):
        """Greedy soft-NMS (linear) vs a direct numpy implementation."""
        from dynamask_tpu.ops.nms import soft_nms
        r = np.random.RandomState(0)
        n = 40
        boxes = np.zeros((n, 4), np.float32)
        boxes[:, 0] = r.uniform(0, 50, n)
        boxes[:, 1] = r.uniform(0, 50, n)
        boxes[:, 2] = boxes[:, 0] + r.uniform(10, 30, n)
        boxes[:, 3] = boxes[:, 1] + r.uniform(10, 30, n)
        scores = r.uniform(0.1, 1.0, n).astype(np.float32)

        # numpy reference
        def np_iou(a, b):
            lt = np.maximum(a[:2], b[:2]); rb = np.minimum(a[2:], b[2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            aa = (a[2]-a[0])*(a[3]-a[1]); bb = (b[2]-b[0])*(b[3]-b[1])
            return inter / max(aa + bb - inter, 1e-9)
        pool_s = scores.copy()
        alive = np.ones(n, bool)
        exp_idx, exp_score = [], []
        for _ in range(n):
            if not alive.any() or pool_s[alive].max() < 1e-3:
                break
            cand = np.where(alive, pool_s, -np.inf)
            b_i = int(np.argmax(cand))
            exp_idx.append(b_i); exp_score.append(pool_s[b_i])
            alive[b_i] = False
            for j in range(n):
                if alive[j]:
                    iou = np_iou(boxes[b_i], boxes[j])
                    if iou > 0.3:
                        pool_s[j] *= (1.0 - iou)
                    if pool_s[j] < 1e-3:
                        alive[j] = False

        ob, osc, oi, ov = soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                   jnp.ones(n, bool), iou_threshold=0.3,
                                   max_out=n)
        got = int(np.asarray(ov).sum())
        assert got == len(exp_idx), (got, len(exp_idx))
        np.testing.assert_array_equal(np.asarray(oi)[:got], exp_idx)
        np.testing.assert_allclose(np.asarray(osc)[:got], exp_score,
                                   rtol=1e-5)

    def test_gaussian_runs(self):
        from dynamask_tpu.ops.nms import soft_nms
        boxes = jnp.asarray([[0., 0., 10., 10.], [1., 1., 11., 11.],
                             [50., 50., 60., 60.]])
        scores = jnp.asarray([0.9, 0.8, 0.7])
        _, osc, oi, ov = soft_nms(boxes, scores, jnp.ones(3, bool),
                                  method='gaussian', max_out=3)
        assert bool(ov[0]) and float(osc[0]) == pytest.approx(0.9)
        # the overlapping box is decayed but kept (score > min)
        assert int(np.asarray(ov).sum()) == 3


class TestPallasWindowedDCN:
    def test_matches_xla_windowed(self):
        """Interpret-mode exactness vs the XLA windowed path (the default;
        see the kernel docstring for the recorded v5e profile that keeps
        XLA the default)."""
        from dynamask_tpu.ops.deform_conv import deform_conv2d
        from dynamask_tpu.ops.deform_conv_pallas import (
            deform_conv2d_windowed_pallas)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (3, 12, 12, 8), jnp.float32)
        off = jax.random.uniform(key, (3, 12, 12, 36), minval=-2.0,
                                 maxval=2.0)
        w = jax.random.normal(key, (3, 3, 8, 16)) * 0.1
        ref = deform_conv2d(x, off, w, deform_groups=2, roi_chunk=0,
                            window=3)
        got = deform_conv2d_windowed_pallas(x, off, w, deform_groups=2,
                                            window=3, interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=1e-5, atol=1e-5)

    def test_frame_kernel_matches_xla_windowed(self):
        """Interpret-mode exactness of the lane-packed frame kernel (the
        TPU forward dispatch of deform_conv2d(window=...)) vs the XLA
        windowed path that provides its gradients."""
        from dynamask_tpu.ops.deform_conv import deform_conv2d
        from dynamask_tpu.ops.deform_conv_pallas import deform_conv2d_frame
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (3, 12, 12, 8), jnp.float32)
        off = jax.random.uniform(key, (3, 12, 12, 36), minval=-5.0,
                                 maxval=5.0)
        w = jax.random.normal(key, (3, 3, 8, 16)) * 0.1
        ref = deform_conv2d(x, off, w, deform_groups=2, roi_chunk=0,
                            window=3)
        got = deform_conv2d_frame(x, off, w, deform_groups=2, window=3,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=1e-5, atol=1e-5)

    def test_rowmm_kernel_matches_xla_windowed(self):
        """Interpret-mode exactness of the row-matmul (MXU) kernel vs the
        XLA windowed path whose semantics it reimplements."""
        from dynamask_tpu.ops.deform_conv import deform_conv2d_windowed
        from dynamask_tpu.ops.deform_conv_pallas import deform_conv2d_rowmm
        key = jax.random.PRNGKey(3)
        ks = jax.random.split(key, 3)
        x = jax.random.normal(ks[0], (3, 12, 12, 8), jnp.float32)
        off = jax.random.uniform(ks[1], (3, 12, 12, 36), minval=-5.0,
                                 maxval=5.0)
        w = jax.random.normal(ks[2], (3, 3, 8, 16)) * 0.1
        ref = deform_conv2d_windowed(x, off, w, deform_groups=2, window=3)
        got = deform_conv2d_rowmm(x, off, w, deform_groups=2, window=3,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=1e-4, atol=1e-4)

    def test_rowmm_yfold_kernel_matches_xla_windowed(self):
        """Interpret-mode exactness of the y-folded row-matmul form
        (selected when cg >= 64) vs the XLA windowed path, covering both a
        multiple-of-8 plane and the 14^2-like odd plane size."""
        from dynamask_tpu.ops.deform_conv import deform_conv2d_windowed
        from dynamask_tpu.ops.deform_conv_pallas import deform_conv2d_rowmm
        for S in (8, 14):
            ks = jax.random.split(jax.random.PRNGKey(11 + S), 3)
            x = jax.random.normal(ks[0], (2, S, S, 128), jnp.float32)
            off = jax.random.uniform(ks[1], (2, S, S, 36), minval=-5.0,
                                     maxval=5.0)
            w = jax.random.normal(ks[2], (3, 3, 128, 16)) * 0.1
            ref = deform_conv2d_windowed(x, off, w, deform_groups=2,
                                         window=3)
            got = deform_conv2d_rowmm(x, off, w, deform_groups=2, window=3,
                                      interpret=True)
            np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                       rtol=1e-4, atol=1e-4)

    def test_rowmm_vjp_matches_windowed_autodiff(self):
        """Analytic matrix-form backward == autodiff of the XLA windowed
        path, for all three gradients (interpret mode)."""
        import functools
        from dynamask_tpu.ops.deform_conv import deform_conv2d_windowed
        from dynamask_tpu.ops.deform_conv_pallas import deform_conv2d_rowmm_ad
        ks = jax.random.split(jax.random.PRNGKey(5), 4)
        n, S, c, co, g = 2, 12, 8, 16, 2
        x = jax.random.normal(ks[0], (n, S, S, c), jnp.float32)
        off = jax.random.uniform(ks[1], (n, S, S, g * 18), minval=-4.5,
                                 maxval=4.5)
        w = jax.random.normal(ks[2], (3, 3, c, co)) * 0.1
        ct = jax.random.normal(ks[3], (n, S, S, co))
        _, ref_vjp = jax.vjp(
            lambda xx, oo, ww: deform_conv2d_windowed(
                xx, oo, ww, deform_groups=g, window=3), x, off, w)
        f = functools.partial(deform_conv2d_rowmm_ad, kernel_size=3,
                              padding=1, dilation=1, deform_groups=g,
                              window=3, interpret=True)
        _, got_vjp = jax.vjp(f, x, off, w)
        for r, got in zip(ref_vjp(ct), got_vjp(ct)):
            np.testing.assert_allclose(np.asarray(r), np.asarray(got),
                                       rtol=2e-3, atol=2e-3)

    def test_windowed_analytic_vjp_matches_autodiff(self):
        """The windowed path's custom analytic backward == autodiff of the
        raw formulation for d_x / d_offsets / d_weights (non-square input,
        grouped, offsets past the window edge exercise the clip mask)."""
        from dynamask_tpu.ops.deform_conv import (
            deform_conv2d_windowed, _deform_conv2d_windowed_ref)
        ks = jax.random.split(jax.random.PRNGKey(7), 4)
        n, h, w, c, co, g, D = 2, 6, 9, 8, 16, 2, 2
        x = jax.random.normal(ks[0], (n, h, w, c), jnp.float32)
        off = jax.random.uniform(ks[1], (n, h, w, g * 18), minval=-3.5,
                                 maxval=3.5)
        wt = jax.random.normal(ks[2], (3, 3, c, co)) * 0.1
        ct = jax.random.normal(ks[3], (n, h, w, co))
        _, ref_vjp = jax.vjp(
            lambda xx, oo, ww: _deform_conv2d_windowed_ref(
                xx, oo, ww, deform_groups=g, window=D), x, off, wt)
        _, got_vjp = jax.vjp(
            lambda xx, oo, ww: deform_conv2d_windowed(
                xx, oo, ww, deform_groups=g, window=D), x, off, wt)
        for r, got in zip(ref_vjp(ct), got_vjp(ct)):
            np.testing.assert_allclose(np.asarray(r), np.asarray(got),
                                       rtol=1e-4, atol=1e-4)


class TestSeparableRoIAlign:
    def test_matches_gather_path(self):
        from dynamask_tpu.ops.roi_align import roi_align, roi_align_separable
        key = jax.random.PRNGKey(0)
        feats = jax.random.normal(key, (1, 25, 42, 16), jnp.float32)
        rois = jnp.asarray([[0., 0., 80., 60.],      # normal
                            [-10., -5., 30., 30.],   # out-of-bounds corner
                            [100., 40., 180., 99.],  # right edge overhang
                            [5., 5., 5., 5.]])       # degenerate
        rb = jnp.zeros(4, jnp.int32)
        for s in (1, 2):
            ref = roi_align(feats, rois, rb, 56, 0.25, sampling_ratio=s)
            got = roi_align_separable(feats, rois, 56, 0.25,
                                      sampling_ratio=s)
            np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                       rtol=1e-4, atol=1e-5)

    def test_grouped_matches_gather_path(self):
        # the bs>1 training form: (B, K) statically-grouped RoIs crop from
        # their own image's plane via per-image interp matmuls
        from dynamask_tpu.ops.roi_align import (roi_align,
                                                roi_align_separable_grouped)
        key = jax.random.PRNGKey(2)
        b, k = 4, 5
        feats = jax.random.normal(key, (b, 25, 42, 16), jnp.float32)
        rois = jax.random.uniform(jax.random.PRNGKey(3), (b, k, 4),
                                  minval=-10., maxval=170.)
        rois = jnp.concatenate([jnp.minimum(rois[..., :2], rois[..., 2:]),
                                jnp.maximum(rois[..., :2], rois[..., 2:])],
                               -1)
        rb = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
        for s in (1, 2):
            ref = roi_align(feats, rois.reshape(b * k, 4), rb, 28, 0.25,
                            sampling_ratio=s)
            got = roi_align_separable_grouped(feats, rois, 28, 0.25,
                                              sampling_ratio=s)
            np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                       rtol=1e-4, atol=1e-5)

    def test_grouped_gradients_match(self):
        # backward (the training path): plane cotangents agree with the
        # gather path's scatter-add adjoint
        from dynamask_tpu.ops.roi_align import (roi_align,
                                                roi_align_separable_grouped)
        b, k = 2, 3
        feats = jax.random.normal(jax.random.PRNGKey(4), (b, 20, 30, 8))
        rois = jnp.asarray([[[0., 0., 60., 50.], [-8., -4., 30., 30.],
                             [70., 30., 130., 90.]],
                            [[10., 10., 100., 70.], [0., 0., 119., 79.],
                             [5., 5., 5., 5.]]])
        rb = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)

        def f_ref(x):
            return jnp.sum(jnp.sin(roi_align(
                x, rois.reshape(b * k, 4), rb, 14, 0.25, sampling_ratio=1)))

        def f_got(x):
            return jnp.sum(jnp.sin(roi_align_separable_grouped(
                x, rois, 14, 0.25, sampling_ratio=1)))

        g_ref = jax.grad(f_ref)(feats)
        g_got = jax.grad(f_got)(feats)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_matches_gather_path_tall_plane(self):
        # H > W exercises the y-first contraction branch (the wide-plane
        # branch contracts x first to shrink the materialized intermediate)
        from dynamask_tpu.ops.roi_align import roi_align, roi_align_separable
        key = jax.random.PRNGKey(1)
        feats = jax.random.normal(key, (1, 42, 25, 16), jnp.float32)
        rois = jnp.asarray([[0., 0., 60., 80.],
                            [-10., -5., 30., 30.],
                            [40., 100., 99., 160.]])
        rb = jnp.zeros(3, jnp.int32)
        for s in (1, 2):
            ref = roi_align(feats, rois, rb, 56, 0.25, sampling_ratio=s)
            got = roi_align_separable(feats, rois, 56, 0.25,
                                      sampling_ratio=s)
            np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                       rtol=1e-4, atol=1e-5)


class TestConvSpaceToBatchW:
    def test_banded_conv_chain_exact(self):
        # banded == direct for a 3x3 SAME + relu + 1x1 chain (halo 1);
        # plane big enough to clear the min_elems gate
        import flax.linen as nn
        from dynamask_tpu.models.layers import conv_space_to_batch_w

        class Tower(nn.Module):
            @nn.compact
            def __call__(self, x):
                t = nn.relu(nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)],
                                    name='c3')(x))
                return nn.Conv(3, (1, 1), name='c1')(t), \
                    nn.Conv(12, (1, 1), name='c1b')(t)

        m = Tower()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 128, 256),
                              jnp.float32)
        v = m.init(jax.random.PRNGKey(1), x)
        direct = m.apply(v, x)
        banded = conv_space_to_batch_w(
            x, lambda xx: m.apply(v, xx), halo=1, nb=8, min_elems=1)
        for d, b in zip(direct, banded):
            assert d.shape == b.shape
            np.testing.assert_allclose(np.asarray(d), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_fallthrough_on_indivisible_width(self):
        from dynamask_tpu.models.layers import conv_space_to_batch_w
        x = jnp.ones((1, 8, 30, 4))
        out = conv_space_to_batch_w(x, lambda xx: xx * 2, halo=1, nb=8,
                                    min_elems=1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x * 2))

    def test_banded_deep_tower_per_conv_exact(self):
        # stacked 3x3 chains must band PER CONV: a single banded call over
        # the whole chain differs at the true image edges (the direct path
        # re-applies SAME zero padding at every layer), while per-conv
        # banding is exact — the RetinaHead tower pattern
        import flax.linen as nn
        from dynamask_tpu.models.layers import conv_space_to_batch_w

        class Deep(nn.Module):
            banded: bool = False

            @nn.compact
            def __call__(self, x):
                for i in range(3):
                    conv = nn.Conv(24, (3, 3), padding=[(1, 1), (1, 1)],
                                   name=f'c{i}')
                    if self.banded:
                        x = conv_space_to_batch_w(
                            x, lambda t, c=conv: nn.relu(c(t)), halo=1,
                            nb=8, min_elems=1)
                    else:
                        x = nn.relu(conv(x))
                return x

        x = jax.random.normal(jax.random.PRNGKey(2), (2, 40, 64, 24),
                              jnp.float32)
        v = Deep().init(jax.random.PRNGKey(3), x)
        direct = Deep().apply(v, x)
        banded = Deep(banded=True).apply(v, x)
        np.testing.assert_allclose(np.asarray(direct), np.asarray(banded),
                                   rtol=1e-5, atol=1e-5)

        # and the whole-chain form is documented-inexact at the edges:
        whole = conv_space_to_batch_w(
            x, lambda xx: Deep().apply(v, xx), halo=3, nb=8, min_elems=1)
        err = np.abs(np.asarray(direct) - np.asarray(whole))
        assert err[:, :, 3:-3, :].max() < 1e-5   # interior exact
        assert err.max() > 1e-3                  # edges differ


class TestMaskTargetsSeparable:
    def test_matches_gather_roi_align(self):
        # the separable per-RoI-plane form must reproduce the gather
        # RoIAlign it replaced (core/mask_targets.py)
        from dynamask_tpu.core.mask_targets import mask_targets_from_crops
        rng = np.random.RandomState(3)
        b, g, s, r = 2, 5, 32, 16
        gt_crops = rng.rand(b, g, s, s).astype(np.float32)
        gt_windows = np.zeros((b, g, 4), np.float32)
        gt_windows[..., 0] = rng.uniform(0, 50, (b, g))
        gt_windows[..., 1] = rng.uniform(0, 50, (b, g))
        gt_windows[..., 2] = gt_windows[..., 0] + rng.uniform(20, 80, (b, g))
        gt_windows[..., 3] = gt_windows[..., 1] + rng.uniform(20, 80, (b, g))
        rois = np.zeros((r, 4), np.float32)
        rois[:, 0] = rng.uniform(0, 90, r)
        rois[:, 1] = rng.uniform(0, 90, r)
        rois[:, 2] = rois[:, 0] + rng.uniform(5, 40, r)
        rois[:, 3] = rois[:, 1] + rng.uniform(5, 40, r)
        roi_batch = rng.randint(0, b, r).astype(np.int32)
        roi_gt = rng.randint(0, g, r).astype(np.int32)
        img_hw = np.array([[128, 128]] * b, np.float32)

        for out_size in (14, 28):
            got = mask_targets_from_crops(
                jnp.asarray(gt_crops), jnp.asarray(gt_windows),
                jnp.asarray(rois), jnp.asarray(roi_batch),
                jnp.asarray(roi_gt), jnp.asarray(img_hw), out_size)

            # gather reference: crop each RoI from its own plane via the
            # batched roi_align (the pre-separable formulation)
            flat_gt = roi_batch * g + roi_gt
            win = gt_windows.reshape(b * g, 4)[flat_gt]
            hw = img_hw[roi_batch]
            x1 = np.clip(rois[:, 0], 0, hw[:, 1])
            y1 = np.clip(rois[:, 1], 0, hw[:, 0])
            x2 = np.clip(rois[:, 2], 0, hw[:, 1])
            y2 = np.clip(rois[:, 3], 0, hw[:, 0])
            sx = s / np.maximum(win[:, 2] - win[:, 0], 1e-6)
            sy = s / np.maximum(win[:, 3] - win[:, 1], 1e-6)
            crop_rois = np.stack([(x1 - win[:, 0]) * sx,
                                  (y1 - win[:, 1]) * sy,
                                  (x2 - win[:, 0]) * sx,
                                  (y2 - win[:, 1]) * sy], -1)
            feats = gt_crops.reshape(b * g, s, s, 1)
            ref = roi_align(jnp.asarray(feats), jnp.asarray(crop_rois),
                            jnp.asarray(flat_gt.astype(np.int32)), out_size,
                            1.0, sampling_ratio=2, aligned=True)
            ref_bin = (np.asarray(ref)[..., 0] >= 0.5).astype(np.float32)
            assert np.mean(np.asarray(got) == ref_bin) > 0.999
