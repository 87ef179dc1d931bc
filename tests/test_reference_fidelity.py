"""Reference-fidelity golden tests against torch-computed semantics.

SURVEY.md §7 hard-part 3: RoIAlign(aligned=True), box decode clamping and
mask pasting must match the reference's numerical behavior for COCO-eval
parity. torch (CPU) is available in the test env; torchvision is NOT, so
the references here are built from torch primitives the reference itself
uses (F.grid_sample, the mmcv delta2bbox formula) rather than independent
numpy ports.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dynamask_tpu.ops.roi_align import roi_align, simple_roi_align
from dynamask_tpu.core.bbox_transforms import delta2bbox, bbox2delta


def torch_roi_align_ref(feats_nchw, rois, out_size, spatial_scale,
                        sampling_ratio):
    """mmcv RoIAlign(aligned=True) reference built on F.grid_sample:
    each output bin averages sampling_ratio^2 bilinear taps whose positions
    follow the aligned=True pixel-center convention
    (mmcv roi_align CUDA kernel semantics)."""
    n, c, h, w = feats_nchw.shape
    outs = []
    s = sampling_ratio
    for roi in rois:
        x1 = roi[0] * spatial_scale - 0.5
        y1 = roi[1] * spatial_scale - 0.5
        x2 = roi[2] * spatial_scale - 0.5
        y2 = roi[3] * spatial_scale - 0.5
        bw = (x2 - x1) / out_size
        bh = (y2 - y1) / out_size
        # sample grid: (i + (j+0.5)/s) per bin
        grid = (np.arange(out_size)[:, None] +
                (np.arange(s)[None, :] + 0.5) / s).reshape(-1)
        ys = y1 + bh * grid           # (out*s,)
        xs = x1 + bw * grid
        gy, gx = np.meshgrid(ys, xs, indexing='ij')
        # grid_sample normalized coords, align_corners=False:
        # norm = (2*coord + 1)/size - 1
        ny = (2 * gy + 1) / h - 1
        nx = (2 * gx + 1) / w - 1
        g = torch.from_numpy(
            np.stack([nx, ny], -1)[None].astype(np.float32))
        # mmcv bilinear boundary rule: coords in (-1, 0) / (extent-1, extent)
        # CLAMP to the edge (grid_sample 'border'), while samples fully
        # outside (-1, extent) contribute zero — apply that mask explicitly.
        sampled = F.grid_sample(feats_nchw[:1], g, mode='bilinear',
                                padding_mode='border', align_corners=False)
        inside = ((gy > -1.0) & (gy < h) & (gx > -1.0) & (gx < w))
        sampled = sampled * torch.from_numpy(
            inside.astype(np.float32))[None, None]
        sampled = sampled[0].reshape(c, out_size, s, out_size, s)
        outs.append(sampled.mean(dim=(2, 4)))
    return torch.stack(outs)          # (R, C, out, out)


class TestRoIAlignFidelity:
    def test_matches_grid_sample_composition(self):
        r = np.random.RandomState(0)
        feats = r.randn(1, 24, 32, 8).astype(np.float32)
        rois = np.array([
            [4.0, 4.0, 60.0, 44.0],
            [0.0, 0.0, 30.0, 30.0],
            [13.3, 7.7, 99.1, 55.5],
            [2.0, 2.0, 10.0, 10.0],
        ], np.float32)
        scale, out, s = 0.25, 7, 2
        got = roi_align(jnp.asarray(feats), jnp.asarray(rois),
                        jnp.zeros(4, jnp.int32), out, scale,
                        sampling_ratio=s)
        ref = torch_roi_align_ref(
            torch.from_numpy(feats.transpose(0, 3, 1, 2)), rois, out,
            scale, s).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4,
                                   atol=1e-5)

    def test_simple_roi_align_single_tap(self):
        """sampling_ratio=1 crop (SFM semantic crops) vs grid_sample."""
        r = np.random.RandomState(1)
        feats = r.randn(1, 16, 16, 4).astype(np.float32)
        rois = np.array([[3.0, 5.0, 40.0, 50.0]], np.float32)
        got = simple_roi_align(jnp.asarray(feats), jnp.asarray(rois),
                               jnp.zeros(1, jnp.int32), 14, 0.25)
        ref = torch_roi_align_ref(
            torch.from_numpy(feats.transpose(0, 3, 1, 2)), rois, 14,
            0.25, 1).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4,
                                   atol=1e-5)


class TestDeltaDecodeFidelity:
    def test_delta2bbox_wh_clamp(self):
        """mmdet delta2bbox clamps dw/dh at log(1000/16)
        (coder/delta_xywh_bbox_coder.py:delta2bbox) — reproduce in torch."""
        rois = np.array([[0., 0., 10., 10.], [5., 5., 50., 30.]], np.float32)
        deltas = np.array([[0.5, -0.2, 5.0, -7.0],
                           [0.0, 0.0, 0.1, 0.2]], np.float32)
        means = (0., 0., 0., 0.)
        stds = (0.1, 0.1, 0.2, 0.2)

        t_rois = torch.from_numpy(rois)
        t_del = torch.from_numpy(deltas)
        m = torch.tensor(means).repeat(1)
        s = torch.tensor(stds)
        den = t_del * s + torch.tensor(means)
        dx, dy, dw, dh = den.unbind(-1)
        max_ratio = float(np.abs(np.log(1000.0 / 16)))
        dw = dw.clamp(-max_ratio, max_ratio)
        dh = dh.clamp(-max_ratio, max_ratio)
        px = (t_rois[:, 0] + t_rois[:, 2]) * 0.5
        py = (t_rois[:, 1] + t_rois[:, 3]) * 0.5
        pw = t_rois[:, 2] - t_rois[:, 0]
        ph = t_rois[:, 3] - t_rois[:, 1]
        gw = pw * dw.exp()
        gh = ph * dh.exp()
        gx = px + pw * dx
        gy = py + ph * dy
        ref = torch.stack([gx - gw * 0.5, gy - gh * 0.5,
                           gx + gw * 0.5, gy + gh * 0.5], -1).numpy()

        got = delta2bbox(jnp.asarray(rois), jnp.asarray(deltas), means, stds)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5,
                                   atol=1e-4)

    def test_encode_decode_roundtrip(self):
        r = np.random.RandomState(2)
        rois = np.abs(r.randn(16, 4).astype(np.float32)) * 20
        rois[:, 2:] = rois[:, :2] + np.abs(r.randn(16, 2).astype(
            np.float32)) * 30 + 4
        gts = rois + r.randn(16, 4).astype(np.float32) * 2
        means, stds = (0., 0., 0., 0.), (0.1, 0.1, 0.2, 0.2)
        d = bbox2delta(jnp.asarray(rois), jnp.asarray(gts), means, stds)
        back = delta2bbox(jnp.asarray(rois), d, means, stds)
        np.testing.assert_allclose(np.asarray(back), gts, rtol=1e-3,
                                   atol=1e-3)
