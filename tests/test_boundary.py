"""Boundary/detail target tests — golden values vs a torch port of the
reference algorithms (generate_block_target: cross_entropy_loss.py:123-154;
DetailTarget: cross_entropy_loss.py:363-418)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dynamask_tpu.core import (generate_block_target, detail_target,
                               interpolate_bilinear)


def torch_generate_block_target(mask_np, boundary_width):
    torch = pytest.importorskip('torch')
    import torch.nn.functional as F
    mask = torch.from_numpy(mask_np).float()
    k = 2 * boundary_width + 1
    lap = -torch.ones(1, 1, k, k)
    lap[0, 0, boundary_width, boundary_width] = k * k - 1
    pad = F.pad(mask.unsqueeze(1), (boundary_width,) * 4, 'constant', 0)
    pos = F.conv2d(pad, lap).clamp(min=0) / float(k * k)
    pos = (pos > 0.1).float().squeeze(1)
    neg = F.conv2d(1 - pad, lap).clamp(min=0) / float(k * k)
    neg = (neg > 0.1).float().squeeze(1)
    block = torch.zeros_like(mask).long()
    block[(pos + neg) > 0] = 1
    block[(mask - pos) > 0] = 2
    return block.numpy()


class TestGenerateBlockTarget:
    def _square_mask(self, size=20, lo=5, hi=15):
        m = np.zeros((1, size, size), np.float32)
        m[0, lo:hi, lo:hi] = 1
        return m

    @pytest.mark.parametrize('bw', [1, 2, 3])
    def test_matches_torch_port(self, bw):
        rng = np.random.RandomState(0)
        masks = (rng.uniform(0, 1, (3, 28, 28)) > 0.6).astype(np.float32)
        ref = torch_generate_block_target(masks, bw)
        got = np.asarray(generate_block_target(jnp.asarray(masks), bw))
        np.testing.assert_array_equal(got, ref)

    def test_square_structure(self):
        m = self._square_mask()
        block = np.asarray(generate_block_target(jnp.asarray(m), 1))[0]
        # deep interior is 2, far background 0, edge ring is 1
        assert block[10, 10] == 2
        assert block[0, 0] == 0
        assert block[5, 10] == 1   # on the mask edge
        assert (block == 1).any() and (block == 2).any()


class TestDetailTarget:
    def test_matches_torch_port(self):
        torch = pytest.importorskip('torch')
        import torch.nn.functional as F
        rng = np.random.RandomState(1)
        masks = (rng.uniform(0, 1, (2, 28, 28)) > 0.55).astype(np.float32)

        gt = torch.from_numpy(masks)
        lap = torch.tensor([-1., -1., -1., -1., 8., -1., -1., -1., -1.]
                           ).reshape(1, 1, 3, 3)
        fuse = torch.tensor([[7. / 10], [3. / 10]]).reshape(1, 2, 1, 1)
        b = F.conv2d(gt.unsqueeze(1), lap, padding=1).clamp(min=0)
        b = (b > 0.1).float()
        b2 = F.conv2d(gt.unsqueeze(1), lap, stride=2, padding=1).clamp(min=0)
        b2 = F.interpolate(b2, b.shape[2:], mode='nearest')
        b2 = (b2 > 0.1).float()
        pyr = torch.stack((b, b2), dim=1).squeeze(2)
        ref = F.conv2d(pyr, fuse)
        ref = (ref > 0.1).float().squeeze(1).numpy()

        got = np.asarray(detail_target(jnp.asarray(masks)))
        np.testing.assert_array_equal(got, ref)


class TestInterpolate:
    def test_matches_torch_align_corners(self):
        torch = pytest.importorskip('torch')
        import torch.nn.functional as F
        rng = np.random.RandomState(2)
        x = rng.randn(2, 3, 14, 14).astype(np.float32)
        ref = F.interpolate(torch.from_numpy(x), (28, 28), mode='bilinear',
                            align_corners=True).numpy()
        got = np.asarray(interpolate_bilinear(jnp.asarray(x), 28, 28,
                                              align_corners=True))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_downsample(self):
        torch = pytest.importorskip('torch')
        import torch.nn.functional as F
        rng = np.random.RandomState(3)
        x = rng.randn(1, 1, 56, 56).astype(np.float32)
        ref = F.interpolate(torch.from_numpy(x), (28, 28), mode='bilinear',
                            align_corners=True).numpy()
        got = np.asarray(interpolate_bilinear(jnp.asarray(x), 28, 28))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
