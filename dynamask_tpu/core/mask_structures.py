"""Host-side mask containers.

Rebuild of the reference mask structures (reference: mmdet/core/mask/
structures.py — BitmapMasks with rescale/resize/flip/pad/crop/
crop_and_resize/expand/area/to_ndarray, PolygonMasks with the same surface +
to_bitmap). These live on the HOST side of this framework (annotation
handling, tests, tooling); the device path ships fixed-size per-GT crops
instead (data/formatting.py). Kept API-compatible so reference-style code and
tests port directly.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import numpy as np


class BitmapMasks:
    """Masks as a (N, H, W) uint8 stack (structures.py BitmapMasks)."""

    def __init__(self, masks, height: int, width: int):
        self.height = height
        self.width = width
        if len(masks) == 0:
            self.masks = np.empty((0, height, width), np.uint8)
        else:
            self.masks = np.stack(masks).reshape(-1, height, width) \
                .astype(np.uint8)
            assert self.masks.shape[1] == height
            assert self.masks.shape[2] == width

    def __len__(self) -> int:
        return len(self.masks)

    def __getitem__(self, index) -> 'BitmapMasks':
        masks = self.masks[index].reshape(-1, self.height, self.width)
        return BitmapMasks(masks, self.height, self.width)

    def __iter__(self):
        return iter(self.masks)

    def rescale(self, scale, interpolation='nearest') -> 'BitmapMasks':
        import cv2
        if isinstance(scale, (float, int)):
            new_w = int(self.width * scale + 0.5)
            new_h = int(self.height * scale + 0.5)
        else:  # (max_long, max_short)
            max_long, max_short = max(scale), min(scale)
            f = min(max_long / max(self.height, self.width),
                    max_short / min(self.height, self.width))
            new_w = int(self.width * f + 0.5)
            new_h = int(self.height * f + 0.5)
        if len(self) == 0:
            return BitmapMasks([], new_h, new_w)
        masks = np.stack([
            cv2.resize(m, (new_w, new_h),
                       interpolation=cv2.INTER_NEAREST)
            for m in self.masks])
        return BitmapMasks(masks, new_h, new_w)

    def resize(self, out_shape: Tuple[int, int],
               interpolation='nearest') -> 'BitmapMasks':
        import cv2
        h, w = out_shape
        if len(self) == 0:
            return BitmapMasks([], h, w)
        masks = np.stack([
            cv2.resize(m, (w, h), interpolation=cv2.INTER_NEAREST)
            for m in self.masks])
        return BitmapMasks(masks, h, w)

    def flip(self, flip_direction='horizontal') -> 'BitmapMasks':
        assert flip_direction in ('horizontal', 'vertical')
        axis = 2 if flip_direction == 'horizontal' else 1
        return BitmapMasks(np.flip(self.masks, axis=axis),
                           self.height, self.width)

    def pad(self, out_shape: Tuple[int, int], pad_val: int = 0
            ) -> 'BitmapMasks':
        h, w = out_shape
        if len(self) == 0:
            return BitmapMasks([], h, w)
        padded = np.full((len(self), h, w), pad_val, np.uint8)
        padded[:, :self.height, :self.width] = self.masks
        return BitmapMasks(padded, h, w)

    def crop(self, bbox: np.ndarray) -> 'BitmapMasks':
        x1, y1, x2, y2 = np.asarray(bbox).astype(int).flatten()[:4]
        x1 = np.clip(x1, 0, self.width)
        y1 = np.clip(y1, 0, self.height)
        x2 = np.clip(x2, x1 + 1, self.width)
        y2 = np.clip(y2, y1 + 1, self.height)
        return BitmapMasks(self.masks[:, y1:y2, x1:x2], y2 - y1, x2 - x1)

    def crop_and_resize(self, bboxes: np.ndarray,
                        out_shape: Tuple[int, int],
                        inds: np.ndarray,
                        device=None,
                        interpolation='bilinear') -> 'BitmapMasks':
        """GT-mask target extraction (structures.py:256-286): crop each
        bbox's assigned mask and resize, ≥0.5 binarized. Device arg accepted
        for signature parity; the computation is numpy/jax-roi_align."""
        import jax.numpy as jnp
        from ..ops.roi_align import roi_align
        out_h, out_w = out_shape
        assert out_h == out_w, 'square targets (reference uses _pair)'
        n = len(bboxes)
        if n == 0 or len(self) == 0:
            return BitmapMasks([], out_h, out_w)
        feats = jnp.asarray(self.masks[:, :, :, None], jnp.float32)
        rois = jnp.asarray(bboxes, jnp.float32)
        batch = jnp.asarray(inds, jnp.int32)
        out = roi_align(feats, rois, batch, out_h, 1.0, sampling_ratio=2,
                        aligned=True)
        masks = (np.asarray(out[..., 0]) >= 0.5).astype(np.uint8)
        return BitmapMasks(masks, out_h, out_w)

    def expand(self, expanded_h: int, expanded_w: int, top: int,
               left: int) -> 'BitmapMasks':
        if len(self) == 0:
            return BitmapMasks([], expanded_h, expanded_w)
        out = np.zeros((len(self), expanded_h, expanded_w), np.uint8)
        out[:, top:top + self.height, left:left + self.width] = self.masks
        return BitmapMasks(out, expanded_h, expanded_w)

    @property
    def areas(self) -> np.ndarray:
        return self.masks.sum((1, 2))

    def to_ndarray(self) -> np.ndarray:
        return self.masks

    def to_tensor(self, dtype=None, device=None):
        import jax.numpy as jnp
        return jnp.asarray(self.masks, dtype or jnp.uint8)


class PolygonMasks:
    """Masks as per-instance polygon lists (structures.py:314-)."""

    def __init__(self, masks: Sequence[Sequence[np.ndarray]], height: int,
                 width: int):
        self.height = height
        self.width = width
        self.masks = [[np.asarray(p, np.float32).reshape(-1) for p in m]
                      for m in masks]

    def __len__(self) -> int:
        return len(self.masks)

    def __getitem__(self, index) -> 'PolygonMasks':
        if isinstance(index, (int, np.integer)):
            sel = [self.masks[index]]
        elif isinstance(index, np.ndarray):
            idxs = (np.nonzero(index)[0] if index.dtype == bool else index)
            sel = [self.masks[i] for i in idxs]
        else:
            sel = self.masks[index]
        return PolygonMasks(sel, self.height, self.width)

    def rescale(self, scale, interpolation=None) -> 'PolygonMasks':
        if isinstance(scale, (float, int)):
            fx = fy = float(scale)
            new_w = int(self.width * fx + 0.5)
            new_h = int(self.height * fy + 0.5)
        else:
            max_long, max_short = max(scale), min(scale)
            f = min(max_long / max(self.height, self.width),
                    max_short / min(self.height, self.width))
            fx = fy = f
            new_w = int(self.width * f + 0.5)
            new_h = int(self.height * f + 0.5)
        return self._transform(fx, fy, 0, 0, new_h, new_w)

    def resize(self, out_shape, interpolation=None) -> 'PolygonMasks':
        h, w = out_shape
        return self._transform(w / self.width, h / self.height, 0, 0, h, w)

    def _transform(self, fx, fy, dx, dy, h, w) -> 'PolygonMasks':
        out = []
        for m in self.masks:
            polys = []
            for p in m:
                q = p.copy()
                q[0::2] = q[0::2] * fx + dx
                q[1::2] = q[1::2] * fy + dy
                polys.append(q)
            out.append(polys)
        return PolygonMasks(out, h, w)

    def flip(self, flip_direction='horizontal') -> 'PolygonMasks':
        out = []
        for m in self.masks:
            polys = []
            for p in m:
                q = p.copy()
                if flip_direction == 'horizontal':
                    q[0::2] = self.width - q[0::2]
                else:
                    q[1::2] = self.height - q[1::2]
                polys.append(q)
            out.append(polys)
        return PolygonMasks(out, self.height, self.width)

    def pad(self, out_shape, pad_val=0) -> 'PolygonMasks':
        return PolygonMasks(self.masks, *out_shape)

    def crop(self, bbox) -> 'PolygonMasks':
        x1, y1, x2, y2 = np.asarray(bbox).astype(int).flatten()[:4]
        x1 = np.clip(x1, 0, self.width)
        y1 = np.clip(y1, 0, self.height)
        x2 = np.clip(x2, x1 + 1, self.width)
        y2 = np.clip(y2, y1 + 1, self.height)
        return self._transform(1, 1, -x1, -y1, y2 - y1, x2 - x1)

    def crop_and_resize(self, bboxes, out_shape, inds, device=None,
                        interpolation='bilinear') -> 'BitmapMasks':
        return self.to_bitmap().crop_and_resize(bboxes, out_shape, inds,
                                                device, interpolation)

    @property
    def areas(self) -> np.ndarray:
        """Shoelace area summed over polygons (structures.py areas)."""
        out = []
        for m in self.masks:
            a = 0.0
            for p in m:
                x, y = p[0::2], p[1::2]
                a += 0.5 * abs(np.dot(x, np.roll(y, 1)) -
                               np.dot(y, np.roll(x, 1)))
            out.append(a)
        return np.asarray(out)

    def to_bitmap(self) -> BitmapMasks:
        from ..data.mask_codec import polygons_to_mask
        bitmaps = [polygons_to_mask([p for p in m], self.height, self.width)
                   for m in self.masks]
        return BitmapMasks(bitmaps, self.height, self.width)

    def to_ndarray(self) -> np.ndarray:
        return self.to_bitmap().to_ndarray()


def polygon_to_bitmap(polygons, height: int, width: int) -> np.ndarray:
    """structures.py:polygon_to_bitmap equivalent."""
    from ..data.mask_codec import polygons_to_mask
    return polygons_to_mask(polygons, height, width).astype(bool)
