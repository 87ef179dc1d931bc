"""Anchor generation (pure JAX / numpy, statically shaped).

Rebuild of the reference anchor toolbox (reference: mmdet/core/anchor/
anchor_generator.py:10-349). Base anchors are computed eagerly at build time
(host numpy); per-level grids are pure functions of static featmap shapes, so
under jit they constant-fold into the compiled program.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..utils.registry import ANCHOR_GENERATORS


@ANCHOR_GENERATORS.register_module()
class AnchorGenerator:
    """Multi-level grid anchors from scales × ratios per stride.

    Matches the reference semantics (anchor_generator.py:gen_single_level_base_anchors):
    ``w = base * scale / sqrt(ratio)``, ``h = base * scale * sqrt(ratio)``,
    scale-major ordering, center at ``center_offset * stride``.
    """

    def __init__(self,
                 strides: Sequence[int],
                 ratios: Sequence[float],
                 scales: Optional[Sequence[float]] = None,
                 base_sizes: Optional[Sequence[int]] = None,
                 scale_major: bool = True,
                 octave_base_scale: Optional[float] = None,
                 scales_per_octave: Optional[int] = None,
                 center_offset: float = 0.0):
        self.strides = [(s, s) if isinstance(s, int) else tuple(s) for s in strides]
        self.base_sizes = ([min(s) for s in self.strides]
                           if base_sizes is None else list(base_sizes))
        if scales is not None:
            self.scales = np.asarray(scales, np.float32)
        elif octave_base_scale is not None and scales_per_octave is not None:
            octave_scales = 2 ** (np.arange(scales_per_octave) / scales_per_octave)
            self.scales = (octave_scales * octave_base_scale).astype(np.float32)
        else:
            raise ValueError('either scales or octave_base_scale+scales_per_octave '
                             'must be set')
        self.ratios = np.asarray(ratios, np.float32)
        self.scale_major = scale_major
        self.center_offset = center_offset
        self.base_anchors = [
            self._single_level_base_anchors(bs, stride)
            for bs, stride in zip(self.base_sizes, self.strides)
        ]

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    @property
    def num_base_anchors(self) -> List[int]:
        return [a.shape[0] for a in self.base_anchors]

    def _single_level_base_anchors(self, base_size: float,
                                   stride: Tuple[int, int]) -> np.ndarray:
        w = h = float(base_size)
        x_center = self.center_offset * stride[0]
        y_center = self.center_offset * stride[1]

        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        else:
            ws = (w * self.scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * self.scales[:, None] * h_ratios[None, :]).reshape(-1)

        return np.stack([
            x_center - 0.5 * ws, y_center - 0.5 * hs,
            x_center + 0.5 * ws, y_center + 0.5 * hs,
        ], axis=-1).astype(np.float32)

    def single_level_grid_anchors(self, featmap_size: Tuple[int, int],
                                  level: int) -> jnp.ndarray:
        """Anchors of one level, shape ``(H*W*A, 4)``, location-major.

        Computed in NUMPY at trace time: featmap sizes are always static,
        so the grid is a pure compile-time constant — as jnp ops it was
        re-materialized on device EVERY call (xplane: a 0.33 ms/img
        f32[201600,4] reshape chain inside the inference loop that XLA's
        constant folding declines to fold at this size)."""
        feat_h, feat_w = featmap_size
        stride_w, stride_h = self.strides[level]
        shift_x = np.arange(feat_w, dtype=np.float32) * stride_w
        shift_y = np.arange(feat_h, dtype=np.float32) * stride_h
        sx, sy = np.meshgrid(shift_x, shift_y)   # (H, W) each
        shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 4)
        base = np.asarray(self.base_anchors[level], np.float32)
        anchors = shifts[:, None, :] + base[None, :, :]
        return jnp.asarray(anchors.reshape(-1, 4))

    def grid_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]) -> List[jnp.ndarray]:
        assert len(featmap_sizes) == self.num_levels
        return [self.single_level_grid_anchors(fs, i)
                for i, fs in enumerate(featmap_sizes)]

    def single_level_valid_flags(self, featmap_size: Tuple[int, int],
                                 valid_size, level: int) -> jnp.ndarray:
        """Validity of each anchor location given the un-padded image extent.

        ``valid_size`` is the (valid_h, valid_w) extent on this feature level
        (may be traced arrays). Returns a bool ``(H*W*A,)`` vector — the
        static-shape replacement for the reference's ``valid_flags``.
        """
        feat_h, feat_w = featmap_size
        valid_h, valid_w = valid_size
        ys = jnp.arange(feat_h)[:, None]
        xs = jnp.arange(feat_w)[None, :]
        valid = (ys < valid_h) & (xs < valid_w)
        valid = valid.reshape(-1)
        return jnp.repeat(valid, self.num_base_anchors[level])

    def valid_flags(self, featmap_sizes, pad_shape) -> List[jnp.ndarray]:
        """Per-level valid flags for an image padded to ``pad_shape`` (h, w)."""
        flags = []
        for level, (feat_h, feat_w) in enumerate(featmap_sizes):
            sw, sh = self.strides[level]
            h = jnp.minimum(jnp.ceil(pad_shape[0] / sh).astype(jnp.int32), feat_h)
            w = jnp.minimum(jnp.ceil(pad_shape[1] / sw).astype(jnp.int32), feat_w)
            flags.append(self.single_level_valid_flags((feat_h, feat_w), (h, w), level))
        return flags


@ANCHOR_GENERATORS.register_module()
class LegacyAnchorGenerator(AnchorGenerator):
    """v1.x-compatible anchors (center offset 0.5, -1 on x2/y2).

    Reference: anchor_generator.py:475- (kept for config compatibility).
    """

    def _single_level_base_anchors(self, base_size, stride):
        w = h = float(base_size)
        x_center = self.center_offset * (stride[0] - 1)
        y_center = self.center_offset * (stride[1] - 1)
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        else:
            ws = (w * self.scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * self.scales[:, None] * h_ratios[None, :]).reshape(-1)
        return np.stack([
            x_center - 0.5 * (ws - 1), y_center - 0.5 * (hs - 1),
            x_center + 0.5 * (ws - 1), y_center + 0.5 * (hs - 1),
        ], axis=-1).astype(np.float32)


@ANCHOR_GENERATORS.register_module()
class SSDAnchorGenerator(AnchorGenerator):
    """SSD anchors: per-level min/max sizes from an input-size ratio range,
    sqrt(min·max) extra scale, ratio set {1, 1/r, r} (reference
    anchor_generator.py:351-473)."""

    def __init__(self, strides, ratios, basesize_ratio_range=(0.15, 0.9),
                 input_size: int = 300, scale_major: bool = False):
        self.strides = [(s, s) if isinstance(s, int) else tuple(s)
                        for s in strides]
        self.input_size = input_size
        num_levels = len(self.strides)
        min_ratio, max_ratio = basesize_ratio_range
        min_ratio = int(min_ratio * 100)
        max_ratio = int(max_ratio * 100)
        step = int(np.floor(max_ratio - min_ratio) / (num_levels - 2))
        min_sizes, max_sizes = [], []
        for r in range(min_ratio, max_ratio + 1, step):
            min_sizes.append(int(input_size * r / 100))
            max_sizes.append(int(input_size * (r + step) / 100))
        # first level special-cased per the reference (ratio range head)
        if basesize_ratio_range[0] == 0.15:
            min_sizes.insert(0, int(input_size * 7 / 100))
            max_sizes.insert(0, int(input_size * 15 / 100))
        else:
            min_sizes.insert(0, int(input_size * 10 / 100))
            max_sizes.insert(0, int(input_size * 20 / 100))
        min_sizes = min_sizes[:num_levels]
        max_sizes = max_sizes[:num_levels]

        self.base_sizes = min_sizes
        self.center_offset = 0.5
        self.scale_major = scale_major
        self.base_anchors = []
        for lvl, (stride, ratio_list) in enumerate(zip(self.strides, ratios)):
            scales = [1.0, np.sqrt(max_sizes[lvl] / min_sizes[lvl])]
            full_ratios = [1.0]
            for r in ratio_list:
                full_ratios += [1.0 / r, r]
            self.scales = np.asarray(scales, np.float32)
            self.ratios = np.asarray(full_ratios, np.float32)
            anchors = self._single_level_base_anchors(min_sizes[lvl], stride)
            # SSD keeps: scale1/ratio1, scale_sqrt/ratio1, scale1/other ratios
            a = anchors.reshape(len(full_ratios), len(scales), 4)
            keep = [a[0, 0], a[0, 1]] + [a[i, 0]
                                         for i in range(1, len(full_ratios))]
            self.base_anchors.append(np.stack(keep))
        # ratios per level differ; keep the last for repr only
        self.ratios = np.asarray([1.0], np.float32)
        self.scales = np.asarray([1.0], np.float32)

    def _single_level_base_anchors(self, base_size, stride):
        w = h = float(base_size)
        x_center = 0.5 * stride[0]
        y_center = 0.5 * stride[1]
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        # ratio-major (scale_major=False for SSD)
        ws = (w * self.scales[None, :] * w_ratios[:, None]).reshape(-1)
        hs = (h * self.scales[None, :] * h_ratios[:, None]).reshape(-1)
        return np.stack([
            x_center - 0.5 * ws, y_center - 0.5 * hs,
            x_center + 0.5 * ws, y_center + 0.5 * hs,
        ], axis=-1).astype(np.float32)


@ANCHOR_GENERATORS.register_module()
class LegacySSDAnchorGenerator(SSDAnchorGenerator):
    """v1.x-compatible SSD anchors: centers at (stride-1)/2 and the -1
    width/height convention (reference anchor_generator.py:574-589)."""

    def _single_level_base_anchors(self, base_size, stride):
        w = h = float(base_size)
        x_center = 0.5 * (stride[0] - 1)
        y_center = 0.5 * (stride[1] - 1)
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        ws = (w * self.scales[None, :] * w_ratios[:, None]).reshape(-1)
        hs = (h * self.scales[None, :] * h_ratios[:, None]).reshape(-1)
        return np.stack([
            x_center - 0.5 * (ws - 1), y_center - 0.5 * (hs - 1),
            x_center + 0.5 * (ws - 1), y_center + 0.5 * (hs - 1),
        ], axis=-1).astype(np.float32)


@ANCHOR_GENERATORS.register_module()
class PointGenerator:
    """Grid point generator for anchor-free heads (reference: point_generator.py)."""

    def grid_points(self, featmap_size: Tuple[int, int], stride: int) -> jnp.ndarray:
        # numpy at trace time: static sizes -> compile-time constant
        # (same rationale as AnchorGenerator.single_level_grid_anchors)
        feat_h, feat_w = featmap_size
        shift_x = np.arange(feat_w, dtype=np.float32) * stride
        shift_y = np.arange(feat_h, dtype=np.float32) * stride
        sx, sy = np.meshgrid(shift_x, shift_y)
        strides = np.full_like(sx, stride, dtype=np.float32)
        return jnp.asarray(
            np.stack([sx, sy, strides], axis=-1).reshape(-1, 3))


def images_to_levels(target: jnp.ndarray,
                     num_levels: Sequence[int]) -> List[jnp.ndarray]:
    """Split a per-image concat-of-levels tensor back into per-level tensors.

    Reference: mmdet/core/anchor/utils.py:4 (images_to_levels). ``target`` is
    ``(B, sum(num_levels), ...)``; returns list of ``(B, n_l, ...)``.
    """
    out = []
    start = 0
    for n in num_levels:
        out.append(target[:, start:start + n])
        start += n
    return out
