"""Backbone block plugins: ContextBlock (GCNet) and GeneralizedAttention.

TPU-native rebuilds of the mmcv plugin modules the reference installs into
ResNet bottlenecks via ``backbone.plugins`` (reference resnet.py
make_block_plugins / Bottleneck.forward_plugin; config families
configs/gcnet/*.py and configs/empirical_attention/*.py). Both are
attention-style refinements over a stage's feature map:

* ``ContextBlock`` (GCNet, arXiv:1904.11492): one softmax-pooled global
  context vector per image, squeezed through a bottleneck MLP with
  LayerNorm, added back to every position (``channel_add`` fusion).
* ``GeneralizedAttention`` (arXiv:1904.05873): multi-head attention over
  the feature map with four switchable energy terms, selected by
  ``attention_type`` (a 4-char bitmask, e.g. '0010' / '1111'):
    [0] query content x key content
    [1] query content x relative position
    [2] (learned bias) x key content  — the saliency term
    [3] (learned bias) x relative position

Everything is einsum/matmul-shaped — MXU-friendly and fully fused by XLA;
the factored x/y position energies keep the position term at
O(HW * (H + W)) instead of O((HW)^2).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import kaiming_normal_fan_out


class ContextBlock(nn.Module):
    """GCNet global-context block (mmcv cnn/bricks/context_block.py)."""

    in_channels: int
    ratio: float = 1.0 / 16
    pooling_type: str = 'att'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        planes = max(int(c * self.ratio), 1)
        if self.pooling_type == 'att':
            # softmax attention pooling: one (C,) context per image
            logits = nn.Conv(1, (1, 1), name='conv_mask',
                             kernel_init=kaiming_normal_fan_out())(x)
            attn = jax.nn.softmax(logits.reshape(n, h * w, 1), axis=1)
            context = jnp.einsum('npc,npo->nc', x.reshape(n, h * w, c),
                                 attn)
        else:                                   # 'avg'
            context = jnp.mean(x, axis=(1, 2))
        # channel_add transform: 1x1 -> LN -> ReLU -> 1x1 (zero-init last)
        t = nn.Dense(planes, name='channel_add_fc1')(context)
        t = nn.LayerNorm(name='channel_add_ln')(t)
        t = nn.relu(t)
        t = nn.Dense(c, name='channel_add_fc2',
                     kernel_init=nn.initializers.zeros)(t)
        return x + t[:, None, None, :]


class GeneralizedAttention(nn.Module):
    """Empirical-attention block (mmcv cnn/bricks/generalized_attention.py).

    Relative-position energies are computed factored per axis: the (q, kv)
    energy is e_content[q, kv] + e_pos_y[qy, kvy] + e_pos_x[qx, kvx]
    broadcast over the other axis, then softmax over all kv positions.
    ``spatial_range`` >= 0 masks keys outside a square neighborhood.
    """

    in_channels: int
    spatial_range: int = -1
    num_heads: int = 9
    position_embedding_dim: int = -1
    position_magnitude: int = 1
    kv_stride: int = 2
    q_stride: int = 1
    attention_type: str = '1111'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        at = [t == '1' for t in self.attention_type]
        n, h, w, c = x.shape
        heads = self.num_heads
        qk_dim = c // heads
        v_dim = c // heads
        pe_dim = (self.position_embedding_dim
                  if self.position_embedding_dim > 0 else c)

        xq = x[:, ::self.q_stride, ::self.q_stride]
        xkv = x[:, ::self.kv_stride, ::self.kv_stride]
        hq, wq = xq.shape[1:3]
        hk, wk = xkv.shape[1:3]

        scale = 1.0 / math.sqrt(2.0 * qk_dim) if (at[0] and at[1]) else \
            1.0 / math.sqrt(qk_dim)

        q = k = None
        if at[0] or at[1]:
            q = nn.Conv(qk_dim * heads, (1, 1), use_bias=False,
                        name='query_conv')(xq)
            q = q.reshape(n, hq, wq, heads, qk_dim) * scale
        if at[0] or at[2]:
            k = nn.Conv(qk_dim * heads, (1, 1), use_bias=False,
                        name='key_conv')(xkv)
            k = k.reshape(n, hk, wk, heads, qk_dim)
        v = nn.Conv(v_dim * heads, (1, 1), use_bias=False,
                    name='value_conv')(xkv)
        v = v.reshape(n, hk, wk, heads, v_dim)

        energy = jnp.zeros((n, heads, hq, wq, hk, wk), jnp.float32)
        if at[0]:
            energy = energy + jnp.einsum('nabhd,nyxhd->nhabyx', q, k,
                                         preferred_element_type=jnp.float32)
        if at[2]:
            appr_bias = self.param('appr_bias',
                                   nn.initializers.normal(0.01),
                                   (heads, qk_dim)) * scale
            energy = energy + jnp.einsum('hd,nyxhd->nhyx', appr_bias,
                                         k)[:, :, None, None]

        if at[1] or at[3]:
            # factored relative-position embeddings per axis
            mag = float(self.position_magnitude)
            y_q = jnp.arange(hq, dtype=jnp.float32) * self.q_stride
            x_q = jnp.arange(wq, dtype=jnp.float32) * self.q_stride
            y_k = jnp.arange(hk, dtype=jnp.float32) * self.kv_stride
            x_k = jnp.arange(wk, dtype=jnp.float32) * self.kv_stride

            def rel_embed(qs, ks, name):
                rel = (qs[:, None] - ks[None, :]) * mag   # (Q, K)
                dim = jnp.arange(pe_dim // 2, dtype=jnp.float32)
                div = 1000.0 ** ((2.0 / pe_dim) * dim)
                ang = rel[..., None] / div
                emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)
                return nn.Dense(qk_dim * heads, use_bias=False,
                                name=name)(emb).reshape(
                    rel.shape[0], rel.shape[1], heads, qk_dim)

            pos_y = rel_embed(y_q, y_k, 'appr_geom_fc_y')  # (hq, hk, H, d)
            pos_x = rel_embed(x_q, x_k, 'appr_geom_fc_x')  # (wq, wk, H, d)

            if at[1]:
                e_y = jnp.einsum('nabhd,ayhd->nhaby', q, pos_y,
                                 preferred_element_type=jnp.float32)
                e_x = jnp.einsum('nabhd,bxhd->nhabx', q, pos_x,
                                 preferred_element_type=jnp.float32)
                energy = energy + e_y[..., :, None] + e_x[..., None, :]
            if at[3]:
                geom_bias = self.param('geom_bias',
                                       nn.initializers.normal(0.01),
                                       (heads, qk_dim)) * scale
                g_y = jnp.einsum('hd,ayhd->hay', geom_bias, pos_y)
                g_x = jnp.einsum('hd,bxhd->hbx', geom_bias, pos_x)
                energy = (energy + g_y[None, :, :, None, :, None] +
                          g_x[None, :, None, :, None, :])

        if self.spatial_range >= 0:
            yq = jnp.arange(hq)[:, None, None, None] * self.q_stride
            xq_i = jnp.arange(wq)[None, :, None, None] * self.q_stride
            yk = jnp.arange(hk)[None, None, :, None] * self.kv_stride
            xk_i = jnp.arange(wk)[None, None, None, :] * self.kv_stride
            mask = ((jnp.abs(yq - yk) <= self.spatial_range) &
                    (jnp.abs(xq_i - xk_i) <= self.spatial_range))
            energy = jnp.where(mask[None, None], energy, -1e18)

        attn = jax.nn.softmax(energy.reshape(n, heads, hq, wq, hk * wk),
                              axis=-1).reshape(energy.shape)
        out = jnp.einsum('nhabyx,nyxhd->nabhd', attn, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(n, hq, wq, heads * v_dim).astype(x.dtype)
        out = nn.Conv(c, (1, 1), use_bias=False, name='proj_conv')(out)
        if self.q_stride > 1:
            out = jax.image.resize(out, (n, h, w, c), 'nearest')
        return x + out
