"""FCN mask head — the fixed-28×28 Mask R-CNN baseline head.

Rebuild of the reference FCNMaskHead (reference: mmdet/models/roi_heads/
mask_heads/fcn_mask_head.py:20-237): 4 convs, ×2 deconv, per-class 1×1
logits; BCE on the assigned class channel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS
from typing import Optional

from .layers import kaiming_normal_fan_out
from .losses import binary_cross_entropy_with_logits


@HEADS.register_module()
class FCNMaskHead(nn.Module):
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 80
    class_agnostic: bool = False
    upsample_type: str = 'deconv'   # 'deconv' | 'carafe' (configs/carafe/)
    # norm_cfg=GN on the tower convs (configs/gn mask_head norm_cfg)
    norm: Optional[str] = None
    gn_groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(N, P, P, C) RoI feats -> (N, 2P, 2P, num_classes) mask logits."""
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_out_channels, (3, 3),
                        padding=[(1, 1), (1, 1)],
                        use_bias=self.norm is None,
                        kernel_init=kaiming_normal_fan_out(),
                        name=f'conv_{i}')(x)
            if self.norm == 'gn':
                x = nn.GroupNorm(num_groups=self.gn_groups,
                                 name=f'gn_{i}')(x)
            x = nn.relu(x)
        if self.upsample_type == 'carafe':
            from .carafe import CARAFEPack
            x = CARAFEPack(scale=2, name='upsample')(x)
        else:
            x = nn.ConvTranspose(self.conv_out_channels, (2, 2),
                                 strides=(2, 2),
                                 kernel_init=kaiming_normal_fan_out(),
                                 name='upsample')(x)
        x = nn.relu(x)
        out = 1 if self.class_agnostic else self.num_classes
        return nn.Conv(out, (1, 1), kernel_init=kaiming_normal_fan_out(),
                       name='conv_logits')(x)


def select_class_channel(mask_logits: jnp.ndarray,
                         labels: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C), (N,) -> (N, H, W): pick each RoI's class channel
    (reference fcn_mask_head.py loss/get_seg_masks indexing)."""
    c = mask_logits.shape[-1]
    safe = jnp.clip(labels, 0, c - 1)
    return jnp.take_along_axis(
        mask_logits, safe[:, None, None, None], axis=-1)[..., 0]


def fcn_mask_loss(mask_logits: jnp.ndarray,
                  mask_targets: jnp.ndarray,
                  labels: jnp.ndarray,
                  pos_valid: jnp.ndarray,
                  loss_weight: float = 1.0) -> jnp.ndarray:
    """Mean BCE over positive RoIs' pixels (reference fcn_mask_head.py:loss
    with CrossEntropyLoss(use_mask=True))."""
    pred = select_class_channel(mask_logits, labels)
    per_pix = binary_cross_entropy_with_logits(pred, mask_targets)
    per_roi = jnp.mean(per_pix, axis=(1, 2))
    w = pos_valid.astype(jnp.float32)
    return loss_weight * jnp.sum(per_roi * w) / jnp.maximum(jnp.sum(w), 1.0)
