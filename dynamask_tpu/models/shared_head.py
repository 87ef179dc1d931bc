"""ResLayer shared head — the res5 stage applied per-RoI (C4 detectors).

Rebuild of the reference's only SHARED_HEADS entry
(reference: mmdet/models/roi_heads/shared_heads/res_layer.py): the last
ResNet stage, left out of the backbone (``num_stages=3``), runs on each
RoI's 14x14 crop and produces the 7x7x2048 feature the plain BBoxHead
avg-pools. Reuses this framework's Bottleneck, so pretrained 'layer4.*'
torch weights map through the standard importer paths.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..utils.registry import HEADS
from .resnet import ARCH_SETTINGS, Bottleneck


@HEADS.register_module(name='ResLayer')
class ResLayerSharedHead(nn.Module):
    depth: int = 50
    stage: int = 3
    stride: int = 2
    dilation: int = 1
    style: str = 'caffe'
    norm_eval: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        _, stage_blocks = ARCH_SETTINGS[self.depth]
        planes = 64 * 2 ** self.stage
        for i in range(stage_blocks[self.stage]):
            x = Bottleneck(
                planes=planes,
                stride=self.stride if i == 0 else 1,
                dilation=self.dilation,
                downsample=(i == 0),
                style=self.style,
                norm_eval=self.norm_eval,
                name=f'layer{self.stage + 1}_block{i}')(x, train)
        return x
