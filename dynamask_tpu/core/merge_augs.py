"""Test-time augmentation merging.

Rebuild of the reference merge utilities (reference: mmdet/core/
post_processing/merge_augs.py): proposals/boxes map back through each aug's
(scale, flip), then scores average across augs; masks average after
flip-back."""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from .bbox_transforms import bbox_flip


def recover_boxes(boxes: jnp.ndarray, img_shape, scale_factor,
                  flip: bool) -> jnp.ndarray:
    """Aug-frame boxes -> original-image coords (bbox_mapping_back)."""
    if flip:
        boxes = bbox_flip(boxes, img_shape)
    return boxes / jnp.asarray(scale_factor, boxes.dtype)


def to_aug_frame(boxes: jnp.ndarray, img_shape, scale_factor,
                 flip: bool) -> jnp.ndarray:
    """Original-image boxes -> aug frame (bbox_mapping)."""
    boxes = boxes * jnp.asarray(scale_factor, boxes.dtype)
    if flip:
        boxes = bbox_flip(boxes, img_shape)
    return boxes


def merge_aug_bboxes(aug_boxes: Sequence[jnp.ndarray],
                     aug_scores: Sequence[jnp.ndarray]):
    """Mean of recovered boxes and scores (merge_augs.py:merge_aug_bboxes)."""
    boxes = sum(aug_boxes) / len(aug_boxes)
    scores = sum(aug_scores) / len(aug_scores)
    return boxes, scores


def merge_aug_masks(aug_masks: Sequence[jnp.ndarray],
                    flips: Sequence[bool]) -> jnp.ndarray:
    """Average mask probabilities after flipping back
    (merge_augs.py:merge_aug_masks). Masks are (..., H, W)."""
    out = 0.0
    for m, flip in zip(aug_masks, flips):
        out = out + (m[..., ::-1] if flip else m)
    return out / len(aug_masks)


def merge_aug_scores(aug_scores: Sequence[jnp.ndarray]) -> jnp.ndarray:
    return sum(aug_scores) / len(aug_scores)
