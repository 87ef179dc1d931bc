"""FreeAnchor — learning-to-match anchor-free(ish) RetinaNet training.

Rebuild of the reference FreeAnchorRetinaHead (reference: mmdet/models/
dense_heads/free_anchor_retina_head.py:9-265 + configs/free_anchor/):
standard RetinaNet architecture, but training replaces IoU assignment with
a maximum-likelihood bag formulation — each GT owns a bag of its
``pre_anchor_topk`` highest-IoU anchors and maximizes the mean-max of
cls·loc probabilities; every anchor pays a focal negative loss damped by
its probability of belonging to some object (saturated-linear IoU).

TPU design: the reference's per-image python loop + sparse-tensor max
becomes a vmapped dense computation — the [gt, anchor] -> [anchor, class]
max-projection is a masked segment max over the one-hot label matrix.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..utils.registry import DETECTORS
from ..core.bbox_transforms import bbox2delta, bbox_overlaps, delta2bbox
from .losses import smooth_l1_elementwise
from .single_stage import SingleStageDetector


@DETECTORS.register_module()
class FreeAnchor(SingleStageDetector):
    """RetinaNet body + FreeAnchor ML-bag training objective."""

    pre_anchor_topk: int = 50
    bbox_thr: float = 0.6
    fa_gamma: float = 2.0
    fa_alpha: float = 0.5
    smoothl1_beta: float = 0.11
    loss_bbox_weight: float = 0.75

    def forward_train(self, batch) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=True)
        cls_scores, bbox_preds = self.bbox_head(feats, train=True)
        gen = self._anchor_generator()
        sizes = [tuple(f.shape[1:3]) for f in feats]
        anchors = jnp.concatenate(gen.grid_anchors(sizes), 0)

        b = cls_scores[0].shape[0]
        flat_cls = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes) for c in cls_scores], 1)
        flat_reg = jnp.concatenate(
            [r.reshape(b, -1, 4) for r in bbox_preds], 1)
        k = self.pre_anchor_topk

        def single(cls_s, reg_s, gts, glabels, gvalid):
            cls_prob = jax.nn.sigmoid(cls_s)                    # (A, C)
            gvf = gvalid.astype(jnp.float32)

            # ---- anchor->object probability (no grad,
            # free_anchor_retina_head.py:103-162)
            pred_boxes = jax.lax.stop_gradient(
                delta2bbox(anchors, reg_s, self.target_means,
                           self.target_stds))
            iou = bbox_overlaps(gts, pred_boxes)                # (G, A)
            iou = iou * gvf[:, None]
            t1 = self.bbox_thr
            t2 = jnp.maximum(jnp.max(iou, 1, keepdims=True), t1 + 1e-12)
            obj_box_prob = jnp.clip((iou - t1) / (t2 - t1), 0, 1)
            onehot = jax.nn.one_hot(glabels, self.num_classes) * \
                gvf[:, None]                                     # (G, C)
            # image_box_prob[a, c] = max_i onehot[i, c] * obj_box_prob[i, a]
            box_prob = jnp.max(obj_box_prob[:, :, None] *
                               onehot[:, None, :], axis=0)       # (A, C)

            # ---- positive bags (free_anchor_retina_head.py:166-196)
            mqm = bbox_overlaps(gts, anchors)                    # (G, A)
            _, matched = jax.lax.top_k(mqm, k)                   # (G, K)
            m_cls = cls_prob[matched]                            # (G, K, C)
            safe = jnp.clip(glabels, 0, self.num_classes - 1)
            m_cls_prob = jnp.take_along_axis(
                m_cls, safe[:, None, None], -1)[..., 0]          # (G, K)
            m_anchors = anchors[matched]                         # (G, K, 4)
            m_targets = bbox2delta(m_anchors,
                                   jnp.broadcast_to(gts[:, None, :],
                                                    m_anchors.shape),
                                   self.target_means, self.target_stds)
            lb = self.loss_bbox_weight * jnp.sum(
                smooth_l1_elementwise(reg_s[matched], m_targets,
                                      self.smoothl1_beta), -1)          # (G, K)
            m_box_prob = jnp.exp(-lb)

            # mean-max bag prob -> -alpha*log(bag)
            mp = m_cls_prob * m_box_prob
            w = 1.0 / jnp.clip(1 - mp, 1e-12)
            w = w / jnp.sum(w, 1, keepdims=True)
            bag = jnp.sum(w * mp, 1)
            pos_l = -self.fa_alpha * jnp.log(jnp.clip(bag, 1e-12, 1.0))
            pos_loss = jnp.sum(pos_l * gvf)

            # ---- negative loss (:244-265)
            prob = cls_prob * (1 - box_prob)
            neg = prob ** self.fa_gamma * \
                (-jnp.log(jnp.clip(1 - prob, 1e-12, 1.0)))
            neg_loss = (1 - self.fa_alpha) * jnp.sum(neg)
            return pos_loss, neg_loss, jnp.sum(gvf)

        pos_l, neg_l, num_pos = jax.vmap(single)(
            flat_cls.astype(jnp.float32), flat_reg.astype(jnp.float32),
            batch['gt_boxes'], batch['gt_labels'], batch['gt_valid'])
        total_pos = jnp.maximum(jnp.sum(num_pos), 1.0)
        return {
            'positive_bag_loss': jnp.sum(pos_l) / total_pos,
            'negative_bag_loss': jnp.sum(neg_l) / (total_pos * k)}
