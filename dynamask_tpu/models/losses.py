"""Loss functions (pure JAX).

Rebuild of the reference loss toolbox (reference: mmdet/models/losses/) in
weighted-masked form: every loss takes dense padded inputs plus elementwise
weights and an ``avg_factor`` — the static-shape counterpart of the
reference's ``weight_reduce_loss`` convention (losses/utils.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.registry import LOSSES


def weight_reduce_loss(loss: jnp.ndarray,
                       weight: Optional[jnp.ndarray] = None,
                       avg_factor: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """sum(loss * weight) / avg_factor (mean over weights when avg_factor is
    None) — reference: losses/utils.py:weight_reduce_loss."""
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        if weight is None:
            return jnp.mean(loss)
        return jnp.sum(loss) / jnp.maximum(jnp.sum(weight), 1.0)
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1.0)


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                          weight=None, avg_factor=None) -> jnp.ndarray:
    """CE over (N, C) logits and int labels (reference cross_entropy)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(labels >= 0, nll, 0.0)
    return weight_reduce_loss(nll, weight, avg_factor)


def binary_cross_entropy_with_logits(logits: jnp.ndarray,
                                     targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise numerically-stable BCE-with-logits."""
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def binary_cross_entropy(logits, targets, weight=None, avg_factor=None):
    loss = binary_cross_entropy_with_logits(logits, targets)
    return weight_reduce_loss(loss, weight, avg_factor)


def mask_bce_eps(pred_logits: jnp.ndarray, target: jnp.ndarray,
                 class_weight: jnp.ndarray) -> jnp.ndarray:
    """The reference's ``mask_cross_entropy`` variant used by the detail loss
    (cross_entropy_loss.py:90-120): BCE computed on sigmoid probabilities with
    an explicit eps=1e-10, MEAN over ALL elements after multiplying by a
    per-sample class weight."""
    x = jax.nn.sigmoid(pred_logits)
    eps = 1e-10
    # log(max(·, eps)): f32-identical to the reference's log(· + eps) but
    # immune to XLA reassociating the eps away (log(0) = -inf under fusion)
    ll = target * jnp.log(jnp.maximum(x, eps)) + \
        (1.0 - target) * jnp.log(jnp.maximum(1.0 - x, eps))
    return -jnp.mean(ll * class_weight)


def l1_loss(pred, target, weight=None, avg_factor=None):
    loss = jnp.abs(pred - target)
    return weight_reduce_loss(loss, weight, avg_factor)


def smooth_l1_elementwise(pred, target, beta: float = 1.0):
    """Unreduced SmoothL1 (reduction='none' in the reference)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)


def smooth_l1_loss(pred, target, beta: float = 1.0, weight=None,
                   avg_factor=None):
    return weight_reduce_loss(smooth_l1_elementwise(pred, target, beta),
                              weight, avg_factor)


def sigmoid_focal_loss(logits, targets_onehot, gamma: float = 2.0,
                       alpha: float = 0.25, weight=None, avg_factor=None):
    """Focal loss in stable logits form — the TPU replacement of the
    reference's CUDA kernel (losses/focal_loss.py)."""
    p = jax.nn.sigmoid(logits)
    ce = binary_cross_entropy_with_logits(logits, targets_onehot)
    p_t = p * targets_onehot + (1 - p) * (1 - targets_onehot)
    alpha_t = alpha * targets_onehot + (1 - alpha) * (1 - targets_onehot)
    loss = alpha_t * ((1 - p_t) ** gamma) * ce
    return weight_reduce_loss(loss, weight, avg_factor)


def iou_loss(pred, target, mode: str = 'giou', eps: float = 1e-7,
             weight=None, avg_factor=None):
    """IoU-family regression loss over (..., 4) boxes (reference iou_loss.py)."""
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    ap = jnp.clip(pred[..., 2] - pred[..., 0], 0) * \
        jnp.clip(pred[..., 3] - pred[..., 1], 0)
    at = jnp.clip(target[..., 2] - target[..., 0], 0) * \
        jnp.clip(target[..., 3] - target[..., 1], 0)
    union = ap + at - inter + eps
    iou = inter / union
    if mode == 'iou':
        loss = 1 - iou
    elif mode == 'linear_iou':
        loss = 1 - iou
    elif mode == 'log_iou':
        loss = -jnp.log(jnp.clip(iou, eps))
    elif mode == 'giou':
        e_lt = jnp.minimum(pred[..., :2], target[..., :2])
        e_rb = jnp.maximum(pred[..., 2:], target[..., 2:])
        e_wh = jnp.clip(e_rb - e_lt, 0)
        enclose = e_wh[..., 0] * e_wh[..., 1] + eps
        loss = 1 - (iou - (enclose - union) / enclose)
    elif mode in ('diou', 'ciou'):
        # reference iou_loss.py:118 (diou_loss) / :172 (ciou_loss)
        e_lt = jnp.minimum(pred[..., :2], target[..., :2])
        e_rb = jnp.maximum(pred[..., 2:], target[..., 2:])
        e_wh = jnp.clip(e_rb - e_lt, 0)
        c2 = e_wh[..., 0] ** 2 + e_wh[..., 1] ** 2 + eps
        pc = (pred[..., :2] + pred[..., 2:]) * 0.5
        tc = (target[..., :2] + target[..., 2:]) * 0.5
        rho2 = jnp.sum((pc - tc) ** 2, axis=-1)
        loss = 1 - iou + rho2 / c2
        if mode == 'ciou':
            pw = jnp.clip(pred[..., 2] - pred[..., 0], 0)
            ph = jnp.clip(pred[..., 3] - pred[..., 1], eps)
            tw = jnp.clip(target[..., 2] - target[..., 0], 0)
            th = jnp.clip(target[..., 3] - target[..., 1], eps)
            v = (4 / jnp.pi ** 2) * \
                (jnp.arctan(tw / th) - jnp.arctan(pw / ph)) ** 2
            alpha = jax.lax.stop_gradient(v / jnp.maximum(1 - iou + v, eps))
            loss = loss + alpha * v
    else:
        raise ValueError(mode)
    return weight_reduce_loss(loss, weight, avg_factor)


def dice_loss(pred_sigmoid, target, smooth: float = 1.0):
    """Reference dice_loss_func (cross_entropy_loss.py:352-361)."""
    n = pred_sigmoid.shape[0]
    p = pred_sigmoid.reshape(n, -1)
    t = target.reshape(n, -1)
    inter = jnp.sum(p * t, axis=1)
    loss = 1 - (2 * inter + smooth) / (jnp.sum(p, 1) + jnp.sum(t, 1) + smooth)
    return jnp.mean(loss)


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray,
             valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Top-1 accuracy over valid entries (reference losses/accuracy.py)."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if valid is not None:
        return jnp.sum(correct * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.mean(correct)


# Registered config-facing wrappers -----------------------------------------

@LOSSES.register_module()
class CrossEntropyLoss:
    """Config-compatible CE wrapper (reference cross_entropy_loss.py:157-227)."""

    def __init__(self, use_sigmoid=False, use_mask=False, reduction='mean',
                 class_weight=None, loss_weight=1.0):
        self.use_sigmoid = use_sigmoid
        self.use_mask = use_mask
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        if self.use_sigmoid or self.use_mask:
            return self.loss_weight * binary_cross_entropy(
                pred, target, weight, avg_factor)
        return self.loss_weight * softmax_cross_entropy(
            pred, target, weight, avg_factor)


@LOSSES.register_module()
class L1Loss:
    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * l1_loss(pred, target, weight, avg_factor)


@LOSSES.register_module()
class SmoothL1Loss:
    def __init__(self, beta=1.0, loss_weight=1.0):
        self.beta = beta
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * smooth_l1_loss(pred, target, self.beta,
                                                 weight, avg_factor)


@LOSSES.register_module()
class FocalLoss:
    def __init__(self, use_sigmoid=True, gamma=2.0, alpha=0.25, loss_weight=1.0):
        assert use_sigmoid
        self.gamma = gamma
        self.alpha = alpha
        self.loss_weight = loss_weight

    def __call__(self, pred, target_onehot, weight=None, avg_factor=None):
        return self.loss_weight * sigmoid_focal_loss(
            pred, target_onehot, self.gamma, self.alpha, weight, avg_factor)


@LOSSES.register_module()
class GIoULoss:
    def __init__(self, eps=1e-7, loss_weight=1.0):
        self.eps = eps
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * iou_loss(pred, target, 'giou', self.eps,
                                           weight, avg_factor)


@LOSSES.register_module()
class IoULoss:
    def __init__(self, eps=1e-6, loss_weight=1.0, mode='log_iou'):
        self.eps = eps
        self.loss_weight = loss_weight
        self.mode = mode

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * iou_loss(pred, target, self.mode, self.eps,
                                           weight, avg_factor)


@LOSSES.register_module()
class DIoULoss:
    """Distance-IoU loss (reference losses/iou_loss.py:366)."""

    def __init__(self, eps=1e-7, loss_weight=1.0):
        self.eps = eps
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * iou_loss(pred, target, 'diou', self.eps,
                                           weight, avg_factor)


@LOSSES.register_module()
class CIoULoss:
    """Complete-IoU loss (reference losses/iou_loss.py:404)."""

    def __init__(self, eps=1e-7, loss_weight=1.0):
        self.eps = eps
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * iou_loss(pred, target, 'ciou', self.eps,
                                           weight, avg_factor)


@LOSSES.register_module()
class MSELoss:
    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * weight_reduce_loss(
            (pred - target) ** 2, weight, avg_factor)


def balanced_l1_loss(pred, target, beta: float = 1.0, alpha: float = 0.5,
                     gamma: float = 1.5, weight=None, avg_factor=None):
    """Libra R-CNN balanced L1 (reference losses/balanced_l1_loss.py)."""
    diff = jnp.abs(pred - target)
    b = np.e ** (gamma / alpha) - 1
    loss = jnp.where(
        diff < beta,
        alpha / b * (b * diff + 1) * jnp.log(jnp.maximum(b * diff / beta + 1,
                                                         1e-12)) -
        alpha * diff,
        gamma * diff + gamma / b - alpha * beta)
    return weight_reduce_loss(loss, weight, avg_factor)


def ghm_c_loss(logits, targets_onehot, label_weights, bins: int = 10,
               momentum: float = 0.0):
    """Gradient-harmonized classification loss (reference losses/ghm_loss.py
    GHMC, stateless form — the EMA accumulator becomes plain histogram
    weighting, exact when momentum=0 as in the shipped configs)."""
    p = jax.nn.sigmoid(logits)
    g = jnp.abs(jax.lax.stop_gradient(p) - targets_onehot)
    valid = label_weights > 0
    total = jnp.maximum(jnp.sum(valid), 1.0)
    edges = jnp.linspace(0, 1, bins + 1)
    edges = edges.at[-1].add(1e-6)
    weights = jnp.zeros_like(g)
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = jnp.sum(inds)
        w = jnp.where(num_in_bin > 0, total / jnp.maximum(num_in_bin, 1.0),
                      0.0)
        weights = jnp.where(inds, w, weights)
    n_nonempty = jnp.maximum(jnp.sum(jnp.asarray(
        [jnp.any((g >= edges[i]) & (g < edges[i + 1]) & valid)
         for i in range(bins)])), 1.0)
    weights = weights / n_nonempty
    ce = binary_cross_entropy_with_logits(logits, targets_onehot)
    return jnp.sum(ce * weights) / total


def gaussian_focal_loss(pred_sigmoid, gaussian_target, alpha: float = 2.0,
                        gamma: float = 4.0, weight=None, avg_factor=None):
    """CornerNet heatmap focal loss (reference losses/gaussian_focal_loss.py)."""
    eps = 1e-12
    pos = (gaussian_target == 1).astype(pred_sigmoid.dtype)
    neg_w = jnp.power(1 - gaussian_target, gamma)
    pos_loss = -jnp.log(jnp.maximum(pred_sigmoid, eps)) * \
        jnp.power(1 - pred_sigmoid, alpha) * pos
    neg_loss = -jnp.log(jnp.maximum(1 - pred_sigmoid, eps)) * \
        jnp.power(pred_sigmoid, alpha) * neg_w * (1 - pos)
    return weight_reduce_loss(pos_loss + neg_loss, weight, avg_factor)


def quality_focal_loss(logits, label_onehot, quality_score, beta: float = 2.0,
                       weight=None, avg_factor=None):
    """GFL quality focal loss (reference losses/gfocal_loss.py): BCE against
    the per-positive quality (IoU) score, modulated by |score - sigmoid|^β."""
    p = jax.nn.sigmoid(logits)
    target = label_onehot * quality_score[..., None]
    ce = binary_cross_entropy_with_logits(logits, target)
    mod = jnp.power(jnp.abs(target - p), beta)
    return weight_reduce_loss(ce * mod, weight, avg_factor)


def distribution_focal_loss(logits, target, weight=None, avg_factor=None):
    """GFL distribution focal loss: CE to the two integer bins bracketing a
    continuous regression target (reference losses/gfocal_loss.py)."""
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = target - tl.astype(target.dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nbins = logits.shape[-1]
    nl = -jnp.take_along_axis(logp, jnp.clip(tl, 0, nbins - 1)[..., None],
                              -1)[..., 0]
    nr = -jnp.take_along_axis(logp, jnp.clip(tr, 0, nbins - 1)[..., None],
                              -1)[..., 0]
    return weight_reduce_loss(nl * wl + nr * wr, weight, avg_factor)


@LOSSES.register_module()
class BalancedL1Loss:
    def __init__(self, alpha=0.5, gamma=1.5, beta=1.0, loss_weight=1.0):
        self.alpha, self.gamma, self.beta = alpha, gamma, beta
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * balanced_l1_loss(
            pred, target, self.beta, self.alpha, self.gamma, weight,
            avg_factor)


@LOSSES.register_module()
class GHMC:
    def __init__(self, bins=10, momentum=0, use_sigmoid=True, loss_weight=1.0):
        assert use_sigmoid
        self.bins = bins
        self.loss_weight = loss_weight

    def __call__(self, pred, target, label_weight, avg_factor=None):
        return self.loss_weight * ghm_c_loss(pred, target, label_weight,
                                             self.bins)


@LOSSES.register_module()
class GaussianFocalLoss:
    def __init__(self, alpha=2.0, gamma=4.0, loss_weight=1.0):
        self.alpha, self.gamma = alpha, gamma
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * gaussian_focal_loss(
            pred, target, self.alpha, self.gamma, weight, avg_factor)


@LOSSES.register_module()
class QualityFocalLoss:
    def __init__(self, use_sigmoid=True, beta=2.0, loss_weight=1.0):
        self.beta = beta
        self.loss_weight = loss_weight

    def __call__(self, pred, label_onehot, score, weight=None,
                 avg_factor=None):
        return self.loss_weight * quality_focal_loss(
            pred, label_onehot, score, self.beta, weight, avg_factor)


@LOSSES.register_module()
class DistributionFocalLoss:
    def __init__(self, loss_weight=0.25):
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * distribution_focal_loss(
            pred, target, weight, avg_factor)


def ghm_r_loss(pred, target, label_weight, mu: float = 0.02, bins: int = 10):
    """Gradient-harmonized regression loss (reference losses/ghm_loss.py:
    GHMR, stateless momentum=0 form): authentic smooth-L1
    sqrt(d^2 + mu^2) - mu, re-weighted by inverse gradient-density bins."""
    diff = pred - target
    loss = jnp.sqrt(diff * diff + mu * mu) - mu
    g = jax.lax.stop_gradient(
        jnp.abs(diff / jnp.sqrt(mu * mu + diff * diff)))
    valid = label_weight > 0
    total = jnp.maximum(jnp.sum(label_weight), 1.0)
    edges = jnp.linspace(0, 1, bins + 1)
    edges = edges.at[-1].set(1e3)
    weights = jnp.zeros_like(g)
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = jnp.sum(inds)
        w = jnp.where(num_in_bin > 0,
                      total / jnp.maximum(num_in_bin, 1.0), 0.0)
        weights = jnp.where(inds, w, weights)
    n_nonempty = jnp.maximum(jnp.sum(jnp.asarray(
        [jnp.any((g >= edges[i]) & (g < edges[i + 1]) & valid)
         for i in range(bins)]).astype(jnp.float32)), 1.0)
    weights = weights / n_nonempty
    return jnp.sum(loss * weights) / total


@LOSSES.register_module()
class GHMR:
    def __init__(self, mu=0.02, bins=10, momentum=0, loss_weight=1.0):
        self.mu, self.bins = mu, bins
        self.loss_weight = loss_weight

    def __call__(self, pred, target, label_weight, avg_factor=None):
        return self.loss_weight * ghm_r_loss(pred, target, label_weight,
                                             self.mu, self.bins)


def bounded_iou_loss(pred, target, beta: float = 0.2, eps: float = 1e-3,
                     weight=None, avg_factor=None):
    """Bounded IoU loss (reference losses/iou_loss.py:bounded_iou_loss —
    "Improving Object Localization with Fitness NMS"): per-coordinate
    bounded-IoU terms through a smooth-L1 envelope."""
    px = (pred[..., 0] + pred[..., 2]) * 0.5
    py = (pred[..., 1] + pred[..., 3]) * 0.5
    pw = pred[..., 2] - pred[..., 0]
    ph = pred[..., 3] - pred[..., 1]
    tx = jax.lax.stop_gradient((target[..., 0] + target[..., 2]) * 0.5)
    ty = jax.lax.stop_gradient((target[..., 1] + target[..., 3]) * 0.5)
    tw = jax.lax.stop_gradient(target[..., 2] - target[..., 0])
    th = jax.lax.stop_gradient(target[..., 3] - target[..., 1])

    dx = tx - px
    dy = ty - py
    loss_dx = 1 - jnp.maximum(
        (tw - 2 * jnp.abs(dx)) / (tw + 2 * jnp.abs(dx) + eps), 0)
    loss_dy = 1 - jnp.maximum(
        (th - 2 * jnp.abs(dy)) / (th + 2 * jnp.abs(dy) + eps), 0)
    loss_dw = 1 - jnp.minimum(tw / (pw + eps), pw / (tw + eps))
    loss_dh = 1 - jnp.minimum(th / (ph + eps), ph / (th + eps))
    comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], axis=-1)
    loss = jnp.where(comb < beta, 0.5 * comb * comb / beta,
                     comb - 0.5 * beta)
    if weight is not None and weight.ndim < loss.ndim:
        weight = weight[..., None]
    return weight_reduce_loss(loss, weight, avg_factor)


@LOSSES.register_module()
class BoundedIoULoss:
    def __init__(self, beta=0.2, eps=1e-3, loss_weight=1.0):
        self.beta, self.eps = beta, eps
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * bounded_iou_loss(
            pred, target, self.beta, self.eps, weight, avg_factor)


@LOSSES.register_module()
class AssociativeEmbeddingLoss:
    """Corner-pairing pull/push loss (reference losses/ae_loss.py:72-100);
    the dense per-image computation lives in
    :func:`dynamask_tpu.models.cornernet.ae_loss_single`."""

    def __init__(self, pull_weight=0.25, push_weight=0.25):
        self.pull_weight = pull_weight
        self.push_weight = push_weight

    def __call__(self, tl_emb, br_emb, tl_yx, br_yx, gt_valid):
        from .cornernet import ae_loss_single
        import jax
        pl, ps = jax.vmap(
            lambda te, be, ty, by, gv: ae_loss_single(
                te, be, ty, by, gv, self.pull_weight, self.push_weight))(
            tl_emb, br_emb, tl_yx, br_yx, gt_valid)
        return pl.sum(), ps.sum()
