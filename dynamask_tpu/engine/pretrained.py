"""Torch checkpoint import: torchvision ResNets and mmdet detector weights.

The reference trains from ``pretrained='torchvision://resnet50'`` (loaded by
mmcv ``load_checkpoint`` — reference: mmdet/apis/inference.py:36 and
configs/dynamask/coco/r50-dynamask-1x.py:8); Cityscapes configs start from a
full COCO Mask R-CNN checkpoint. This module converts those torch
``state_dict`` trees into this repo's flax param/batch_stats trees:

  * torchvision naming  (``conv1.weight``, ``layer1.0.conv1.weight``, ...)
  * mmdet naming        (``backbone.conv1.weight``, ``neck.lateral_convs...``,
                         ``rpn_head...``, ``roi_head.bbox_head...``)

Layout conversions (torch -> flax):
  conv      OIHW             -> HWIO
  linear    (out, in)        -> (in, out); the FIRST fc after a conv feature
            additionally reorders its input axis from CHW- to HWC-flattening
  deconv    (in, out, kh, kw)-> (kh, kw, in, out)
  batchnorm weight/bias -> scale/bias; running_mean/var -> batch_stats
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

__all__ = ['load_torch_state_dict', 'convert_torch_weights',
           'apply_pretrained', 'resolve_pretrained_path']


# --------------------------------------------------------------- file loading

_TORCHVISION_FILES = {
    # torchvision model zoo file name stems (hub cache lookup)
    'resnet18': 'resnet18-', 'resnet34': 'resnet34-',
    'resnet50': 'resnet50-', 'resnet101': 'resnet101-',
    'resnet152': 'resnet152-',
}


def resolve_pretrained_path(spec: str) -> Optional[str]:
    """Resolve a ``pretrained`` spec to a local file, or None.

    ``torchvision://resnet50`` looks in ``$TORCH_HOME/hub/checkpoints`` (and
    ``./pretrained/``) for the zoo file; a plain path is returned as-is.
    Downloads are never attempted (offline-first)."""
    if not spec:
        return None
    if spec.startswith('torchvision://'):
        name = spec[len('torchvision://'):]
        stem = _TORCHVISION_FILES.get(name, name + '-')
        hub = os.path.join(
            os.environ.get('TORCH_HOME',
                           os.path.expanduser('~/.cache/torch')),
            'hub', 'checkpoints')
        for d in (hub, './pretrained', '/root/pretrained'):
            if os.path.isdir(d):
                for f in sorted(os.listdir(d)):
                    if f.startswith(stem) or f == name + '.pth':
                        return os.path.join(d, f)
        return None
    if spec.startswith(('http://', 'https://', 'open-mmlab://')):
        return None  # no egress; users must pre-download
    return spec if os.path.exists(spec) else None


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load a checkpoint file -> {name: float32 numpy} state dict."""
    import torch
    ckpt = torch.load(path, map_location='cpu')
    sd = ckpt.get('state_dict', ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        if hasattr(v, 'numpy'):
            out[k] = v.detach().to(torch.float32).numpy()
    return out


# ------------------------------------------------------------ key translation

# torchvision/mmcv VGG-16 'features.N' conv indices -> SSDVGG conv names
_VGG16_FEATURE_MAP = {
    0: 'conv1_1', 2: 'conv1_2',
    5: 'conv2_1', 7: 'conv2_2',
    10: 'conv3_1', 12: 'conv3_2', 14: 'conv3_3',
    17: 'conv4_1', 19: 'conv4_2', 21: 'conv4_3',
    24: 'conv5_1', 26: 'conv5_2', 28: 'conv5_3',
}


def _vgg_key(key: str) -> Optional[Tuple[List[str], str]]:
    # torchvision/mmcv VGG 'features.N.weight' -> SSDVGG conv names
    m = re.match(r'^features\.(\d+)\.(weight|bias)$', key)
    if m:
        name = _VGG16_FEATURE_MAP.get(int(m.group(1)))
        if name is not None:
            return [name], m.group(2)
    return None


def _resnet_key(key: str) -> Optional[Tuple[List[str], str]]:
    """torchvision/mmdet ResNet key -> (flax path under backbone, kind)."""
    m = re.match(r'^(conv1|bn1)\.(.+)$', key)
    if m:
        return [m.group(1)], m.group(2)
    m = re.match(r'^layer(\d+)\.(\d+)\.(conv\d|bn\d)\.(.+)$', key)
    if m:
        s, b, mod, leaf = m.groups()
        return [f'layer{s}_block{b}', mod], leaf
    m = re.match(r'^layer(\d+)\.(\d+)\.downsample\.(\d)\.(.+)$', key)
    if m:
        s, b, idx, leaf = m.groups()
        mod = 'downsample_conv' if idx == '0' else 'downsample_bn'
        return [f'layer{s}_block{b}', mod], leaf
    return None  # fc.* (classifier head) and unknowns are skipped


def _mmdet_key(key: str) -> Optional[Tuple[List[str], str, Dict]]:
    """mmdet detector key -> (flax path, torch leaf name, hints)."""
    if key.startswith('backbone.'):
        r = _resnet_key(key[len('backbone.'):])
        if r is None:
            return None
        path, leaf = r
        return ['backbone'] + path, leaf, {}
    m = re.match(r'^neck\.lateral_convs\.(\d+)\.conv\.(weight|bias)$', key)
    if m:
        return ['neck', f'lateral_{m.group(1)}'], m.group(2), {}
    m = re.match(r'^neck\.fpn_convs\.(\d+)\.conv\.(weight|bias)$', key)
    if m:
        return ['neck', f'fpn_conv_{m.group(1)}'], m.group(2), {}
    m = re.match(r'^rpn_head\.(rpn_conv|rpn_cls|rpn_reg)\.(weight|bias)$',
                 key)
    if m:
        return ['rpn_head', m.group(1)], m.group(2), {}
    m = re.match(r'^roi_head\.bbox_head\.shared_fcs\.(\d+)\.(weight|bias)$',
                 key)
    if m:
        i = int(m.group(1))
        hints = {'flatten_chw': True} if i == 0 else {}
        return ['roi_head', 'bbox_head', f'shared_fc_{i}'], m.group(2), hints
    m = re.match(r'^roi_head\.bbox_head\.(fc_cls|fc_reg)\.(weight|bias)$',
                 key)
    if m:
        return ['roi_head', 'bbox_head', m.group(1)], m.group(2), {}
    m = re.match(r'^roi_head\.mask_head\.convs\.(\d+)\.conv\.(weight|bias)$',
                 key)
    if m:
        return ['roi_head', 'mask_head', f'conv_{m.group(1)}'], m.group(2), {}
    m = re.match(r'^roi_head\.mask_head\.upsample\.(weight|bias)$', key)
    if m:
        return (['roi_head', 'mask_head', 'upsample'], m.group(1),
                {'deconv': True})
    m = re.match(r'^roi_head\.mask_head\.conv_logits\.(weight|bias)$', key)
    if m:
        return ['roi_head', 'mask_head', 'conv_logits'], m.group(1), {}
    # ---- DynaMask mask head + MSM (reference naming:
    #      mask_heads/dynamask_head.py:54-199 SFMStage/stages/instance_convs,
    #      base_roi_head.py:10-27 MaskPre as roi_head.mask_predictor) ------
    m = re.match(r'^roi_head\.mask_head\.instance_convs\.(\d+)\.conv\.'
                 r'(weight|bias)$', key)
    if m:
        return (['roi_head', 'mask_head', f'instance_conv_{m.group(1)}'],
                m.group(2), {})
    m = re.match(r'^roi_head\.mask_head\.stages\.(\d+)\.'
                 r'(semantic_transform_in|instance_logits|detail_logits|'
                 r'fuse_transform_out)\.(weight|bias)$', key)
    if m:
        return (['roi_head', 'mask_head', f'stage_{m.group(1)}',
                 m.group(2)], m.group(3), {})
    m = re.match(r'^roi_head\.mask_head\.stages\.(\d+)\.fuse_conv\.0\.'
                 r'(weight|bias)$', key)
    if m:
        return (['roi_head', 'mask_head', f'stage_{m.group(1)}',
                 'fuse_conv_0'], m.group(2), {})
    m = re.match(r'^roi_head\.mask_head\.stages\.(\d+)\.fuse_conv\.1\.'
                 r'conv_offset\.(weight|bias)$', key)
    if m:
        return (['roi_head', 'mask_head', f'stage_{m.group(1)}',
                 'fuse_conv_1', 'conv_offset'], m.group(2), {})
    m = re.match(r'^roi_head\.mask_head\.stages\.(\d+)\.fuse_conv\.1\.'
                 r'weight$', key)
    if m:
        # mmcv DeformConv2d stores its (bias-free) kernel as '.weight';
        # the flax DCNPack leaf is likewise named 'weight', not 'kernel'
        return (['roi_head', 'mask_head', f'stage_{m.group(1)}',
                 'fuse_conv_1'], 'weight', {'flax_leaf': 'weight'})
    m = re.match(r'^roi_head\.mask_head\.'
                 r'(final_instance_logits|final_detail_logits)\.'
                 r'(weight|bias)$', key)
    if m:
        return ['roi_head', 'mask_head', m.group(1)], m.group(2), {}
    m = re.match(r'^roi_head\.mask_predictor\.(conv1|conv2|fc2)\.'
                 r'(weight|bias)$', key)
    if m:
        return ['roi_head', 'mask_predictor', m.group(1)], m.group(2), {}
    m = re.match(r'^roi_head\.mask_predictor\.fc1\.(weight|bias)$', key)
    if m:
        # MaskPre flattens (N, 16, 14, 14) CHW-order into fc1
        # (base_roi_head.py:24); the flax head flattens HWC
        return (['roi_head', 'mask_predictor', 'fc1'], m.group(1),
                {'flatten_chw': True, 'roi_feat_size': 14})
    m = re.match(r'^roi_head\.mask_predictor\.(bn1|bn2)\.'
                 r'(weight|bias|running_mean|running_var|'
                 r'num_batches_tracked)$', key)
    if m:
        return ['roi_head', 'mask_predictor', m.group(1)], m.group(2), {}
    # the trainable detail-target fuse kernel lives under the loss module in
    # the reference (cross_entropy_loss.py:371 DetailTarget.fuse_kernel,
    # shape (1, 2, 1, 1)); here it is a (2,) roi_head param
    if key == 'roi_head.mask_head.loss_func.detail_target.fuse_kernel':
        return ['roi_head'], 'detail_fuse_kernel', {}
    return None


# ------------------------------------------------------------ tree assembly

def _get(tree, path):
    for p in path:
        if not isinstance(tree, dict) or p not in tree:
            return None
        tree = tree[p]
    return tree


def _set(tree, path, value):
    for p in path[:-1]:
        tree = tree.setdefault(p, {})
    tree[path[-1]] = value


def _convert_leaf(value: np.ndarray, torch_leaf: str, flax_target,
                  hints: Dict) -> Optional[Tuple[List[str], np.ndarray]]:
    """Map one torch tensor onto the flax leaf name + layout."""
    if torch_leaf == 'weight':
        if value.ndim == 4:
            if hints.get('flax_leaf'):
                # target leaf keeps a non-standard name (e.g. DCNPack's
                # bias-free 'weight'); layout conversion is the usual one
                return [hints['flax_leaf']], value.transpose(2, 3, 1, 0)
            if hints.get('deconv'):
                # torch ConvTranspose2d (in, out, kh, kw) -> flax
                # (kh, kw, in, out), spatially FLIPPED: torch computes the
                # conv gradient while flax ConvTranspose applies the kernel
                # in convolution orientation (verified numerically in
                # tests/test_pretrained.py::TestDeconv)
                return ['kernel'], np.ascontiguousarray(
                    value.transpose(2, 3, 0, 1)[::-1, ::-1])
            return ['kernel'], value.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if value.ndim == 2:
            if hints.get('flatten_chw') and flax_target is not None:
                out_f = value.shape[0]
                chw = value.shape[1]
                # infer (C, H, W): torch flattens C*H*W over the RoI's square
                # spatial extent. Derive C from the known roi_feat_size
                # (7 in every reference bbox-head config,
                # convfc_bbox_head.py:9; 14 kept as a fallback) — deriving
                # the channel count from a fixed candidate list instead
                # mis-factorizes e.g. 1024ch 7x7 (= 256ch 14x14).
                for s in (hints.get('roi_feat_size', 7), 14):
                    if chw % (s * s) == 0:
                        c = chw // (s * s)
                        w = value.reshape(out_f, c, s, s)
                        w = w.transpose(2, 3, 1, 0)  # H, W, C, out
                        return ['kernel'], w.reshape(s * s * c, out_f)
            return ['kernel'], value.T
        if value.ndim == 1:  # batchnorm weight
            return ['scale'], value
    elif torch_leaf == 'bias':
        return ['bias'], value
    elif torch_leaf == 'running_mean':
        return ['mean'], value
    elif torch_leaf == 'running_var':
        return ['var'], value
    elif torch_leaf == 'detail_fuse_kernel':
        # (1, 2, 1, 1) 1x1-conv fuse kernel -> (2,) weights
        return ['detail_fuse_weights'], value.reshape(2)
    return None


def convert_torch_weights(state_dict: Dict[str, np.ndarray],
                          params: Dict, batch_stats: Dict,
                          scope: str = 'auto', verbose: bool = False
                          ) -> Tuple[Dict, Dict, Dict[str, List[str]]]:
    """Graft torch weights onto (params, batch_stats) copies.

    ``scope``: 'auto' (sniff), 'resnet' (bare torchvision keys -> under
    ``backbone``), or 'mmdet' (full-detector keys).
    Returns (params, batch_stats, report) where report lists 'loaded',
    'skipped' (untranslatable torch keys) and 'mismatched' (shape conflicts).
    """
    import jax

    params = jax.tree_util.tree_map(lambda x: x, params)    # shallow copies
    batch_stats = jax.tree_util.tree_map(lambda x: x, batch_stats)
    if scope == 'auto':
        if any(k.startswith(('backbone.', 'neck.', 'rpn_head.',
                             'roi_head.')) for k in state_dict):
            scope = 'mmdet'
        elif any(k.startswith('features.') for k in state_dict):
            scope = 'vgg'
        else:
            scope = 'resnet'

    report = {'loaded': [], 'skipped': [], 'mismatched': []}
    # bare torchvision keys may target either a detector tree (params has a
    # 'backbone' key) or a bare backbone tree (params IS the ResNet tree)
    backbone_prefix = ['backbone'] if 'backbone' in params else []

    for key, value in state_dict.items():
        if scope == 'vgg':
            r = _vgg_key(key)
            if r is None:
                report['skipped'].append(key)
                continue
            path, leaf = backbone_prefix + r[0], r[1]
            hints = {}
        elif scope == 'resnet':
            r = _resnet_key(key)
            if r is None:
                report['skipped'].append(key)
                continue
            path, leaf = backbone_prefix + r[0], r[1]
            hints = {}
        else:
            r = _mmdet_key(key)
            if r is None:
                report['skipped'].append(key)
                continue
            path, leaf, hints = r

        is_stat = leaf in ('running_mean', 'running_var',
                           'num_batches_tracked')
        if leaf == 'num_batches_tracked':
            continue
        target_tree = batch_stats if is_stat else params
        probe = _get(target_tree, path)
        conv = _convert_leaf(
            value, leaf,
            (probe or {}).get('kernel') if isinstance(probe, dict) else None,
            hints)
        if conv is None:
            report['skipped'].append(key)
            continue
        sub, arr = conv
        full = path + sub
        existing = _get(target_tree, full)
        if existing is None:
            report['skipped'].append(key)
            continue
        if tuple(existing.shape) != tuple(arr.shape):
            report['mismatched'].append(
                f'{key}: torch {arr.shape} vs flax {tuple(existing.shape)}')
            continue
        _set(target_tree, full, np.asarray(arr, np.float32))
        report['loaded'].append(key)
    if verbose:
        print(f"pretrained: loaded {len(report['loaded'])}, "
              f"skipped {len(report['skipped'])}, "
              f"mismatched {len(report['mismatched'])}")
    return params, batch_stats, report


def apply_pretrained(variables: Dict, spec: str, logger=None) -> Dict:
    """Load ``pretrained=`` weights into a freshly-initialized variables
    tree. Missing files degrade to a warning (offline environments)."""
    path = resolve_pretrained_path(spec)
    log = (logger.info if logger else print)
    if path is None:
        log(f'pretrained "{spec}" not found locally - training from scratch')
        return variables
    sd = load_torch_state_dict(path)
    params, bs, report = convert_torch_weights(
        sd, variables['params'], variables.get('batch_stats', {}))
    log(f'pretrained {path}: loaded {len(report["loaded"])} tensors, '
        f'skipped {len(report["skipped"])}, '
        f'mismatched {len(report["mismatched"])}')
    if report['mismatched'] and logger:
        for m in report['mismatched'][:10]:
            logger.warning(f'  shape mismatch: {m}')
    out = dict(variables)
    out['params'] = params
    if bs:
        out['batch_stats'] = bs
    return out
