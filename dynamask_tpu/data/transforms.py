"""Host-side image/annotation transforms (numpy + cv2).

Rebuild of the reference pipeline transforms that matter for the shipped
configs (reference: mmdet/datasets/pipelines/transforms.py — Resize:25
keep-ratio, RandomFlip:297, Normalize:457, Pad:386 size-divisor;
loading.py LoadImageFromFile:12 / LoadAnnotations:164 with poly2mask=False).
Each transform maps a results dict to a results dict; masks stay as polygon
lists until static formatting (polygons transform exactly, bitmaps don't).
"""

from __future__ import annotations

import os.path as osp
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..utils.registry import PIPELINES


@PIPELINES.register_module()
class LoadImageFromFile:
    def __init__(self, to_float32: bool = False, color_type: str = 'color'):
        self.to_float32 = to_float32

    def __call__(self, results: Dict) -> Dict:
        import cv2
        path = osp.join(results.get('img_prefix', ''),
                        results['img_info']['file_name'])
        img = cv2.imread(path, cv2.IMREAD_COLOR)  # BGR
        if img is None:
            raise FileNotFoundError(path)
        if self.to_float32:
            img = img.astype(np.float32)
        results['filename'] = path
        results['img'] = img
        results['img_shape'] = img.shape
        results['ori_shape'] = img.shape
        return results


@PIPELINES.register_module()
class LoadAnnotations:
    def __init__(self, with_bbox: bool = True, with_mask: bool = False,
                 with_label: bool = True, poly2mask: bool = False):
        self.with_bbox = with_bbox
        self.with_mask = with_mask
        self.with_label = with_label

    def __call__(self, results: Dict) -> Dict:
        ann = results['ann_info']
        if self.with_bbox:
            results['gt_bboxes'] = ann['bboxes'].copy()
            results['gt_bboxes_ignore'] = ann['bboxes_ignore'].copy()
        if self.with_label:
            results['gt_labels'] = ann['labels'].copy()
        if self.with_mask:
            results['gt_masks'] = ann['masks']  # list of polygon lists / RLE
        return results


@PIPELINES.register_module()
class LoadProposals:
    """Precomputed-proposal loading (reference pipelines/loading.py:356):
    the dataset injects ``results['proposals']`` from its ``proposal_file``;
    this step validates the shape, drops a trailing score column, and
    truncates to ``num_max_proposals``. Fast R-CNN / GA-Fast configs."""

    def __init__(self, num_max_proposals: int = None):
        self.num_max_proposals = num_max_proposals

    def __call__(self, results: Dict) -> Dict:
        props = np.asarray(results['proposals'], np.float32)
        if props.ndim != 2 or props.shape[1] not in (4, 5):
            raise AssertionError(
                'proposals must be (N, 4|5), got %r' % (props.shape,))
        props = props[:, :4]
        if self.num_max_proposals is not None:
            props = props[:self.num_max_proposals]
        if len(props) == 0:
            props = np.zeros((1, 4), np.float32)
        results['proposals'] = props
        return results


@PIPELINES.register_module()
class Resize:
    """Keep-ratio resize to fit inside img_scale (max_long, max_short)
    (reference Resize with keep_ratio=True). Multi-scale accepted as a list
    with 'range' or 'value' sampling."""

    def __init__(self, img_scale=(1333, 800), keep_ratio: bool = True,
                 multiscale_mode: str = 'range'):
        if isinstance(img_scale[0], (list, tuple)):
            self.scales = [tuple(s) for s in img_scale]
        else:
            self.scales = [tuple(img_scale)]
        self.keep_ratio = keep_ratio
        self.multiscale_mode = multiscale_mode

    def _pick_scale(self, rng: np.random.RandomState):
        if len(self.scales) == 1:
            return self.scales[0]
        if self.multiscale_mode == 'value':
            return self.scales[rng.randint(len(self.scales))]
        longs = [max(s) for s in self.scales]
        shorts = [min(s) for s in self.scales]
        long_edge = rng.randint(min(longs), max(longs) + 1)
        short_edge = rng.randint(min(shorts), max(shorts) + 1)
        return (long_edge, short_edge)

    def __call__(self, results: Dict) -> Dict:
        import cv2
        rng = results.setdefault('_rng', np.random.RandomState())
        scale = self._pick_scale(rng)
        img = results['img']
        h, w = img.shape[:2]
        if self.keep_ratio:
            max_long, max_short = max(scale), min(scale)
            factor = min(max_long / max(h, w), max_short / min(h, w))
            new_w = int(w * factor + 0.5)
            new_h = int(h * factor + 0.5)
        else:
            # exact-size resize (reference Resize keep_ratio=False,
            # mmdet/datasets/pipelines/transforms.py:25 — SSD-style):
            # scale is (w, h) in mmcv convention for fixed resize; honor the
            # tuple order so portrait targets are not transposed.
            new_w, new_h = scale
        if (new_w, new_h) != (w, h):
            img = cv2.resize(img, (new_w, new_h),
                             interpolation=cv2.INTER_LINEAR)
        w_scale = new_w / w
        h_scale = new_h / h
        results['img'] = img
        results['img_shape'] = img.shape
        results['scale_factor'] = np.array(
            [w_scale, h_scale, w_scale, h_scale], np.float32)
        if 'gt_bboxes' in results:
            for key in ('gt_bboxes', 'gt_bboxes_ignore'):
                boxes = results[key] * results['scale_factor']
                boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, img.shape[1])
                boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, img.shape[0])
                results[key] = boxes
        if 'proposals' in results:  # precomputed proposals follow the image
            props = results['proposals'] * results['scale_factor']
            props[:, 0::2] = np.clip(props[:, 0::2], 0, img.shape[1])
            props[:, 1::2] = np.clip(props[:, 1::2], 0, img.shape[0])
            results['proposals'] = props
        if 'gt_masks' in results:
            results['gt_masks'] = [
                _scale_segm(m, w_scale, h_scale) for m in results['gt_masks']]
        return results


def _scale_segm(segm, w_scale: float, h_scale: float):
    if isinstance(segm, dict):  # RLE — flag for bitmap-space handling later
        out = dict(segm)
        out['_scale'] = (segm.get('_scale', (1.0, 1.0))[0] * w_scale,
                         segm.get('_scale', (1.0, 1.0))[1] * h_scale)
        return out
    return [np.asarray(p, np.float32).reshape(-1, 2) *
            np.array([w_scale, h_scale], np.float32) for p in segm]


def _flip_segm(segm, img_w: float):
    if isinstance(segm, dict):
        out = dict(segm)
        out['_flip'] = not segm.get('_flip', False)
        return out
    return [np.stack([img_w - p[:, 0], p[:, 1]], 1) for p in segm]


@PIPELINES.register_module()
class RandomFlip:
    def __init__(self, flip_ratio: float = 0.5, direction: str = 'horizontal'):
        self.flip_ratio = flip_ratio or 0.0
        assert direction == 'horizontal'

    def __call__(self, results: Dict) -> Dict:
        rng = results.setdefault('_rng', np.random.RandomState())
        flip = rng.rand() < self.flip_ratio
        results['flip'] = flip
        if not flip:
            return results
        results['img'] = np.ascontiguousarray(results['img'][:, ::-1])
        w = results['img'].shape[1]
        if 'gt_bboxes' in results:
            for key in ('gt_bboxes', 'gt_bboxes_ignore'):
                boxes = results[key].copy()
                boxes[:, 0] = w - results[key][:, 2]
                boxes[:, 2] = w - results[key][:, 0]
                results[key] = boxes
        if 'proposals' in results:
            props = results['proposals'].copy()
            props[:, 0] = w - results['proposals'][:, 2]
            props[:, 2] = w - results['proposals'][:, 0]
            results['proposals'] = props
        if 'gt_masks' in results:
            results['gt_masks'] = [_flip_segm(m, w)
                                   for m in results['gt_masks']]
        return results


@PIPELINES.register_module()
class Normalize:
    """BGR->RGB + per-channel standardize (reference Normalize:457)."""

    def __init__(self, mean, std, to_rgb: bool = True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results: Dict) -> Dict:
        img = results['img'].astype(np.float32)
        if self.to_rgb:
            img = img[..., ::-1]
        results['img'] = (img - self.mean) / self.std
        results['img_norm_cfg'] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb)
        return results


@PIPELINES.register_module()
class Pad:
    def __init__(self, size: Optional[Tuple[int, int]] = None,
                 size_divisor: Optional[int] = None, pad_val: float = 0):
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        h, w = img.shape[:2]
        if self.size is not None:
            th, tw = self.size
        else:
            d = self.size_divisor
            th, tw = ((h + d - 1) // d) * d, ((w + d - 1) // d) * d
        out = np.full((th, tw) + img.shape[2:], self.pad_val, img.dtype)
        out[:h, :w] = img
        results['img'] = out
        results['pad_shape'] = out.shape
        return results


@PIPELINES.register_module()
class RandomCrop:
    """Random crop with box clipping (reference transforms.py:498)."""

    def __init__(self, crop_size: Tuple[int, int]):
        self.crop_size = tuple(crop_size)

    def __call__(self, results: Dict) -> Dict:
        rng = results.setdefault('_rng', np.random.RandomState())
        img = results['img']
        ch = min(self.crop_size[0], img.shape[0])
        cw = min(self.crop_size[1], img.shape[1])
        y0 = rng.randint(0, img.shape[0] - ch + 1)
        x0 = rng.randint(0, img.shape[1] - cw + 1)
        results['img'] = img[y0:y0 + ch, x0:x0 + cw]
        results['img_shape'] = results['img'].shape
        if 'gt_bboxes' in results:
            shift = np.array([x0, y0, x0, y0], np.float32)
            for key in ('gt_bboxes', 'gt_bboxes_ignore'):
                boxes = results[key] - shift
                boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, cw)
                boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, ch)
                results[key] = boxes
            keep = (results['gt_bboxes'][:, 2] > results['gt_bboxes'][:, 0]) \
                & (results['gt_bboxes'][:, 3] > results['gt_bboxes'][:, 1])
            results['gt_bboxes'] = results['gt_bboxes'][keep]
            if 'gt_labels' in results:
                results['gt_labels'] = results['gt_labels'][keep]
            if 'gt_masks' in results:
                masks = [m for m, k in zip(results['gt_masks'], keep) if k]
                results['gt_masks'] = [
                    _shift_segm(m, -x0, -y0) for m in masks]
        return results


def _shift_segm(segm, dx, dy):
    if isinstance(segm, dict):
        out = dict(segm)
        sx, sy = out.get('_shift', (0.0, 0.0))
        out['_shift'] = (sx + dx, sy + dy)
        return out
    return [p + np.array([dx, dy], np.float32) for p in segm]


@PIPELINES.register_module()
class PhotoMetricDistortion:
    """Brightness/contrast/saturation/hue jitter (reference transforms.py:634).

    Operates on the BGR uint8/float image before Normalize."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta

    def __call__(self, results: Dict) -> Dict:
        import cv2
        rng = results.setdefault('_rng', np.random.RandomState())
        img = results['img'].astype(np.float32)
        if rng.randint(2):
            img += rng.uniform(-self.brightness_delta, self.brightness_delta)
        contrast_last = rng.randint(2)
        if not contrast_last and rng.randint(2):
            img *= rng.uniform(*self.contrast_range)
        hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                           cv2.COLOR_BGR2HSV).astype(np.float32)
        if rng.randint(2):
            hsv[..., 1] *= rng.uniform(*self.saturation_range)
        if rng.randint(2):
            hsv[..., 0] = (hsv[..., 0] + rng.uniform(-self.hue_delta,
                                                     self.hue_delta)) % 180
        img = cv2.cvtColor(np.clip(hsv, 0, 255).astype(np.uint8),
                           cv2.COLOR_HSV2BGR).astype(np.float32)
        if contrast_last and rng.randint(2):
            img *= rng.uniform(*self.contrast_range)
        results['img'] = np.clip(img, 0, 255)
        return results


@PIPELINES.register_module()
class Expand:
    """Place the image on a larger mean-filled canvas (reference
    transforms.py:740, SSD augmentation)."""

    def __init__(self, mean=(0, 0, 0), to_rgb=True, ratio_range=(1, 4),
                 prob=0.5):
        self.mean = tuple(mean)
        self.ratio_range = ratio_range
        self.prob = prob

    def __call__(self, results: Dict) -> Dict:
        rng = results.setdefault('_rng', np.random.RandomState())
        if rng.rand() > self.prob:
            return results
        img = results['img']
        h, w = img.shape[:2]
        ratio = rng.uniform(*self.ratio_range)
        eh, ew = int(h * ratio), int(w * ratio)
        y0 = rng.randint(0, eh - h + 1)
        x0 = rng.randint(0, ew - w + 1)
        canvas = np.empty((eh, ew) + img.shape[2:], img.dtype)
        canvas[...] = np.asarray(self.mean, img.dtype)
        canvas[y0:y0 + h, x0:x0 + w] = img
        results['img'] = canvas
        results['img_shape'] = canvas.shape
        if 'gt_bboxes' in results:
            shift = np.array([x0, y0, x0, y0], np.float32)
            for key in ('gt_bboxes', 'gt_bboxes_ignore'):
                results[key] = results[key] + shift
            if 'gt_masks' in results:
                results['gt_masks'] = [_shift_segm(m, x0, y0)
                                       for m in results['gt_masks']]
        return results


@PIPELINES.register_module()
class MinIoURandomCrop:
    """SSD-style IoU-constrained random crop (reference transforms.py:826)."""

    def __init__(self, min_ious=(0.1, 0.3, 0.5, 0.7, 0.9), min_crop_size=0.3):
        self.sample_modes = (1, *min_ious, 0)
        self.min_crop_size = min_crop_size

    def __call__(self, results: Dict) -> Dict:
        from ..data.cocoeval import bbox_iou_xywh  # xywh iou helper
        rng = results.setdefault('_rng', np.random.RandomState())
        img = results['img']
        h, w = img.shape[:2]
        boxes = results.get('gt_bboxes', np.zeros((0, 4), np.float32))
        for _ in range(50):
            mode = self.sample_modes[rng.randint(len(self.sample_modes))]
            if mode == 1:
                return results
            new_w = rng.uniform(self.min_crop_size * w, w)
            new_h = rng.uniform(self.min_crop_size * h, h)
            if new_h / new_w < 0.5 or new_h / new_w > 2:
                continue
            left = rng.uniform(0, w - new_w)
            top = rng.uniform(0, h - new_h)
            patch = np.array([left, top, left + new_w, top + new_h])
            if len(boxes):
                cx = (boxes[:, 0] + boxes[:, 2]) / 2
                cy = (boxes[:, 1] + boxes[:, 3]) / 2
                center_in = (cx > patch[0]) & (cy > patch[1]) & \
                    (cx < patch[2]) & (cy < patch[3])
                if not center_in.any():
                    continue
                x1 = np.maximum(boxes[:, 0], patch[0])
                y1 = np.maximum(boxes[:, 1], patch[1])
                x2 = np.minimum(boxes[:, 2], patch[2])
                y2 = np.minimum(boxes[:, 3], patch[3])
                inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
                area = (boxes[:, 2] - boxes[:, 0]) * \
                    (boxes[:, 3] - boxes[:, 1])
                ious = inter / np.maximum(area, 1e-6)
                if ious[center_in].min() < mode:
                    continue
                keep = center_in
                new_boxes = boxes.copy()
                new_boxes[:, 0::2] = np.clip(new_boxes[:, 0::2], patch[0],
                                             patch[2]) - patch[0]
                new_boxes[:, 1::2] = np.clip(new_boxes[:, 1::2], patch[1],
                                             patch[3]) - patch[1]
                results['gt_bboxes'] = new_boxes[keep]
                if 'gt_labels' in results:
                    results['gt_labels'] = results['gt_labels'][keep]
                if 'gt_masks' in results:
                    masks = [m for m, k in zip(results['gt_masks'], keep)
                             if k]
                    results['gt_masks'] = [
                        _shift_segm(m, -patch[0], -patch[1]) for m in masks]
            results['img'] = img[int(patch[1]):int(patch[3]),
                                 int(patch[0]):int(patch[2])]
            results['img_shape'] = results['img'].shape
            return results
        return results


@PIPELINES.register_module()
class SegRescale:
    """Rescale semantic seg maps (reference transforms.py:596)."""

    def __init__(self, scale_factor: float = 1.0):
        self.scale_factor = scale_factor

    def __call__(self, results: Dict) -> Dict:
        import cv2
        if 'gt_semantic_seg' in results and self.scale_factor != 1:
            seg = results['gt_semantic_seg']
            results['gt_semantic_seg'] = cv2.resize(
                seg, None, fx=self.scale_factor, fy=self.scale_factor,
                interpolation=cv2.INTER_NEAREST)
        return results


@PIPELINES.register_module()
class MultiScaleFlipAug:
    """Test-time augmentation wrapper (reference test_time_aug.py:10):
    applies the inner pipeline once per (scale, flip) combo and returns a
    LIST of results dicts."""

    def __init__(self, transforms: Sequence[dict], img_scale, flip=False,
                 flip_direction='horizontal'):
        self.transforms = Compose(transforms)
        scales = img_scale if isinstance(img_scale, list) else [img_scale]
        self.img_scales = [tuple(s) for s in scales]
        self.flip = flip

    def __call__(self, results: Dict):
        outs = []
        for scale in self.img_scales:
            for flip in ([False, True] if self.flip else [False]):
                r = dict(results)
                r['img'] = results['img'].copy()
                r['_tta_scale'] = scale
                r['_tta_flip'] = flip
                r = Resize(img_scale=scale, keep_ratio=True)(r)
                if flip:
                    r['img'] = np.ascontiguousarray(r['img'][:, ::-1])
                    r['flip'] = True
                outs.append(self.transforms(r))
        return outs


class Compose:
    def __init__(self, transforms: Sequence):
        from ..utils.registry import PIPELINES as REG
        self.transforms = []
        for t in transforms:
            if isinstance(t, dict):
                self.transforms.append(REG.build(t))
            else:
                self.transforms.append(t)

    def __call__(self, results: Dict) -> Optional[Dict]:
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results


@PIPELINES.register_module()
class AutoAugment:
    """Pick one random augmentation policy per sample
    (reference pipelines/auto_augment.py:10: each policy is a list of
    transform configs composed on the fly)."""

    def __init__(self, policies: Sequence[Sequence[Dict]]):
        assert isinstance(policies, (list, tuple)) and policies, \
            'Policies must be a non-empty list.'
        for p in policies:
            assert isinstance(p, (list, tuple)) and p, \
                'Each policy must be a non-empty list of transform dicts.'
        self.policies = [Compose(list(p)) for p in policies]

    def __call__(self, results: Dict) -> Optional[Dict]:
        rng = results.setdefault('_rng', np.random.RandomState())
        policy = self.policies[rng.randint(len(self.policies))]
        return policy(results)

    def __repr__(self):
        return f'{self.__class__.__name__}(policies={len(self.policies)})'


@PIPELINES.register_module()
class InstaBoost:
    """Instance-level copy-paste augmentation (reference pipelines/
    instaboost.py:7). Requires the external ``instaboostfast`` package —
    exactly like the reference, which imports it lazily; without it this
    transform raises at construction with a clear message."""

    def __init__(self, action_candidate=('normal', 'horizontal', 'skip'),
                 action_prob=(1, 0, 0), scale=(0.8, 1.2), dx=15, dy=15,
                 theta=(-1, 1), color_prob=0.5, hflag=False,
                 aug_ratio=0.5):
        try:
            import instaboostfast as instaboost
        except ImportError:
            raise ImportError(
                'InstaBoost needs the "instaboostfast" package '
                '(pip install instaboostfast), matching the reference\'s '
                'lazy dependency (mmdet/datasets/pipelines/instaboost.py)')
        self.cfg = instaboost.InstaBoostConfig(
            action_candidate, action_prob, scale, dx, dy, theta,
            color_prob, hflag)
        self.instaboost = instaboost
        self.aug_ratio = aug_ratio

    def __call__(self, results: Dict) -> Dict:
        rng = results.setdefault('_rng', np.random.RandomState())
        if rng.uniform() > self.aug_ratio:
            return results
        img = results['img']
        anns = results.get('_coco_anns')
        if not anns:
            return results
        anns, img = self.instaboost.get_new_data(anns, img, self.cfg,
                                                 background=None)
        results['img'] = img
        results['_coco_anns'] = anns
        return results


@PIPELINES.register_module()
class Corrupt:
    """Image corruption augmentation (reference pipelines/transforms.py:958).
    Requires the external ``imagecorruptions`` package, like the reference's
    lazy import; raises a clear error at construction without it."""

    def __init__(self, corruption: str, severity: int = 1):
        try:
            from imagecorruptions import corrupt  # noqa: F401
        except ImportError:
            raise ImportError(
                'Corrupt needs the "imagecorruptions" package '
                '(pip install imagecorruptions), matching the reference\'s '
                'lazy dependency (pipelines/transforms.py:958)')
        self.corruption = corruption
        self.severity = severity

    def __call__(self, results: Dict) -> Dict:
        from imagecorruptions import corrupt
        results['img'] = corrupt(
            results['img'].astype(np.uint8),
            corruption_name=self.corruption, severity=self.severity)
        return results


@PIPELINES.register_module()
class Albu:
    """Albumentations wrapper (reference pipelines/transforms.py:1002).
    Requires the external ``albumentations`` package — a lazy dependency
    exactly like the reference's; raises a clear error without it.

    Box conversion follows the reference: pascal_voc <-> internal xyxy with
    ``filter_lost_elements`` dropping annotations albumentations discards.
    """

    def __init__(self, transforms, bbox_params=None,
                 keymap=None, update_pad_shape=False,
                 skip_img_without_anno=False):
        try:
            import albumentations
            from albumentations import Compose as AlbuCompose
        except ImportError:
            raise ImportError(
                'Albu needs the "albumentations" package '
                '(pip install albumentations), matching the reference\'s '
                'lazy dependency (pipelines/transforms.py:1002)')
        self.filter_lost_elements = False
        if bbox_params is not None:
            bp = dict(bbox_params)
            if 'label_fields' in bp:
                self.filter_lost_elements = True
                self.origin_label_fields = bp['label_fields']
                bp['label_fields'] = ['idx_mapper']
            bbox_params = albumentations.BboxParams(**bp)
        self.aug = AlbuCompose(
            [self._build(t, albumentations) for t in transforms],
            bbox_params=bbox_params)
        self.keymap = keymap or {'img': 'image', 'gt_bboxes': 'bboxes'}
        self.keymap_back = {v: k for k, v in self.keymap.items()}
        self.update_pad_shape = update_pad_shape
        self.skip_img_without_anno = skip_img_without_anno

    def _build(self, cfg, albumentations):
        cfg = dict(cfg)
        t = cfg.pop('type')
        cls = getattr(albumentations, t)
        if 'transforms' in cfg:
            cfg['transforms'] = [self._build(c, albumentations)
                                 for c in cfg['transforms']]
        return cls(**cfg)

    def __call__(self, results: Dict) -> Dict:
        mapped = {self.keymap.get(k, k): v for k, v in results.items()}
        if 'bboxes' in mapped and isinstance(mapped['bboxes'], np.ndarray):
            mapped['bboxes'] = [tuple(b) for b in mapped['bboxes']]
            if self.filter_lost_elements:
                mapped['idx_mapper'] = list(range(len(mapped['bboxes'])))
        mapped = self.aug(**mapped)
        if 'bboxes' in mapped:
            mapped['bboxes'] = np.asarray(
                mapped['bboxes'], np.float32).reshape(-1, 4)
            if self.filter_lost_elements:
                keep = mapped.pop('idx_mapper')
                for field in self.origin_label_fields:
                    if field in mapped:
                        mapped[field] = np.asarray(
                            [mapped[field][i] for i in range(len(keep))])
                for k in ('gt_labels',):
                    if k in results:
                        mapped[k] = np.asarray(results[k])[keep]
                if 'gt_masks' in results:
                    mapped['gt_masks'] = [results['gt_masks'][i]
                                          for i in keep]
                if (not len(mapped['bboxes'])
                        and self.skip_img_without_anno):
                    return None
        out = {self.keymap_back.get(k, k): v for k, v in mapped.items()}
        out['img_shape'] = out['img'].shape
        return out


@PIPELINES.register_module()
class RandomCenterCropPad:
    """Random center crop with around-padding (CornerNet-style; reference
    pipelines/transforms.py:1197-1470).

    Train: pick ratio from ``ratios`` -> target (h, w) = crop_size * ratio;
    pick a random center inside the border-shrunk center range; paste the
    overlap of the original image into a mean-filled canvas with centers
    aligned; keep only GTs whose centers fall in the cropped patch.
    Test: mean-pad the image around its center to ``logical_or`` /
    ``size_divisor`` extents.
    """

    def __init__(self, crop_size=None, ratios=(0.9, 1.0, 1.1), border=128,
                 mean=None, std=None, to_rgb=None, test_mode=False,
                 test_pad_mode=('logical_or', 127)):
        assert mean is not None and std is not None and to_rgb is not None
        self.crop_size = crop_size
        self.ratios = ratios
        self.border = border
        self.mean = list(mean[::-1]) if to_rgb else list(mean)
        self.test_mode = test_mode
        self.test_pad_mode = test_pad_mode

    @staticmethod
    def _get_border(border, size):
        # shrink the border until the center range is non-empty
        # (transforms.py:1326-1341)
        k = 2 * border / size
        i = pow(2, np.ceil(np.log2(np.ceil(k))) + (k == int(k)))
        return int(border // i)

    def _crop_paste(self, image, center_y, center_x, th, tw):
        h, w, c = image.shape
        x0 = max(0, center_x - tw // 2)
        x1 = min(center_x + tw // 2, w)
        y0 = max(0, center_y - th // 2)
        y1 = min(center_y + th // 2, h)
        patch = np.array((int(x0), int(y0), int(x1), int(y1)))
        left, right = center_x - x0, x1 - center_x
        top, bottom = center_y - y0, y1 - center_y
        cy, cx = th // 2, tw // 2
        canvas = np.empty((th, tw, c), dtype=image.dtype)
        canvas[...] = np.asarray(self.mean, dtype=image.dtype)
        canvas[cy - top:cy + bottom, cx - left:cx + right] = \
            image[y0:y1, x0:x1]
        return canvas, (cx - left - x0, cy - top - y0), patch

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        h, w = img.shape[:2]
        if self.test_mode:
            mode, value = self.test_pad_mode
            if mode == 'logical_or':
                th, tw = h | value, w | value
            else:
                th = int(np.ceil(h / value) * value)
                tw = int(np.ceil(w / value) * value)
            canvas, (dx, dy), _ = self._crop_paste(img, h // 2, w // 2,
                                                   th, tw)
            results['img'] = canvas
            results['img_shape'] = canvas.shape
            if 'gt_bboxes' in results and len(results['gt_bboxes']):
                results['gt_bboxes'] = results['gt_bboxes'] + np.array(
                    [dx, dy, dx, dy], np.float32)
            return results

        rng = results.setdefault('_rng', np.random.RandomState())
        boxes = results.get('gt_bboxes', np.zeros((0, 4), np.float32))
        for _ in range(100):
            scale = self.ratios[rng.randint(len(self.ratios))]
            th = int(self.crop_size[0] * scale)
            tw = int(self.crop_size[1] * scale)
            hb = self._get_border(self.border, h)
            wb = self._get_border(self.border, w)
            cx = rng.randint(wb, max(w - wb, wb + 1))
            cy = rng.randint(hb, max(h - hb, hb + 1))
            canvas, (dx, dy), patch = self._crop_paste(img, cy, cx, th, tw)
            if len(boxes):
                centers = (boxes[:, :2] + boxes[:, 2:]) / 2
                keep = ((centers[:, 0] > patch[0]) &
                        (centers[:, 1] > patch[1]) &
                        (centers[:, 0] < patch[2]) &
                        (centers[:, 1] < patch[3]))
                if not keep.any():
                    continue
            else:
                keep = np.zeros((0,), bool)
            results['img'] = canvas
            results['img_shape'] = canvas.shape
            if len(boxes):
                new = boxes[keep] + np.array([dx, dy, dx, dy], np.float32)
                new[:, 0::2] = np.clip(new[:, 0::2], 0, tw)
                new[:, 1::2] = np.clip(new[:, 1::2], 0, th)
                results['gt_bboxes'] = new
                if 'gt_labels' in results:
                    results['gt_labels'] = results['gt_labels'][keep]
                if 'gt_masks' in results:
                    masks = [m for m, k in zip(results['gt_masks'], keep)
                             if k]
                    results['gt_masks'] = [_shift_segm(m, dx, dy)
                                           for m in masks]
            return results
        return results


# --------------------------------------------------------------------------
# Formatting compat shims.
#
# The reference ends every pipeline with torch-facing formatting transforms
# (mmdet/datasets/pipelines/formatting.py: DefaultFormatBundle:174,
# Collect:251, ImageToTensor:66, ToTensor, Transpose, ToDataContainer,
# WrapFieldsToLists). In this rebuild, the host keeps plain numpy HWC
# arrays through the pipeline and static-shape formatting happens once in
# data/formatting.py, so these are structure-preserving no-ops registered
# under their reference names: stock reference configs that list them load
# and run verbatim.

@PIPELINES.register_module()
class DefaultFormatBundle:
    """No-op: tensor packing is handled by formatting.format_sample."""

    def __call__(self, results: Dict) -> Dict:
        return results


@PIPELINES.register_module()
class Collect:
    """Records the reference's key selection without dropping anything:
    static formatting collects a fixed superset of fields downstream."""

    def __init__(self, keys=(), meta_keys=()):
        self.keys = tuple(keys)
        self.meta_keys = tuple(meta_keys)

    def __call__(self, results: Dict) -> Dict:
        return results


@PIPELINES.register_module()
class ImageToTensor:
    def __init__(self, keys=('img',)):
        self.keys = tuple(keys)

    def __call__(self, results: Dict) -> Dict:
        return results


@PIPELINES.register_module()
class ToTensor(ImageToTensor):
    pass


@PIPELINES.register_module()
class ToDataContainer:
    def __init__(self, fields=()):
        self.fields = tuple(fields)

    def __call__(self, results: Dict) -> Dict:
        return results


@PIPELINES.register_module()
class Transpose:
    """Axis transpose for the listed keys (reference formatting.py:84) —
    applied for real since downstream consumers see the array layout."""

    def __init__(self, keys, order):
        self.keys = tuple(keys)
        self.order = tuple(order)

    def __call__(self, results: Dict) -> Dict:
        for k in self.keys:
            results[k] = np.ascontiguousarray(
                np.transpose(results[k], self.order))
        return results


@PIPELINES.register_module()
class WrapFieldsToLists:
    """No-op (reference formatting.py wraps every field in a 1-list for
    inference collate; this runtime batches arrays directly)."""

    def __call__(self, results: Dict) -> Dict:
        return results


@PIPELINES.register_module()
class LoadMultiChannelImageFromFiles:
    """Stack per-channel image files along the channel axis
    (reference loading.py LoadMultiChannelImageFromFiles)."""

    def __init__(self, to_float32: bool = False, color_type: str = 'unchanged'):
        self.to_float32 = to_float32

    def __call__(self, results: Dict) -> Dict:
        import cv2
        names = results['img_info']['filename']
        prefix = results.get('img_prefix', '')
        imgs = []
        for name in names:
            path = osp.join(prefix, name)
            img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if img is None:
                raise FileNotFoundError(path)
            imgs.append(img)
        img = np.stack(imgs, axis=-1)
        if self.to_float32:
            img = img.astype(np.float32)
        results['filename'] = names
        results['img'] = img
        results['img_shape'] = img.shape
        results['ori_shape'] = img.shape
        return results
