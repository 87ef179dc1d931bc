"""COCO dataset (annotation loading, static batching, evaluation).

Rebuild of the reference dataset stack (reference: mmdet/datasets/coco.py +
custom.py): json index without pycocotools, `_parse_ann_info` semantics
(crowd -> ignore boxes, label remapping to contiguous 0..79), aspect-ratio
grouping (orientation buckets replace the reference's group flags,
custom.py:_set_group_flag), results2json + COCO-protocol evaluation.
"""

from __future__ import annotations

import json
import os.path as osp
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..utils.registry import DATASETS
from .transforms import Compose
from .formatting import format_sample, collate
from .mask_codec import encode_mask
from .cocoeval import CocoEvaluator

COCO_CLASSES = (
    'person', 'bicycle', 'car', 'motorcycle', 'airplane', 'bus', 'train',
    'truck', 'boat', 'traffic light', 'fire hydrant', 'stop sign',
    'parking meter', 'bench', 'bird', 'cat', 'dog', 'horse', 'sheep', 'cow',
    'elephant', 'bear', 'zebra', 'giraffe', 'backpack', 'umbrella',
    'handbag', 'tie', 'suitcase', 'frisbee', 'skis', 'snowboard',
    'sports ball', 'kite', 'baseball bat', 'baseball glove', 'skateboard',
    'surfboard', 'tennis racket', 'bottle', 'wine glass', 'cup', 'fork',
    'knife', 'spoon', 'bowl', 'banana', 'apple', 'sandwich', 'orange',
    'broccoli', 'carrot', 'hot dog', 'pizza', 'donut', 'cake', 'chair',
    'couch', 'potted plant', 'bed', 'dining table', 'toilet', 'tv',
    'laptop', 'mouse', 'remote', 'keyboard', 'cell phone', 'microwave',
    'oven', 'toaster', 'sink', 'refrigerator', 'book', 'clock', 'vase',
    'scissors', 'teddy bear', 'hair drier', 'toothbrush')


class CocoIndex:
    """Minimal pycocotools.COCO replacement: json -> indexed lookups."""

    def __init__(self, ann_file: str):
        with open(ann_file) as f:
            data = json.load(f)
        self.dataset = data
        self.imgs = {img['id']: img for img in data.get('images', [])}
        self.cats = {c['id']: c for c in data.get('categories', [])}
        self.img_anns = defaultdict(list)
        for ann in data.get('annotations', []):
            self.img_anns[ann['image_id']].append(ann)

    @property
    def img_ids(self) -> List[int]:
        return list(self.imgs.keys())

    @property
    def cat_ids(self) -> List[int]:
        return list(self.cats.keys())


@DATASETS.register_module()
class CocoDataset:
    CLASSES = COCO_CLASSES

    def __init__(self,
                 ann_file: str,
                 pipeline: Sequence[dict],
                 img_prefix: str = '',
                 data_root: Optional[str] = None,
                 test_mode: bool = False,
                 filter_empty_gt: bool = True,
                 canvases: Sequence[Tuple[int, int]] = ((800, 1344),
                                                        (1344, 800),
                                                        (1344, 1344)),
                 max_gts: int = 100,
                 mask_crop_size: int = 128,
                 with_semantic: bool = False,
                 classes: Optional[Sequence[str]] = None,
                 proposal_file: Optional[str] = None,
                 max_proposals: int = 1000):
        if data_root is not None:
            if not osp.isabs(ann_file):
                ann_file = osp.join(data_root, ann_file)
            if img_prefix and not osp.isabs(img_prefix):
                img_prefix = osp.join(data_root, img_prefix)
            if proposal_file and not osp.isabs(proposal_file):
                proposal_file = osp.join(data_root, proposal_file)
        self.ann_file = ann_file
        self.img_prefix = img_prefix
        self.test_mode = test_mode
        self.canvases = [tuple(c) for c in canvases]
        self.max_gts = max_gts
        self.mask_crop_size = mask_crop_size
        self.with_semantic = with_semantic
        if classes is not None:
            self.CLASSES = tuple(classes)

        self.coco = CocoIndex(ann_file)
        # map category ids -> contiguous labels in CLASSES order
        name_to_cat = {c['name']: cid for cid, c in self.coco.cats.items()}
        self.cat_ids = [name_to_cat[n] for n in self.CLASSES
                        if n in name_to_cat]
        self.cat2label = {cid: i for i, cid in enumerate(self.cat_ids)}

        self.img_infos = [self.coco.imgs[i] for i in self.coco.img_ids]
        # precomputed proposals (reference custom.py load_proposals: a
        # pickled list of (N, 4|5) arrays aligned with the UNFILTERED image
        # order); keyed by image id so GT filtering below can't misalign
        self.max_proposals = max_proposals
        self.proposals = None
        if proposal_file is not None:
            import pickle
            with open(proposal_file, 'rb') as f:
                plist = pickle.load(f)
            self.proposals = {info['id']: np.asarray(p, np.float32)
                              for info, p in zip(self.img_infos, plist)}
        if not test_mode:
            self.img_infos = self._filter_imgs(filter_empty_gt)
        # orientation grouping (reference custom.py:_set_group_flag)
        self.flags = np.array(
            [0 if info['width'] >= info['height'] else 1
             for info in self.img_infos], np.int64)
        self.pipeline = Compose(pipeline)

    def __len__(self) -> int:
        return len(self.img_infos)

    def _filter_imgs(self, filter_empty_gt: bool, min_size: int = 32):
        out = []
        for info in self.img_infos:
            if min(info['width'], info['height']) < min_size:
                continue
            anns = self.coco.img_anns.get(info['id'], [])
            valid = [a for a in anns if not a.get('iscrowd', 0)
                     and a['category_id'] in self.cat2label
                     and a['bbox'][2] > 1 and a['bbox'][3] > 1]
            if filter_empty_gt and not valid:
                continue
            out.append(info)
        return out

    def get_ann_info(self, idx: int) -> Dict:
        """Parse annotations (reference coco.py:_parse_ann_info)."""
        info = self.img_infos[idx]
        anns = self.coco.img_anns.get(info['id'], [])
        boxes, labels, masks = [], [], []
        boxes_ignore = []
        for ann in anns:
            if ann.get('ignore', False):
                continue
            x, y, bw, bh = ann['bbox']
            if bw < 1 or bh < 1 or ann.get('area', bw * bh) <= 0:
                continue
            box = [x, y, x + bw, y + bh]
            if ann.get('iscrowd', 0):
                boxes_ignore.append(box)
                continue
            if ann['category_id'] not in self.cat2label:
                continue
            boxes.append(box)
            labels.append(self.cat2label[ann['category_id']])
            masks.append(ann.get('segmentation'))
        return dict(
            bboxes=np.asarray(boxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int64),
            bboxes_ignore=np.asarray(boxes_ignore, np.float32).reshape(-1, 4),
            masks=masks)

    def pre_pipeline(self, idx: int) -> Dict:
        info = self.img_infos[idx]
        results = {
            'img_info': info,
            'img_prefix': self.img_prefix,
            'img_id': info['id'],
        }
        if self.proposals is not None:
            results['proposals'] = self.proposals[info['id']].copy()
        return results

    def sample_id(self, idx: int) -> int:
        return int(self.img_infos[idx]['id'])

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        results = self.pre_pipeline(idx)
        if not self.test_mode:
            results['ann_info'] = self.get_ann_info(idx)
        results = self.pipeline(results)
        sample = format_sample(results, self.canvases, self.max_gts,
                               self.mask_crop_size,
                               with_semantic=self.with_semantic,
                               max_proposals=self.max_proposals)
        sample['img_id'] = np.array(self.sample_id(idx), np.int64)
        return sample

    # ----------------------------------------------------------- evaluation

    def results2json(self, results: List[Dict]) -> Tuple[List[dict], List[dict]]:
        """Convert per-image padded outputs to COCO det/segm annotation dicts.

        ``results[i]`` holds numpy 'dets' (D,5) xyxy+score in ORIGINAL image
        coords, 'labels' (D,), 'valid' (D,), optional 'masks': list of D
        binary (h, w) numpy masks at original resolution.
        """
        det_json, segm_json = [], []
        for res in results:
            img_id = int(res['img_id'])
            dets = np.asarray(res['dets'])
            labels = np.asarray(res['labels'])
            valid = np.asarray(res['valid']).astype(bool)
            for d in np.nonzero(valid)[0]:
                x1, y1, x2, y2, score = dets[d]
                entry = {
                    'image_id': img_id,
                    'category_id': self.cat_ids[int(labels[d])],
                    'bbox': [float(x1), float(y1),
                             float(x2 - x1), float(y2 - y1)],
                    'score': float(score),
                }
                det_json.append(entry)
                if 'masks' in res:
                    seg = dict(entry)
                    seg['segmentation'] = encode_mask(
                        np.asarray(res['masks'][d], np.uint8))
                    segm_json.append(seg)
        return det_json, segm_json

    def fast_eval_recall(self, results: List[Dict],
                         proposal_nums: Sequence[int] = (100, 300, 1000),
                         iou_thrs: Optional[Sequence[float]] = None
                         ) -> np.ndarray:
        """Proposal average recall by direct IoU matching (reference
        coco.py:313-335 fast_eval_recall). Uses ``res['proposals']`` when
        present (RPN-style output), else the valid detections."""
        from ..core import eval_recalls
        if iou_thrs is None:
            iou_thrs = np.arange(0.5, 0.96, 0.05)
        by_id = {int(r['img_id']): r for r in results}
        gts, props = [], []
        for info in self.img_infos:
            # same filtering as get_ann_info (reference fast_eval_recall
            # goes through get_ann_info): configured-class subset only,
            # no crowd/ignore, no degenerate (<1px) boxes
            boxes = [a['bbox'] for a in self.coco.img_anns.get(info['id'], [])
                     if not (a.get('iscrowd', 0) or a.get('ignore', 0))
                     and a.get('category_id') in self.cat2label
                     and a['bbox'][2] >= 1 and a['bbox'][3] >= 1
                     and a.get('area', a['bbox'][2] * a['bbox'][3]) > 0]
            b = np.asarray(boxes, np.float32).reshape(-1, 4)
            gts.append(np.concatenate([b[:, :2], b[:, :2] + b[:, 2:]],
                                      axis=1))
            res = by_id.get(info['id'])
            if res is None:
                props.append(np.zeros((0, 5), np.float32))
                continue
            if 'proposals' in res:
                p = np.asarray(res['proposals'], np.float32).reshape(-1, 5)
            else:
                dets = np.asarray(res['dets'], np.float32).reshape(-1, 5)
                valid = np.asarray(res['valid']).astype(bool)
                p = dets[valid]
            if len(p):
                p = p[np.argsort(-p[:, 4], kind='mergesort')]
            props.append(p)
        rec = eval_recalls(gts, props, proposal_nums, iou_thrs)
        return rec.mean(axis=1)

    def _classwise_table(self, ev: CocoEvaluator, title: str) -> None:
        """Per-category AP table (reference coco.py:496-516 classwise)."""
        rows = []
        for cat, ap in ev.per_class_ap.items():
            name = self.coco.cats.get(cat, {}).get(
                'name', self.CLASSES[self.cat2label.get(cat, 0)])
            rows.append((name, ap))
        width = max((len(n) for n, _ in rows), default=8)
        print(f'\n--- per-category {title} AP ---')
        for name, ap in rows:
            print(f'{name:<{width}}  {ap:.3f}')

    def evaluate(self, results: List[Dict],
                 metric: Sequence[str] = ('bbox',),
                 classwise: bool = False) -> Dict[str, float]:
        det_json, segm_json = self.results2json(results)
        img_ids = [info['id'] for info in self.img_infos]

        gt_anns = []
        for info in self.img_infos:
            for ann in self.coco.img_anns.get(info['id'], []):
                if ann['category_id'] not in self.cat2label:
                    continue
                gt_anns.append(ann)

        img_sizes = {info['id']: (info['height'], info['width'])
                     for info in self.img_infos}
        out = {}
        if 'bbox' in metric:
            ev = CocoEvaluator(gt_anns, img_ids, self.cat_ids, 'bbox')
            for k, v in ev.evaluate(det_json).items():
                out[f'bbox_{k}'] = v
            if classwise:
                self._classwise_table(ev, 'bbox')
        if 'segm' in metric:
            ev = CocoEvaluator(gt_anns, img_ids, self.cat_ids, 'segm',
                               img_sizes=img_sizes)
            for k, v in ev.evaluate(segm_json).items():
                out[f'segm_{k}'] = v
            if classwise:
                self._classwise_table(ev, 'segm')
        if 'proposal' in metric:
            # class-agnostic AR@(100,300,1000) (reference coco.py:477-489,
            # cocoEval.params.useCats = 0)
            gt0 = [dict(a, category_id=0) for a in gt_anns]
            det0 = [dict(d, category_id=0) for d in det_json]
            ev = CocoEvaluator(gt0, img_ids, [0], 'bbox',
                               max_dets=(100, 300, 1000))
            out.update(ev.evaluate(det0))
        if 'proposal_fast' in metric:
            nums = (100, 300, 1000)
            ar = self.fast_eval_recall(results, nums)
            for i, n in enumerate(nums):
                out[f'AR@{n}'] = float(ar[i])
        return out


def build_dataset(cfg: dict, default_args: Optional[dict] = None):
    cfg = dict(cfg)
    t = cfg.get('type')
    if t in ('RepeatDataset', 'ClassBalancedDataset', 'ConcatDataset'):
        from .dataset_wrappers import wrap_dataset
        return wrap_dataset(cfg, lambda c: build_dataset(c, default_args))
    cfg.pop('type')
    if default_args:
        for k, v in default_args.items():
            cfg.setdefault(k, v)
    return DATASETS.build(dict(type=t, **cfg))


DEEPFASHION_CLASSES = ('top', 'skirt', 'leggings', 'dress', 'outer', 'pants',
                       'bag', 'neckwear', 'headwear', 'eyeglass', 'belt',
                       'footwear', 'hair', 'skin', 'face')


@DATASETS.register_module()
class DeepFashionDataset(CocoDataset):
    """reference datasets/deepfashion.py — COCO format, 15 fashion classes."""
    CLASSES = DEEPFASHION_CLASSES
