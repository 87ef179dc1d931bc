"""LVIS v0.5 / v1 datasets + federated evaluation.

Rebuild of the reference LVIS support (reference: mmdet/datasets/lvis.py:
1-807 — LVISV05Dataset/LVISV1Dataset with AP/APr/APc/APf). Class names load
from the annotation json (the reference hardcodes the 1203-entry list in
mmdet/utils/lvis_v1_categories.py; the json carries the same data).

LVIS protocol differences from COCO handled here:
  * max 300 detections per image (MAX_DETS);
  * federated annotations: per-image ``neg_category_ids`` and
    ``not_exhaustive_category_ids`` — detections of categories not in an
    image's annotated set are ignored rather than counted as FPs;
  * AP additionally broken out by category frequency (rare/common/frequent).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..utils.registry import DATASETS
from .coco import CocoDataset
from .cocoeval import CocoEvaluator, AREA_RNGS, IOU_THRS, REC_THRS


class LvisEvaluator(CocoEvaluator):
    """COCO-protocol core with LVIS's 300-det cap and federated ignoring."""

    MAX_DETS_LVIS = 300

    def __init__(self, gt_anns, img_ids, cat_ids, iou_type='bbox',
                 img_sizes=None, img_neg_cats=None, img_seen_cats=None,
                 cat_freq=None):
        super().__init__(gt_anns, img_ids, cat_ids, iou_type, img_sizes)
        self.img_neg_cats = img_neg_cats or {}
        self.img_seen_cats = img_seen_cats or {}
        self.cat_freq = cat_freq or {}

    def evaluate(self, det_anns: List[dict]) -> Dict[str, float]:
        # federated filtering: keep a det only if its category is annotated
        # (positively or negatively) for that image; cap 300/image by score
        by_img = defaultdict(list)
        for d in det_anns:
            by_img[d['image_id']].append(d)
        kept = []
        for img, dets in by_img.items():
            seen = self.img_seen_cats.get(img)
            neg = self.img_neg_cats.get(img, set())
            dets = sorted(dets, key=lambda d: -d['score'])
            dets = dets[:self.MAX_DETS_LVIS]
            for d in dets:
                if seen is None or d['category_id'] in seen or \
                        d['category_id'] in neg:
                    kept.append(d)
        stats = super().evaluate(kept)
        # frequency-band APs need per-category precision; recompute cheaply
        # by evaluating each band's categories separately
        if self.cat_freq:
            for band, key in (('r', 'mAP_r'), ('c', 'mAP_c'), ('f', 'mAP_f')):
                band_cats = [c for c in self.cat_ids
                             if self.cat_freq.get(c) == band]
                if not band_cats:
                    stats[key] = -1.0
                    continue
                sub = LvisEvaluator(
                    [a for a in sum(self.gt_by_key.values(), [])
                     if a['category_id'] in set(band_cats)],
                    self.img_ids, band_cats, self.iou_type, self.img_sizes,
                    self.img_neg_cats, self.img_seen_cats)
                stats[key] = sub.evaluate(
                    [d for d in kept if d['category_id'] in
                     set(band_cats)])['mAP']
        return stats


@DATASETS.register_module()
class LVISV1Dataset(CocoDataset):
    """LVIS v1 (reference lvis.py:LVISV1Dataset)."""

    def __init__(self, *args, **kwargs):
        kwargs.setdefault('filter_empty_gt', True)
        # class list resolves from the annotation json unless given
        self._lvis_classes_from_json = kwargs.get('classes') is None
        super().__init__(*args, **kwargs)

    def _filter_imgs(self, filter_empty_gt, min_size=32):
        if self._lvis_classes_from_json:
            cats = sorted(self.coco.cats.items())
            self.CLASSES = tuple(c['name'] for _, c in cats)
            self.cat_ids = [cid for cid, _ in cats]
            self.cat2label = {cid: i for i, cid in enumerate(self.cat_ids)}
        # LVIS images carry coco_url-style file names; normalize
        for info in self.img_infos:
            if 'file_name' not in info and 'coco_url' in info:
                info['file_name'] = info['coco_url'].split('/')[-1]
        return super()._filter_imgs(filter_empty_gt, min_size)

    def _federated_maps(self):
        img_neg, img_seen = {}, {}
        for info in self.img_infos:
            img_neg[info['id']] = set(info.get('neg_category_ids', []))
            seen = set(a['category_id']
                       for a in self.coco.img_anns.get(info['id'], []))
            seen |= set(info.get('not_exhaustive_category_ids', []))
            img_seen[info['id']] = seen
        return img_neg, img_seen

    def _cat_freq(self):
        freq = {}
        for cid, cat in self.coco.cats.items():
            f = cat.get('frequency')
            if f is None:
                n = cat.get('image_count', 0)
                f = 'r' if n < 10 else ('c' if n < 100 else 'f')
            freq[cid] = f
        return freq

    def evaluate(self, results, metric=('bbox',)):
        det_json, segm_json = self.results2json(results)
        img_ids = [i['id'] for i in self.img_infos]
        gt_anns = [a for i in self.img_infos
                   for a in self.coco.img_anns.get(i['id'], [])]
        img_sizes = {i['id']: (i['height'], i['width'])
                     for i in self.img_infos}
        img_neg, img_seen = self._federated_maps()
        freq = self._cat_freq()
        out = {}
        for m in metric:
            if m not in ('bbox', 'segm'):
                continue
            ev = LvisEvaluator(gt_anns, img_ids, self.cat_ids, m,
                               img_sizes=img_sizes, img_neg_cats=img_neg,
                               img_seen_cats=img_seen, cat_freq=freq)
            dets = det_json if m == 'bbox' else segm_json
            for k, v in ev.evaluate(dets).items():
                out[f'{m}_{k}'] = v
        return out


@DATASETS.register_module()
class LVISV05Dataset(LVISV1Dataset):
    """LVIS v0.5 (reference lvis.py:LVISV05Dataset) — same machinery; v0.5
    jsons use the same schema with 1230 categories."""
    pass


# alias matching the reference registry name
DATASETS.register_module(name='LvisDataset', module=LVISV05Dataset)
