"""Middle-format custom dataset.

Rebuild of the reference's CustomDataset (reference: mmdet/datasets/
custom.py:13): the annotation file is a json or pickle LIST of per-image
dicts::

    [{'filename': 'a.jpg', 'width': 1280, 'height': 720,
      'ann': {'bboxes': (n, 4) float32 xyxy, 'labels': (n,) int64,
              'bboxes_ignore': (k, 4), 'labels_ignore': (k,)}}, ...]

Evaluation is VOC-protocol mAP (reference custom.py delegates to
core/evaluation/mean_ap.py). The static-shape formatting contract matches
every other dataset here (data/formatting.py).
"""

from __future__ import annotations

import os.path as osp
import json
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..utils.registry import DATASETS
from ..core.mean_ap import eval_map
from .transforms import Compose
from .formatting import format_sample


@DATASETS.register_module()
class CustomDataset:
    CLASSES: Sequence[str] = ()

    def __init__(self, ann_file: str, pipeline: Sequence[dict],
                 img_prefix: str = '', data_root: Optional[str] = None,
                 test_mode: bool = False, filter_empty_gt: bool = True,
                 canvases=((512, 512), (768, 768), (1024, 1024)),
                 max_gts: int = 100, mask_crop_size: int = 128,
                 classes: Optional[Sequence[str]] = None):
        if classes is not None:
            self.CLASSES = tuple(classes)
        if data_root is not None:
            if not osp.isabs(ann_file):
                ann_file = osp.join(data_root, ann_file)
            if img_prefix and not osp.isabs(img_prefix):
                img_prefix = osp.join(data_root, img_prefix)
        self.img_prefix = img_prefix
        self.test_mode = test_mode
        self.canvases = [tuple(c) for c in canvases]
        self.max_gts = max_gts
        self.mask_crop_size = mask_crop_size

        self.data_infos = self.load_annotations(ann_file)
        if not test_mode:
            # reference custom.py _filter_imgs: drop tiny images and, when
            # filter_empty_gt, images without gt boxes
            keep = []
            for i, info in enumerate(self.data_infos):
                if min(info.get('width', 33), info.get('height', 33)) < 32:
                    continue
                if filter_empty_gt and \
                        len(info.get('ann', {}).get('bboxes', ())) == 0:
                    continue
                keep.append(i)
            self.data_infos = [self.data_infos[i] for i in keep]
        # aspect-ratio group flag (reference custom.py _set_group_flag)
        self.flags = np.array(
            [0 if i.get('width', 1) / max(i.get('height', 1), 1) > 1 else 1
             for i in self.data_infos], np.int64)
        self.img_infos = [dict(id=i, file_name=info['filename'],
                               width=info.get('width', 0),
                               height=info.get('height', 0))
                          for i, info in enumerate(self.data_infos)]
        self.pipeline = Compose(pipeline)

    @staticmethod
    def load_annotations(ann_file: str) -> List[Dict]:
        if ann_file.endswith(('.pkl', '.pickle')):
            with open(ann_file, 'rb') as f:
                return pickle.load(f)
        with open(ann_file) as f:
            return json.load(f)

    def __len__(self) -> int:
        return len(self.data_infos)

    def get_ann_info(self, idx: int) -> Dict:
        ann = dict(self.data_infos[idx].get('ann', {}))
        boxes = np.asarray(ann.get('bboxes', ()),
                           np.float32).reshape(-1, 4)
        labels = np.asarray(ann.get('labels', ()), np.int64).reshape(-1)
        boxes_ig = np.asarray(ann.get('bboxes_ignore', ()),
                              np.float32).reshape(-1, 4)
        labels_ig = np.asarray(ann.get('labels_ignore', ()),
                               np.int64).reshape(-1)
        out = dict(bboxes=boxes, labels=labels, bboxes_ignore=boxes_ig,
                   labels_ignore=labels_ig)
        if 'masks' in ann:
            out['masks'] = ann['masks']
        else:
            out['masks'] = [None] * len(boxes)
        return out

    def pre_pipeline(self, idx: int) -> Dict:
        """Seed the pipeline ``results`` dict (reference custom.py
        pre_pipeline). Shared by ``__getitem__`` and external pipeline
        drivers (TTA's per-aug re-runs in ``apis/test.py``)."""
        return {'img_info': self.img_infos[idx],
                'img_prefix': self.img_prefix, 'img_id': idx}

    def sample_id(self, idx: int) -> int:
        """The integer id emitted as a result's ``img_id`` — what this
        dataset's ``evaluate`` expects back (the dataset index here;
        CocoDataset overrides with the COCO image id)."""
        return idx

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        results = self.pre_pipeline(idx)
        if not self.test_mode:
            results['ann_info'] = self.get_ann_info(idx)
        results = self.pipeline(results)
        if results.get('gt_masks') and results['gt_masks'][0] is None:
            results.pop('gt_masks')
        sample = format_sample(results, self.canvases, self.max_gts,
                               self.mask_crop_size)
        sample['img_id'] = np.array(self.sample_id(idx), np.int64)
        return sample

    def evaluate(self, results: List[Dict], metric=('mAP',),
                 iou_thr: float = 0.5) -> Dict[str, float]:
        det_lists, anns = [], []
        for res in results:
            idx = int(res['img_id'])
            dets = np.asarray(res['dets'])
            labels = np.asarray(res['labels'])
            valid = np.asarray(res['valid']).astype(bool)
            per_cls = [dets[valid & (labels == c)]
                       for c in range(max(len(self.CLASSES), 1))]
            det_lists.append(per_cls)
            anns.append(self.get_ann_info(idx))
        mAP, _ = eval_map(det_lists, anns, iou_thr=iou_thr, mode='area')
        return {'mAP': mAP}
