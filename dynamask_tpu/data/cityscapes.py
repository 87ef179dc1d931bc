"""Cityscapes instance segmentation dataset.

Rebuild of the reference Cityscapes support (reference: mmdet/datasets/
cityscapes.py:1-321): COCO-format converted annotations (see
tools/convert_datasets/cityscapes.py), 8 instance classes, COCO-protocol
evaluation plus the ``results2txt`` export for the official
cityscapesscripts evaluator.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Dict, List, Sequence

import numpy as np

from ..utils.registry import DATASETS
from .coco import CocoDataset

CITYSCAPES_CLASSES = ('person', 'rider', 'car', 'truck', 'bus', 'train',
                      'motorcycle', 'bicycle')

# official cityscapes label ids for the 8 instance classes (results2txt)
CITYSCAPES_LABEL_IDS = {
    'person': 24, 'rider': 25, 'car': 26, 'truck': 27, 'bus': 28,
    'train': 31, 'motorcycle': 32, 'bicycle': 33,
}


@DATASETS.register_module()
class CityscapesDataset(CocoDataset):
    CLASSES = CITYSCAPES_CLASSES

    def __init__(self, *args, **kwargs):
        # 2048x1024 inputs at the reference's (2048, 1024) test scale pad to
        # a single landscape canvas
        kwargs.setdefault('canvases', ((1024, 2048), (2048, 1024)))
        super().__init__(*args, **kwargs)

    def _filter_imgs(self, filter_empty_gt, min_size=32):
        out = []
        for info in self.img_infos:
            anns = self.coco.img_anns.get(info['id'], [])
            valid = [a for a in anns if not a.get('iscrowd', 0)
                     and a['category_id'] in self.cat2label]
            if filter_empty_gt and not valid:
                continue
            out.append(info)
        return out

    def results2txt(self, results: List[Dict], outfile_prefix: str):
        """Official-evaluator export (reference cityscapes.py:results2txt):
        per image a txt listing ``<maskfile> <labelID> <score>`` plus the
        per-instance PNG masks."""
        import cv2
        os.makedirs(outfile_prefix, exist_ok=True)
        files = []
        for res in results:
            info = next(i for i in self.img_infos
                        if i['id'] == int(res['img_id']))
            stem = osp.splitext(osp.basename(info['file_name']))[0]
            txt = osp.join(outfile_prefix, f'{stem}.txt')
            lines = []
            valid = np.asarray(res['valid']).astype(bool)
            for d in np.nonzero(valid)[0]:
                cls_name = self.CLASSES[int(res['labels'][d])]
                score = float(res['dets'][d, 4])
                png = f'{stem}_{d}_{cls_name}.png'
                mask = np.asarray(res['masks'][d], np.uint8) * 255
                cv2.imwrite(osp.join(outfile_prefix, png), mask)
                lines.append(
                    f'{png} {CITYSCAPES_LABEL_IDS[cls_name]} {score:.6f}')
            with open(txt, 'w') as f:
                f.write('\n'.join(lines))
            files.append(txt)
        return files
