"""Pascal VOC / XML-style datasets.

Rebuild of the reference XML dataset family (reference: mmdet/datasets/
xml_style.py + voc.py + wider_face.py): annotations parsed from per-image
XML files, VOC-protocol mAP evaluation (mean_ap.py)."""

from __future__ import annotations

import os.path as osp
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..utils.registry import DATASETS
from ..core.mean_ap import eval_map
from .transforms import Compose
from .formatting import format_sample

VOC_CLASSES = ('aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus',
               'car', 'cat', 'chair', 'cow', 'diningtable', 'dog', 'horse',
               'motorbike', 'person', 'pottedplant', 'sheep', 'sofa',
               'train', 'tvmonitor')


@DATASETS.register_module()
class XMLDataset:
    CLASSES: Sequence[str] = ()

    def __init__(self, ann_file: str, pipeline: Sequence[dict],
                 img_prefix: str = '', data_root: Optional[str] = None,
                 img_subdir: str = 'JPEGImages',
                 ann_subdir: str = 'Annotations',
                 test_mode: bool = False, min_size: Optional[int] = None,
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
        self.img_subdir = img_subdir
        self.ann_subdir = ann_subdir
        self.test_mode = test_mode
        self.min_size = min_size
        self.canvases = [tuple(c) for c in canvases]
        self.max_gts = max_gts
        self.mask_crop_size = mask_crop_size
        self.cat2label = {c: i for i, c in enumerate(self.CLASSES)}

        with open(ann_file) as f:
            self.img_ids = [line.strip() for line in f if line.strip()]
        self.img_infos = []
        for img_id in self.img_ids:
            xml_path = osp.join(self.img_prefix, self.ann_subdir,
                                f'{img_id}.xml')
            w = h = 0
            filename = osp.join(self.img_subdir, f'{img_id}.jpg')
            if osp.exists(xml_path):
                root = ET.parse(xml_path).getroot()
                size = root.find('size')
                if size is not None:
                    w = int(size.find('width').text)
                    h = int(size.find('height').text)
            self.img_infos.append(dict(id=img_id, file_name=filename,
                                       width=w, height=h))
        self.flags = np.array([0 if i['width'] >= i['height'] else 1
                               for i in self.img_infos], np.int64)
        self.pipeline = Compose(pipeline)

    def __len__(self):
        return len(self.img_infos)

    def get_ann_info(self, idx: int) -> Dict:
        img_id = self.img_infos[idx]['id']
        xml_path = osp.join(self.img_prefix, self.ann_subdir,
                            f'{img_id}.xml')
        boxes, labels, boxes_ig, labels_ig = [], [], [], []
        if osp.exists(xml_path):
            root = ET.parse(xml_path).getroot()
            for obj in root.findall('object'):
                name = obj.find('name').text
                if name not in self.cat2label:
                    continue
                diff = int((obj.find('difficult').text
                            if obj.find('difficult') is not None else 0))
                bb = obj.find('bndbox')
                box = [float(bb.find('xmin').text) - 1,
                       float(bb.find('ymin').text) - 1,
                       float(bb.find('xmax').text),
                       float(bb.find('ymax').text)]
                if self.min_size and (box[2] - box[0] < self.min_size or
                                      box[3] - box[1] < self.min_size):
                    diff = 1
                if diff:
                    boxes_ig.append(box)
                    labels_ig.append(self.cat2label[name])
                else:
                    boxes.append(box)
                    labels.append(self.cat2label[name])
        return dict(
            bboxes=np.asarray(boxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int64),
            bboxes_ignore=np.asarray(boxes_ig, np.float32).reshape(-1, 4),
            labels_ignore=np.asarray(labels_ig, np.int64),
            masks=[None] * len(boxes))

    def pre_pipeline(self, idx: int) -> Dict:
        """Seed the pipeline results dict (reference custom.py
        pre_pipeline contract — see CustomDataset.pre_pipeline)."""
        return {'img_info': self.img_infos[idx],
                'img_prefix': self.img_prefix, 'img_id': idx}

    def sample_id(self, idx: int) -> int:
        """Result img_id = dataset index (what evaluate() expects back)."""
        return idx

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        results = self.pre_pipeline(idx)
        if not self.test_mode:
            results['ann_info'] = self.get_ann_info(idx)
        results = self.pipeline(results)
        if 'gt_masks' in results:  # boxes-only dataset
            results.pop('gt_masks')
        sample = format_sample(results, self.canvases, self.max_gts,
                               self.mask_crop_size)
        sample['img_id'] = np.array(self.sample_id(idx), np.int64)
        return sample

    def evaluate(self, results: List[Dict], metric=('mAP',),
                 iou_thr: float = 0.5,
                 proposal_nums=(100, 300, 1000)) -> Dict[str, float]:
        """VOC mAP / proposal recall over xyxy results (reference
        voc.py:23-76 evaluate, metrics 'mAP' and 'recall')."""
        if isinstance(metric, str):
            metric = [metric]
        # 'bbox' aliases 'mAP' so the generic CLI default (--eval bbox)
        # works; anything else unsupported raises like the reference
        # (voc.py allowed_metrics = ['mAP', 'recall']).
        metric = ['mAP' if m == 'bbox' else m for m in metric]
        bad = [m for m in metric if m not in ('mAP', 'recall')]
        if bad:
            raise KeyError(f'metric {bad} is not supported for VOC-style '
                           "datasets (use 'mAP' or 'recall')")
        det_lists = []
        anns = []
        raw_dets = []
        for res in results:
            idx = int(res['img_id'])
            dets = np.asarray(res['dets'])
            labels = np.asarray(res['labels'])
            valid = np.asarray(res['valid']).astype(bool)
            per_cls = []
            for c in range(len(self.CLASSES)):
                sel = valid & (labels == c)
                per_cls.append(dets[sel])
            det_lists.append(per_cls)
            anns.append(self.get_ann_info(idx))
            if 'recall' in metric:  # only the recall branch consumes these
                d = dets[valid]
                if len(d):
                    d = d[np.argsort(-d[:, 4], kind='mergesort')]
                raw_dets.append(d)
        out: Dict[str, float] = {}
        if 'mAP' in metric:
            mode = ('11points' if getattr(self, 'year', 2012) == 2007
                    else 'area')
            thr = iou_thr if isinstance(iou_thr, float) else float(iou_thr[0])
            mAP, _ = eval_map(det_lists, anns, iou_thr=thr, mode=mode)
            out['mAP'] = mAP
        if 'recall' in metric:
            from ..core import eval_recalls
            thrs = [iou_thr] if isinstance(iou_thr, float) else list(iou_thr)
            gt_bboxes = [a['bboxes'] for a in anns]
            recalls = eval_recalls(gt_bboxes, raw_dets, proposal_nums, thrs)
            for i, num in enumerate(proposal_nums):
                for j, thr in enumerate(thrs):
                    out[f'recall@{num}@{thr}'] = float(recalls[i, j])
            if recalls.shape[1] > 1:
                ar = recalls.mean(axis=1)
                for i, num in enumerate(proposal_nums):
                    out[f'AR@{num}'] = float(ar[i])
        return out


@DATASETS.register_module()
class VOCDataset(XMLDataset):
    CLASSES = VOC_CLASSES

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.year = 2007 if 'VOC2007' in self.img_prefix else 2012


@DATASETS.register_module()
class WIDERFaceDataset(XMLDataset):
    CLASSES = ('face',)
