"""LVIS / Cityscapes / wrapper dataset tests on synthetic annotations."""

import json
import os

import numpy as np
import pytest

from dynamask_tpu.data import (LVISV1Dataset, CityscapesDataset,
                               RepeatDataset, ClassBalancedDataset,
                               build_dataset)


PIPE = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='Resize', img_scale=(160, 128), keep_ratio=True),
    dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=True),
    dict(type='Pad', size_divisor=32),
]


def make_lvis_json(tmp_path, num_imgs=4):
    import cv2
    rng = np.random.RandomState(0)
    img_dir = tmp_path / 'imgs'
    img_dir.mkdir(exist_ok=True)
    images, anns = [], []
    cats = [{'id': 1, 'name': 'aardvark', 'frequency': 'r',
             'image_count': 2},
            {'id': 2, 'name': 'zebra_crossing', 'frequency': 'f',
             'image_count': 100}]
    aid = 0
    for i in range(num_imgs):
        h, w = 100, 140
        cv2.imwrite(str(img_dir / f'{i}.jpg'),
                    rng.randint(0, 255, (h, w, 3)).astype(np.uint8))
        images.append({'id': i + 1, 'file_name': f'{i}.jpg', 'width': w,
                       'height': h, 'neg_category_ids': [2] if i == 0 else [],
                       'not_exhaustive_category_ids': []})
        for _ in range(2):
            aid += 1
            x, y = rng.randint(0, 80), rng.randint(0, 60)
            anns.append({'id': aid, 'image_id': i + 1,
                         'category_id': int(rng.choice([1, 2])),
                         'bbox': [x, y, 30, 25], 'area': 750.0,
                         'segmentation': [[x, y, x + 30, y, x + 30, y + 25,
                                           x, y + 25]]})
    f = tmp_path / 'lvis.json'
    f.write_text(json.dumps({'images': images, 'annotations': anns,
                             'categories': cats}))
    return str(f), str(img_dir)


class TestLVIS:
    def test_classes_from_json_and_eval(self, tmp_path):
        ann, img_dir = make_lvis_json(tmp_path)
        ds = LVISV1Dataset(ann_file=ann, img_prefix=img_dir, pipeline=PIPE,
                           canvases=[(128, 160)], max_gts=8,
                           mask_crop_size=32)
        assert ds.CLASSES == ('aardvark', 'zebra_crossing')
        sample = ds[0]
        assert sample['gt_boxes'].shape == (8, 4)

        # gt-as-predictions -> perfect AP including frequency bands
        results = []
        for idx in range(len(ds)):
            a = ds.get_ann_info(idx)
            n = len(a['bboxes'])
            results.append({
                'img_id': ds.img_infos[idx]['id'],
                'dets': np.concatenate([a['bboxes'],
                                        np.full((n, 1), 0.9, np.float32)], 1),
                'labels': a['labels'], 'valid': np.ones(n, bool)})
        stats = ds.evaluate(results, metric=['bbox'])
        assert stats['bbox_mAP'] == pytest.approx(1.0)
        assert stats['bbox_mAP_r'] == pytest.approx(1.0)
        assert stats['bbox_mAP_f'] == pytest.approx(1.0)


class TestCityscapes:
    def test_build_and_txt(self, tmp_path):
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_data import make_synthetic_coco
        ann, img_dir = make_synthetic_coco(tmp_path)
        # synthetic categories are person/car — both cityscapes classes
        ds = CityscapesDataset(ann_file=ann, img_prefix=img_dir,
                               pipeline=PIPE, canvases=[(128, 160),
                                                        (160, 128)],
                               max_gts=8, mask_crop_size=32)
        assert 'person' in ds.CLASSES and 'car' in ds.CLASSES
        res = [{'img_id': ds.img_infos[0]['id'],
                'dets': np.array([[5, 5, 50, 50, 0.8]], np.float32),
                'labels': np.array([0]), 'valid': np.ones(1, bool),
                'masks': [np.ones((100, 100), np.uint8)]}]
        files = ds.results2txt(res, str(tmp_path / 'txt'))
        assert len(files) == 1
        content = open(files[0]).read()
        assert '24' in content  # person label id


class TestWrappers:
    def test_repeat(self, tmp_path):
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_data import make_synthetic_coco
        ann, img_dir = make_synthetic_coco(tmp_path)
        cfg = dict(type='RepeatDataset', times=3,
                   dataset=dict(type='CocoDataset', ann_file=ann,
                                img_prefix=img_dir, pipeline=PIPE,
                                canvases=[(128, 160), (160, 128)],
                                max_gts=8, mask_crop_size=32))
        ds = build_dataset(cfg)
        assert len(ds) == 18
        assert ds.flags.shape == (18,)

    def test_class_balanced(self, tmp_path):
        ann, img_dir = make_lvis_json(tmp_path)
        base = LVISV1Dataset(ann_file=ann, img_prefix=img_dir, pipeline=PIPE,
                             canvases=[(128, 160)], max_gts=8,
                             mask_crop_size=32)
        ds = ClassBalancedDataset(base, oversample_thr=0.9)
        assert len(ds) >= len(base)
        _ = ds[0]


class TestVOC:
    def _make_voc(self, tmp_path, n=3):
        import cv2
        rng = np.random.RandomState(0)
        (tmp_path / 'JPEGImages').mkdir()
        (tmp_path / 'Annotations').mkdir()
        ids = []
        for i in range(n):
            img_id = f'{i:06d}'
            ids.append(img_id)
            img = rng.randint(0, 255, (100, 120, 3), np.uint8)
            cv2.imwrite(str(tmp_path / 'JPEGImages' / f'{img_id}.jpg'), img)
            objs = []
            for _ in range(2):
                x, y = rng.randint(1, 60, 2)
                objs.append(f'''<object><name>car</name><difficult>0</difficult>
                  <bndbox><xmin>{x}</xmin><ymin>{y}</ymin>
                  <xmax>{x + 30}</xmax><ymax>{y + 25}</ymax></bndbox>
                  </object>''')
            xml = (f'<annotation><size><width>120</width>'
                   f'<height>100</height></size>{"".join(objs)}</annotation>')
            (tmp_path / 'Annotations' / f'{img_id}.xml').write_text(xml)
        split = tmp_path / 'trainval.txt'
        split.write_text('\n'.join(ids))
        return str(split)

    def test_map_and_recall_metrics(self, tmp_path):
        from dynamask_tpu.data.voc import VOCDataset
        split = self._make_voc(tmp_path)
        ds = VOCDataset(ann_file=split, img_prefix=str(tmp_path),
                        pipeline=[dict(type='LoadImageFromFile')],
                        test_mode=True)
        results = []
        for idx in range(len(ds)):
            ann = ds.get_ann_info(idx)
            m = len(ann['bboxes'])
            dets = np.concatenate(
                [ann['bboxes'], 0.9 * np.ones((m, 1), np.float32)], 1)
            results.append({'img_id': idx, 'dets': dets,
                            'labels': ann['labels'],
                            'valid': np.ones(m, bool)})
        out = ds.evaluate(results, metric=['mAP', 'recall'],
                          iou_thr=[0.5, 0.75])
        # reference voc.py:23-76 surface: mAP + recall@N@thr + AR@N rows
        assert out['mAP'] == pytest.approx(1.0, abs=1e-6)
        assert out['recall@100@0.5'] == pytest.approx(1.0)
        assert out['AR@100'] == pytest.approx(1.0)
        # VOC2012 mode default (no VOC2007 in prefix)
        assert ds.year == 2012

    def test_bbox_aliases_map_and_bad_metric_raises(self, tmp_path):
        """CLI default --eval bbox must work on VOC (aliased to mAP);
        unsupported metrics raise like the reference (allowed_metrics)."""
        from dynamask_tpu.data.voc import VOCDataset
        split = self._make_voc(tmp_path)
        ds = VOCDataset(ann_file=split, img_prefix=str(tmp_path),
                        pipeline=[dict(type='LoadImageFromFile')],
                        test_mode=True)
        ann = ds.get_ann_info(0)
        m = len(ann['bboxes'])
        res = [{'img_id': 0,
                'dets': np.concatenate(
                    [ann['bboxes'], np.ones((m, 1), np.float32)], 1),
                'labels': ann['labels'], 'valid': np.ones(m, bool)}]
        out = ds.evaluate(res, metric=['bbox'])
        assert 'mAP' in out
        with pytest.raises(KeyError):
            ds.evaluate(res, metric=['segm'])

    def test_sample_id_contract(self, tmp_path):
        """sample_id(idx) must equal the img_id the loader emits, per
        dataset family (dataset index for XML/custom, COCO id for coco) —
        the id aug_device_test/_render_results key on."""
        import sys
        sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
        from test_data import make_synthetic_coco
        from dynamask_tpu.data.voc import VOCDataset
        from dynamask_tpu.data import build_dataset

        split = self._make_voc(tmp_path)
        voc = VOCDataset(ann_file=split, img_prefix=str(tmp_path),
                         pipeline=[dict(type='LoadImageFromFile')],
                         test_mode=True)
        assert voc.sample_id(1) == 1
        assert voc.pre_pipeline(1)['img_id'] == 1

        ann_file, img_dir = make_synthetic_coco(tmp_path, num_imgs=2)
        coco = build_dataset(dict(
            type='CocoDataset', ann_file=ann_file, img_prefix=img_dir,
            pipeline=[dict(type='LoadImageFromFile')], test_mode=True))
        for i in range(len(coco)):
            info_id = int(coco.img_infos[i]['id'])
            assert coco.sample_id(i) == info_id
            assert coco.pre_pipeline(i)['img_id'] == info_id
