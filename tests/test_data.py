"""Data layer tests: RLE codec round-trips, COCO evaluation sanity, pipeline
transforms, synthetic dataset end-to-end (mirrors the reference's
tests/test_data strategy)."""

import json
import os

import numpy as np
import pytest

from dynamask_tpu.data import (encode_mask, decode_rle, mask_to_rle_counts,
                               rle_counts_to_mask, rle_counts_to_string,
                               rle_string_to_counts, polygons_to_mask,
                               CocoEvaluator, CocoDataset, build_dataloader,
                               format_sample, canvas_for, rle_iou)


class TestRLECodec:
    def test_counts_roundtrip(self):
        rng = np.random.RandomState(0)
        for _ in range(10):
            m = (rng.uniform(0, 1, (23, 31)) > 0.5).astype(np.uint8)
            counts = mask_to_rle_counts(m)
            back = rle_counts_to_mask(counts, 23, 31)
            np.testing.assert_array_equal(m, back)

    def test_string_roundtrip(self):
        rng = np.random.RandomState(1)
        for _ in range(10):
            m = (rng.uniform(0, 1, (37, 19)) > 0.7).astype(np.uint8)
            rle = encode_mask(m)
            np.testing.assert_array_equal(decode_rle(rle), m)

    def test_known_encoding(self):
        # all-zeros 2x2 mask: counts [4] -> string varint of 4 = chr(4+48)='4'
        m = np.zeros((2, 2), np.uint8)
        rle = encode_mask(m)
        assert rle['counts'] == '4'
        # leading one: counts [0, 4]
        m = np.ones((2, 2), np.uint8)
        counts = mask_to_rle_counts(m)
        np.testing.assert_array_equal(counts, [0, 4])

    def test_string_negative_delta(self):
        counts = [10, 200, 3, 180, 5]  # forces negative 2nd-order deltas
        s = rle_counts_to_string(counts)
        np.testing.assert_array_equal(rle_string_to_counts(s), counts)

    def test_polygon_square(self):
        poly = [[2, 2, 8, 2, 8, 8, 2, 8]]
        m = polygons_to_mask(poly, 10, 10)
        assert m[5, 5] == 1 and m[0, 0] == 0
        assert 36 <= m.sum() <= 49  # ~6x6..7x7 square

    def test_rle_iou_crowd(self):
        a = np.zeros((10, 10), np.uint8); a[:5] = 1
        b = np.zeros((10, 10), np.uint8); b[:10] = 1
        ra, rb = encode_mask(a), encode_mask(b)
        iou = rle_iou([ra], [rb], [False])
        np.testing.assert_allclose(iou[0, 0], 0.5)
        iof = rle_iou([ra], [rb], [True])
        np.testing.assert_allclose(iof[0, 0], 1.0)  # det fully inside crowd


class TestCocoEval:
    def _gt(self, img_id, cat, box, crowd=0, ann_id=[0]):
        ann_id[0] += 1
        return {'id': ann_id[0], 'image_id': img_id, 'category_id': cat,
                'bbox': box, 'area': box[2] * box[3], 'iscrowd': crowd}

    def test_perfect_predictions(self):
        gts = [self._gt(1, 1, [10, 10, 50, 50]),
               self._gt(1, 2, [100, 100, 40, 40]),
               self._gt(2, 1, [5, 5, 120, 120])]
        dets = [{'image_id': g['image_id'], 'category_id': g['category_id'],
                 'bbox': list(g['bbox']), 'score': 0.9} for g in gts]
        ev = CocoEvaluator(gts, [1, 2], [1, 2], 'bbox')
        stats = ev.evaluate(dets)
        assert stats['mAP'] == pytest.approx(1.0)
        assert stats['AR@100'] == pytest.approx(1.0)

    def test_no_predictions(self):
        gts = [self._gt(1, 1, [10, 10, 50, 50])]
        ev = CocoEvaluator(gts, [1], [1], 'bbox')
        stats = ev.evaluate([])
        assert stats['mAP'] == pytest.approx(0.0)

    def test_half_iou_matching(self):
        # det IoU with gt = 0.5 -> matches at thr .5 but not above
        gts = [self._gt(1, 1, [0, 0, 100, 100])]
        dets = [{'image_id': 1, 'category_id': 1,
                 'bbox': [0, 0, 100, 50.0 / 0.75], 'score': 0.9}]
        # iou = (100*66.7 inter=100*66.7? compute: det [0,0,100,66.67],
        # inter=100*66.67, union=100*100 -> iou=0.667
        ev = CocoEvaluator(gts, [1], [1], 'bbox')
        stats = ev.evaluate(dets)
        # matches for thr .5..=.65 (2 of 10 thresholds: .5,.55,.6,.65)
        assert stats['mAP_50'] == pytest.approx(1.0)
        assert 0.3 < stats['mAP'] < 0.5

    def test_crowd_not_penalized(self):
        gts = [self._gt(1, 1, [0, 0, 50, 50]),
               self._gt(1, 1, [200, 200, 100, 100], crowd=1)]
        dets = [{'image_id': 1, 'category_id': 1, 'bbox': [0, 0, 50, 50],
                 'score': 0.9},
                {'image_id': 1, 'category_id': 1, 'bbox': [210, 210, 80, 80],
                 'score': 0.8}]  # inside crowd -> ignored, not FP
        ev = CocoEvaluator(gts, [1], [1], 'bbox')
        stats = ev.evaluate(dets)
        assert stats['mAP'] == pytest.approx(1.0)

    def test_false_positive_halves_precision(self):
        gts = [self._gt(1, 1, [0, 0, 50, 50])]
        dets = [{'image_id': 1, 'category_id': 1, 'bbox': [0, 0, 50, 50],
                 'score': 0.9},
                {'image_id': 1, 'category_id': 1, 'bbox': [300, 300, 50, 50],
                 'score': 0.95}]  # higher-scored FP
        ev = CocoEvaluator(gts, [1], [1], 'bbox')
        stats = ev.evaluate(dets)
        assert stats['mAP'] == pytest.approx(0.5, abs=0.01)


def make_synthetic_coco(tmp_path, num_imgs=6):
    rng = np.random.RandomState(0)
    import cv2
    images, annotations = [], []
    categories = [{'id': 1, 'name': 'person'}, {'id': 3, 'name': 'car'}]
    img_dir = tmp_path / 'imgs'
    img_dir.mkdir(exist_ok=True)
    ann_id = 0
    for i in range(num_imgs):
        h, w = (120, 160) if i % 2 == 0 else (160, 120)
        img = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
        name = f'{i:04d}.jpg'
        cv2.imwrite(str(img_dir / name), img)
        images.append({'id': i + 1, 'file_name': name,
                       'width': w, 'height': h})
        for _ in range(3):
            x = rng.randint(0, w - 40)
            y = rng.randint(0, h - 40)
            bw, bh = rng.randint(15, 40, 2)
            ann_id += 1
            poly = [x + 2, y + 2, x + bw - 2, y + 2, x + bw - 2, y + bh - 2,
                    x + 2, y + bh - 2]
            annotations.append({
                'id': ann_id, 'image_id': i + 1,
                'category_id': int(rng.choice([1, 3])),
                'bbox': [float(x), float(y), float(bw), float(bh)],
                'area': float(bw * bh), 'iscrowd': 0,
                'segmentation': [[float(v) for v in poly]]})
    ann_file = tmp_path / 'ann.json'
    ann_file.write_text(json.dumps({
        'images': images, 'annotations': annotations,
        'categories': categories}))
    return str(ann_file), str(img_dir)


TRAIN_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='Resize', img_scale=(160, 128), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375], to_rgb=True),
    dict(type='Pad', size_divisor=32),
]


class TestCocoDataset:
    def test_load_and_format(self, tmp_path):
        ann_file, img_dir = make_synthetic_coco(tmp_path)
        ds = CocoDataset(ann_file=ann_file, img_prefix=img_dir,
                         pipeline=TRAIN_PIPELINE,
                         canvases=[(128, 160), (160, 128)],
                         max_gts=10, mask_crop_size=32)
        assert len(ds) == 6
        sample = ds[0]
        assert sample['image'].shape in ((128, 160, 3), (160, 128, 3))
        assert sample['gt_boxes'].shape == (10, 4)
        assert sample['gt_crops'].shape == (10, 32, 32)
        assert sample['gt_valid'].sum() == 3
        # class labels remapped contiguously
        assert set(np.unique(sample['gt_labels'][:3])) <= {0, 1}
        # crops contain the rasterized polygon (mostly ones inside the box)
        v = sample['gt_crops'][0]
        assert v.sum() > 0.5 * v.size

    def test_loader_batches(self, tmp_path):
        ann_file, img_dir = make_synthetic_coco(tmp_path)
        ds = CocoDataset(ann_file=ann_file, img_prefix=img_dir,
                         pipeline=TRAIN_PIPELINE,
                         canvases=[(128, 160), (160, 128)],
                         max_gts=10, mask_crop_size=32)
        loader = build_dataloader(ds, samples_per_gpu=2, workers_per_gpu=2,
                                  seed=0)
        batches = list(iter(loader))
        assert len(batches) == len(loader) > 0
        for b in batches:
            assert b['image'].shape[0] == 2
            # same-orientation grouping => a batch has ONE canvas
            assert b['image'].ndim == 4

    def test_evaluate_with_gt_as_predictions(self, tmp_path):
        ann_file, img_dir = make_synthetic_coco(tmp_path)
        ds = CocoDataset(ann_file=ann_file, img_prefix=img_dir,
                         pipeline=TRAIN_PIPELINE, test_mode=True,
                         canvases=[(128, 160), (160, 128)])
        results = []
        for idx in range(len(ds)):
            ann = ds.get_ann_info(idx)
            n = len(ann['bboxes'])
            dets = np.concatenate(
                [ann['bboxes'], 0.9 * np.ones((n, 1), np.float32)], 1)
            results.append({
                'img_id': ds.img_infos[idx]['id'],
                'dets': dets, 'labels': ann['labels'],
                'valid': np.ones(n, bool)})
        stats = ds.evaluate(results, metric=['bbox'])
        assert stats['bbox_mAP'] == pytest.approx(1.0)

    def test_proposal_metrics(self, tmp_path):
        """'proposal' (class-agnostic COCO AR) and 'proposal_fast' (direct
        IoU recall, reference coco.py:313-335) both hit 1.0 on GT-as-dets."""
        ann_file, img_dir = make_synthetic_coco(tmp_path)
        ds = CocoDataset(ann_file=ann_file, img_prefix=img_dir,
                         pipeline=TRAIN_PIPELINE, test_mode=True,
                         canvases=[(128, 160), (160, 128)])
        results = []
        for idx in range(len(ds)):
            ann = ds.get_ann_info(idx)
            n = len(ann['bboxes'])
            dets = np.concatenate(
                [ann['bboxes'], 0.9 * np.ones((n, 1), np.float32)], 1)
            results.append({
                'img_id': ds.img_infos[idx]['id'],
                'dets': dets, 'labels': ann['labels'],
                'valid': np.ones(n, bool)})
        stats = ds.evaluate(results, metric=['proposal', 'proposal_fast'])
        for k in ('AR@100', 'AR@300', 'AR@1000'):
            assert stats[k] == pytest.approx(1.0), k
        assert f'AR_l@1000' in stats
        # degrade: drop every det for half the images -> recall < 1
        half = [dict(r, dets=r['dets'][:0], labels=r['labels'][:0],
                     valid=r['valid'][:0]) if i % 2 else r
                for i, r in enumerate(results)]
        worse = ds.evaluate(half, metric=['proposal_fast'])
        assert worse['AR@100'] < 1.0

    def test_proposal_fast_uses_proposals_key(self, tmp_path):
        ann_file, img_dir = make_synthetic_coco(tmp_path)
        ds = CocoDataset(ann_file=ann_file, img_prefix=img_dir,
                         pipeline=TRAIN_PIPELINE, test_mode=True,
                         canvases=[(128, 160), (160, 128)])
        results = []
        for idx in range(len(ds)):
            ann = ds.get_ann_info(idx)
            n = len(ann['bboxes'])
            props = np.concatenate(
                [ann['bboxes'], np.ones((n, 1), np.float32)], 1)
            results.append({'img_id': ds.img_infos[idx]['id'],
                            'dets': np.zeros((0, 5), np.float32),
                            'labels': np.zeros((0,), np.int64),
                            'valid': np.zeros((0,), bool),
                            'proposals': props})
        ar = ds.fast_eval_recall(results, (10,))
        assert ar[0] == pytest.approx(1.0)


def test_canvas_for():
    assert canvas_for(100, 150, [(128, 160), (160, 128)]) == (128, 160)
    assert canvas_for(800, 1333, [(800, 1344), (1344, 800)]) == (800, 1344)
    assert canvas_for(1333, 800, [(800, 1344), (1344, 800)]) == (1344, 800)
    with pytest.raises(ValueError):
        canvas_for(2000, 2000, [(800, 1344)])


class TestResizeModes:
    def test_keep_ratio_false_exact_size(self):
        """reference Resize keep_ratio=False (transforms.py:25): resize to
        the exact img_scale; scale_factor reflects per-axis stretch."""
        from dynamask_tpu.data.transforms import Resize
        img = np.zeros((100, 50, 3), np.uint8)
        r = Resize(img_scale=(64, 32), keep_ratio=False)
        out = r({'img': img,
                 'gt_bboxes': np.asarray([[10., 20., 30., 40.]], np.float32),
                 'gt_bboxes_ignore': np.zeros((0, 4), np.float32)})
        assert out['img'].shape[:2] == (32, 64)
        np.testing.assert_allclose(out['scale_factor'],
                                   [64 / 50, 32 / 100, 64 / 50, 32 / 100])
        np.testing.assert_allclose(
            out['gt_bboxes'][0],
            [10 * 64 / 50, 20 * 32 / 100, 30 * 64 / 50, 40 * 32 / 100])

    def test_keep_ratio_true_fits_long_short(self):
        from dynamask_tpu.data.transforms import Resize
        img = np.zeros((100, 50, 3), np.uint8)
        r = Resize(img_scale=(120, 60), keep_ratio=True)
        out = r({'img': img})
        h, w = out['img'].shape[:2]
        assert max(h, w) <= 120 and min(h, w) <= 60
        assert h == 120 and w == 60


class TestAutoAugment:
    def test_picks_policy_and_applies(self):
        from dynamask_tpu.data.transforms import AutoAugment
        img = np.zeros((60, 80, 3), np.uint8)
        aug = AutoAugment(policies=[
            [dict(type='Resize', img_scale=(40, 30), keep_ratio=False)],
            [dict(type='Resize', img_scale=(20, 10), keep_ratio=False)],
        ])
        seen = set()
        for seed in range(10):
            out = aug({'img': img.copy(),
                       '_rng': np.random.RandomState(seed)})
            seen.add(out['img'].shape[:2])
        assert seen <= {(30, 40), (10, 20)}
        assert len(seen) == 2  # both policies get picked across seeds

    def test_instaboost_missing_dep_message(self):
        from dynamask_tpu.data.transforms import InstaBoost
        with pytest.raises(ImportError, match='instaboostfast'):
            InstaBoost()


class TestErrorAnalysis:
    def test_gt_as_predictions_decomposition(self, tmp_path):
        """With perfect predictions the decomposition is all-localization:
        C75 = 1 and the BG+FN gap is 0."""
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_data import make_synthetic_coco
        from dynamask_tpu.data import build_dataset
        from tools.coco_error_analysis import _ap_for

        ann_file, img_dir = make_synthetic_coco(tmp_path, num_imgs=3)
        ds = build_dataset(dict(type='CocoDataset', ann_file=ann_file,
                                img_prefix=img_dir, pipeline=[],
                                classes=['person', 'car']),
                           default_args=dict(test_mode=True))
        gt_anns = [a for anns in ds.coco.img_anns.values() for a in anns]
        dets = [dict(a, score=0.9) for a in gt_anns
                if not a.get('iscrowd', 0)]
        img_ids = list(ds.coco.img_ids)
        sizes = {i['id']: (i['height'], i['width']) for i in ds.img_infos}
        c75 = _ap_for(gt_anns, img_ids, ds.cat_ids, dets, 0.75, 'bbox',
                      sizes)
        ag = _ap_for([dict(g, category_id=1) for g in gt_anns], img_ids,
                     [1], [dict(d, category_id=1) for d in dets], 0.10,
                     'bbox', sizes)
        assert c75 == pytest.approx(1.0, abs=1e-6)
        assert 1.0 - ag == pytest.approx(0.0, abs=1e-6)


class TestCorrupt:
    def test_missing_dep_message(self):
        from dynamask_tpu.data.transforms import Corrupt
        with pytest.raises(ImportError, match='imagecorruptions'):
            Corrupt('gaussian_noise')


class TestPrecomputedProposals:
    """LoadProposals + dataset proposal_file -> static (P, 4) batch keys
    (reference pipelines/loading.py:356 + custom.py load_proposals)."""

    def test_proposals_flow_through_pipeline(self, tmp_path):
        import pickle
        from dynamask_tpu.data.coco import CocoDataset
        ann_file, img_dir = make_synthetic_coco(tmp_path)
        rng = np.random.RandomState(4)
        plist = []
        for _ in range(6):
            n = rng.randint(3, 8)
            x1 = rng.uniform(0, 50, n)
            y1 = rng.uniform(0, 40, n)
            props = np.stack([x1, y1, x1 + rng.uniform(8, 30, n),
                              y1 + rng.uniform(8, 30, n),
                              rng.uniform(0, 1, n)], -1).astype(np.float32)
            plist.append(props)
        pfile = str(tmp_path / 'props.pkl')
        with open(pfile, 'wb') as f:
            pickle.dump(plist, f)

        pipeline = [
            dict(type='LoadImageFromFile'),
            dict(type='LoadProposals', num_max_proposals=5),
            dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
            dict(type='Resize', img_scale=(160, 128), keep_ratio=True),
            dict(type='RandomFlip', flip_ratio=1.0),
            dict(type='Normalize', mean=[123.675, 116.28, 103.53],
                 std=[58.395, 57.12, 57.375], to_rgb=True),
            dict(type='Pad', size_divisor=32),
        ]
        ds = CocoDataset(ann_file=ann_file, img_prefix=img_dir,
                         pipeline=pipeline,
                         canvases=[(128, 160), (160, 128)],
                         max_gts=10, mask_crop_size=32,
                         proposal_file=pfile, max_proposals=8)
        sample = ds[0]
        assert sample['proposals'].shape == (8, 4)
        assert sample['proposal_valid'].shape == (8,)
        k = int(sample['proposal_valid'].sum())
        assert 1 <= k <= 5  # num_max_proposals truncation applied
        props = sample['proposals'][:k]
        # scaled+flipped but still inside the resized image
        assert (props[:, 2] > props[:, 0]).all()
        assert (props[:, 3] > props[:, 1]).all()
        assert props.max() <= 160.0 + 1e-3
        # score column dropped
        assert sample['proposals'].shape[1] == 4


def test_get_classes_dispatcher():
    from dynamask_tpu.core import get_classes, coco_classes
    assert get_classes('coco') == coco_classes()
    assert len(get_classes('voc')) == 20
    assert get_classes('wider_face') == ['face']
    assert len(get_classes('imagenet_det')) == 200
    assert len(get_classes('imagenet_vid')) == 30
    assert len(get_classes('cityscapes')) == 8
    with pytest.raises(ValueError):
        get_classes('nope')
    with pytest.raises(TypeError):
        get_classes(3)


def test_classwise_table(tmp_path, capsys):
    ann_file, img_dir = make_synthetic_coco(tmp_path)
    ds = CocoDataset(ann_file=ann_file, img_prefix=img_dir,
                     pipeline=TRAIN_PIPELINE, test_mode=True,
                     canvases=[(128, 160), (160, 128)])
    results = []
    for idx in range(len(ds)):
        ann = ds.get_ann_info(idx)
        n = len(ann['bboxes'])
        dets = np.concatenate(
            [ann['bboxes'], 0.9 * np.ones((n, 1), np.float32)], 1)
        results.append({'img_id': ds.img_infos[idx]['id'],
                        'dets': dets, 'labels': ann['labels'],
                        'valid': np.ones(n, bool)})
    stats = ds.evaluate(results, metric=['bbox'], classwise=True)
    out = capsys.readouterr().out
    assert 'per-category bbox AP' in out
    assert 'person' in out and 'car' in out
    assert stats['bbox_mAP'] == pytest.approx(1.0)
