"""Cityscapes->COCO converter + large-canvas eval-path checks."""

import json
import os
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))


def _make_fake_cityscapes(root):
    """2 images in one city with instanceIds encoding: car (26) instances
    >=1000, one crowd region (<1000), one stuff pixel region."""
    import cv2
    for split in ('train', 'val', 'test'):
        img_dir = osp.join(root, 'leftImg8bit', split, 'mycity')
        gt_dir = osp.join(root, 'gtFine', split, 'mycity')
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(gt_dir, exist_ok=True)
        for i in range(2):
            h, w = 128, 256
            img = np.zeros((h, w, 3), np.uint8)
            inst = np.zeros((h, w), np.uint16)
            inst[:, :] = 7  # stuff (road)
            inst[10:40, 10:60] = 26000 + i      # car instance 0
            inst[50:90, 80:160] = 26001 + i     # car instance 1
            inst[100:120, 200:240] = 24         # person crowd region
            stem = f'mycity_00000{i}_000019'
            cv2.imwrite(osp.join(img_dir, f'{stem}_leftImg8bit.png'), img)
            cv2.imwrite(osp.join(gt_dir, f'{stem}_gtFine_instanceIds.png'),
                        inst)
            cv2.imwrite(osp.join(gt_dir, f'{stem}_gtFine_labelIds.png'),
                        (inst % 256).astype(np.uint8))


class TestConverter:
    def test_convert_roundtrip(self, tmp_path):
        from tools.convert_datasets.cityscapes import (collect_files,
                                                       load_img_info,
                                                       cvt_annotations)
        root = str(tmp_path)
        _make_fake_cityscapes(root)
        files = collect_files(osp.join(root, 'leftImg8bit', 'train'),
                              osp.join(root, 'gtFine', 'train'))
        assert len(files) == 2
        infos = [load_img_info(f) for f in files]
        out = cvt_annotations(infos, str(tmp_path / 'train.json'))

        assert len(out['images']) == 2
        assert {c['name'] for c in out['categories']} == {
            'person', 'rider', 'car', 'truck', 'bus', 'train',
            'motorcycle', 'bicycle'}
        anns = out['annotations']
        # per image: 2 car instances + 1 person crowd
        assert len(anns) == 6
        crowd = [a for a in anns if a['iscrowd']]
        assert len(crowd) == 2 and all(
            a['category_id'] == 24 for a in crowd)
        cars = [a for a in anns if a['category_id'] == 26]
        assert len(cars) == 4
        a = cars[0]
        assert a['bbox'] == [10, 10, 50, 30]
        assert a['area'] == 50 * 30

        # RLE decodes back to the exact mask
        from dynamask_tpu.data.mask_codec import decode_rle
        m = decode_rle(a['segmentation'])
        ref = np.zeros((128, 256), np.uint8)
        ref[10:40, 10:60] = 1
        np.testing.assert_array_equal(m, ref)

        # the converted json loads into CityscapesDataset
        from dynamask_tpu.data.cityscapes import CityscapesDataset
        ds = CityscapesDataset(
            ann_file=str(tmp_path / 'train.json'),
            img_prefix=osp.join(root, 'leftImg8bit', 'train'),
            pipeline=[], test_mode=True)
        assert len(ds) == 2
        assert ds.img_infos[0]['height'] == 128


class TestCanvasDerivation:
    def test_canvas_from_dataset(self):
        from dynamask_tpu.apis.test import dataset_mask_canvas

        class DS:
            img_infos = [{'height': 1024, 'width': 2048},
                         {'height': 1000, 'width': 2000}]

        assert dataset_mask_canvas(DS()) == (1024, 2048)

        class DS2:
            img_infos = [{'height': 427, 'width': 640}]

        assert dataset_mask_canvas(DS2()) == (448, 640)

        class Empty:
            img_infos = []

        assert dataset_mask_canvas(Empty()) == (640, 640)
