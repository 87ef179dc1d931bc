#!/usr/bin/env python
"""Visualize dataset samples with their GT annotations
(reference: tools/browse_dataset.py).

Usage:
    python tools/browse_dataset.py <config> --output-dir vis/ --num 20
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))


def main():
    p = argparse.ArgumentParser(description='Browse a dataset')
    p.add_argument('config')
    p.add_argument('--split', default='train', choices=['train', 'val',
                                                        'test'])
    p.add_argument('--output-dir', default='work_dirs/browse')
    p.add_argument('--num', type=int, default=20)
    args = p.parse_args()

    import cv2
    from dynamask_tpu.utils.config import Config
    from dynamask_tpu.data import build_dataset

    cfg = Config.fromfile(args.config)
    dcfg = dict(cfg.data[args.split])
    dataset = build_dataset(dcfg, default_args=dict(
        max_gts=cfg.data.get('max_gts', 100),
        mask_crop_size=cfg.data.get('mask_crop_size', 128)))
    os.makedirs(args.output_dir, exist_ok=True)

    rng = np.random.RandomState(0)
    n = min(args.num, len(dataset))
    for i in range(n):
        sample = dataset[i]
        img = np.asarray(sample['image'])
        # un-normalize for display if the pipeline normalized
        if img.dtype != np.uint8:
            img = img - img.min()
            img = (255 * img / max(img.max(), 1e-6)).astype(np.uint8)
        img = np.ascontiguousarray(img[..., ::-1])  # RGB -> BGR for cv2
        boxes = np.asarray(sample.get('gt_boxes', np.zeros((0, 4))))
        valid = np.asarray(sample.get('gt_valid',
                                      np.ones(len(boxes), bool)))
        labels = np.asarray(sample.get('gt_labels',
                                       np.zeros(len(boxes), np.int64)))
        classes = getattr(dataset, 'CLASSES', None)
        for b, v, l in zip(boxes, valid, labels):
            if not v:
                continue
            color = tuple(int(c) for c in rng.randint(64, 255, 3))
            x1, y1, x2, y2 = (int(round(c)) for c in b)
            cv2.rectangle(img, (x1, y1), (x2, y2), color, 2)
            name = classes[int(l)] if classes else str(int(l))
            cv2.putText(img, name, (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
        out = osp.join(args.output_dir, f'{i:05d}.jpg')
        cv2.imwrite(out, img)
        print(out)


if __name__ == '__main__':
    main()
