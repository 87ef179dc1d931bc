#!/usr/bin/env python
"""Host input-pipeline benchmark: decode -> transform -> target-encode ->
collate throughput, vs the train step's demand.

The bf16 train step consumes 4 imgs / ~1.18 s ≈ 3.4 img/s per chip
(tools/benchmark_train.py); a v5e-8 pod therefore demands ~27 img/s from
its hosts. This tool measures what the loader actually delivers at train
settings (COCO-scale JPEGs, (1333, 800) resize, flip/normalize/pad,
mask-crop target encoding — reference equivalent of the DataLoader worker
path, mmdet/datasets/builder.py:69-130).

    python tools/benchmark_input.py [--num-imgs 64] [--img-size 640 480]
        [--workers 1 2 4 8] [--batch 4] [--step-img-s 3.39]

Prints one JSON line per worker count with imgs/s and the chip-feed ratio.
"""

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def make_cocoish_dataset(tmp: Path, num_imgs: int, w: int, h: int):
    """Synthetic COCO-scale JPEGs + polygon annotations (the tiny test-suite
    set is 160x120 — unrepresentative of decode/resize cost)."""
    import cv2
    import numpy as np
    rng = np.random.RandomState(0)
    images, annotations = [], []
    img_dir = tmp / 'imgs'
    img_dir.mkdir(exist_ok=True)
    ann_id = 0
    for i in range(num_imgs):
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        name = f'{i:06d}.jpg'
        cv2.imwrite(str(img_dir / name), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
        images.append({'id': i + 1, 'file_name': name,
                       'width': w, 'height': h})
        for _ in range(8):           # COCO averages ~7 instances/img
            x = rng.randint(0, w - 80)
            y = rng.randint(0, h - 80)
            bw, bh = rng.randint(30, 80, 2)
            ann_id += 1
            poly = [x, y, x + bw, y, x + bw, y + bh, x, y + bh]
            annotations.append({
                'id': ann_id, 'image_id': i + 1, 'category_id': 1,
                'bbox': [float(x), float(y), float(bw), float(bh)],
                'area': float(bw * bh), 'iscrowd': 0,
                'segmentation': [[float(v) for v in poly]]})
    ann_file = tmp / 'ann.json'
    ann_file.write_text(json.dumps({
        'images': images, 'annotations': annotations,
        'categories': [{'id': 1, 'name': 'thing'}]}))
    return str(ann_file), str(img_dir)


TRAIN_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375], to_rgb=True),
    dict(type='Pad', size_divisor=32),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--num-imgs', type=int, default=64)
    p.add_argument('--img-size', type=int, nargs=2, default=[640, 480])
    p.add_argument('--workers', type=int, nargs='+', default=[1, 2, 4, 8])
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--step-img-s', type=float, default=3.39,
                   help='train-step demand in img/s/chip (bf16 measured)')
    p.add_argument('--epochs', type=int, default=2,
                   help='timed passes over the set (first pass warms caches)')
    args = p.parse_args()

    from dynamask_tpu.data import build_dataset, build_dataloader

    tmp = Path(tempfile.mkdtemp(prefix='dynamask_input_bench_'))
    w, h = args.img_size
    ann_file, img_dir = make_cocoish_dataset(tmp, args.num_imgs, w, h)
    dataset = build_dataset(dict(
        type='CocoDataset', ann_file=ann_file, img_prefix=img_dir,
        pipeline=TRAIN_PIPELINE,
        canvases=[(800, 1344), (1344, 800)],
        max_gts=100, mask_crop_size=128, classes=['thing']))

    for nw in args.workers:
        loader = build_dataloader(dataset, samples_per_gpu=args.batch,
                                  workers_per_gpu=nw, shuffle=True,
                                  drop_last=True)
        # warmup pass (OS page cache, lazy imports)
        for _ in loader:
            pass
        n = 0
        t0 = time.time()
        for _ in range(args.epochs):
            loader.set_epoch(n)
            for batch in loader:
                n += batch['image'].shape[0]
        dt = time.time() - t0
        rate = n / dt
        print(json.dumps({
            'workers': nw, 'img_s': round(rate, 2),
            'chips_fed': round(rate / args.step_img_s, 2),
            'demand_1chip': args.step_img_s,
            'demand_8chip': round(args.step_img_s * 8, 1),
            'imgs': n, 'wall_s': round(dt, 1),
        }), flush=True)


if __name__ == '__main__':
    main()
