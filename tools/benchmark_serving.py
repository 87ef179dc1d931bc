#!/usr/bin/env python
"""Host SERVING-path benchmark: decode -> test transform -> collate, plus
host RLE encoding of pasted masks, vs the chip's inference demand.

tools/benchmark_input.py covers the TRAIN host path; this covers serving
(reference path: mmdet/apis/test.py:15-63 single_gpu_test loop +
pycocotools encode via ``encode_mask_results``):

  * input side: COCO-scale JPEG decode + (1333, 800) keep-ratio resize +
    normalize + pad (the test pipeline — no annotations, no flip);
  * output side: RLE-encode the per-image pasted masks (the native
    ``maskc`` codec, dynamask_tpu/native/maskc.c) at the padded canvas
    size, ~dets-per-image masks each.

Prints one JSON line per stage and a combined line: host img/s vs the
chip's measured inference rate (default 44 img/s, BENCH_r05) and how many
chips one host core can serve.

    python tools/benchmark_serving.py [--num-imgs 48] [--chip-img-s 44]
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

from benchmark_input import make_cocoish_dataset  # noqa: E402

TEST_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='Normalize', mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375], to_rgb=True),
    dict(type='Pad', size_divisor=32),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--num-imgs', type=int, default=48)
    p.add_argument('--img-size', type=int, nargs=2, default=[640, 480])
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--workers', type=int, default=2)
    p.add_argument('--epochs', type=int, default=2)
    p.add_argument('--masks-per-img', type=int, default=100,
                   help='pasted masks RLE-encoded per image (the padded '
                        'det budget; valid dets are typically fewer)')
    p.add_argument('--chip-img-s', type=float, default=44.0,
                   help='measured chip inference rate (BENCH_r05)')
    args = p.parse_args()

    import numpy as np
    from dynamask_tpu.data import build_dataset, build_dataloader
    from dynamask_tpu.data.mask_codec import encode_mask

    tmp = Path(tempfile.mkdtemp(prefix='dynamask_serving_bench_'))
    w, h = args.img_size
    ann_file, img_dir = make_cocoish_dataset(tmp, args.num_imgs, w, h)
    dataset = build_dataset(dict(
        type='CocoDataset', ann_file=ann_file, img_prefix=img_dir,
        pipeline=TEST_PIPELINE, test_mode=True,
        canvases=[(800, 1344), (1344, 800)], classes=['thing']))

    # ---------------------------------------------------- input pipeline
    loader = build_dataloader(dataset, samples_per_gpu=args.batch,
                              workers_per_gpu=args.workers, shuffle=False,
                              drop_last=False)
    for _ in loader:         # warmup (page cache, lazy imports)
        pass
    n = 0
    t0 = time.time()
    for _ in range(args.epochs):
        for batch in loader:
            n += batch['image'].shape[0]
    in_rate = n / (time.time() - t0)
    print(json.dumps({'stage': 'decode+test_transform+collate',
                      'workers': args.workers,
                      'img_s': round(in_rate, 2)}), flush=True)

    # ------------------------------------------------------- RLE encode
    # blob-ish binary masks at the padded canvas (worst-case realistic
    # sizes; runs of real pasted masks are similar or shorter)
    rng = np.random.RandomState(0)
    ch, cw = 800, 1344
    yy, xx = np.mgrid[0:ch, 0:cw]
    masks = []
    for i in range(args.masks_per_img):
        cy, cx = rng.uniform(0.1, 0.9) * ch, rng.uniform(0.1, 0.9) * cw
        r = rng.uniform(20, 180)
        masks.append(((yy - cy) ** 2 + (xx - cx) ** 2 < r * r))
    masks = [np.asfortranarray(m.astype(np.uint8)) for m in masks]
    for m in masks[:4]:
        encode_mask(m)       # warmup
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        for m in masks:
            encode_mask(m)
    enc_s = (time.time() - t0) / (reps * len(masks))
    rle_img_s = 1.0 / (enc_s * args.masks_per_img)
    print(json.dumps({'stage': 'rle_encode',
                      'masks_per_s': round(1.0 / enc_s, 1),
                      'img_s_at_masks_per_img': round(rle_img_s, 2),
                      'masks_per_img': args.masks_per_img}), flush=True)

    # -------------------------------------------------------- combined
    # serial single-core model: 1/rate_total = 1/in + 1/rle
    total = 1.0 / (1.0 / in_rate + 1.0 / rle_img_s)
    print(json.dumps({
        'metric': 'serving host path img/s (decode+transform+collate '
                  '+ RLE of pasted masks, single core model)',
        'value': round(total, 2),
        'chip_demand_img_s': args.chip_img_s,
        'chips_served_per_core': round(total / args.chip_img_s, 2),
        'note': 'input and RLE stages parallelize across cores/processes; '
                'multiply by host cores for fleet sizing',
    }), flush=True)


if __name__ == '__main__':
    main()
