#!/usr/bin/env python
"""Evaluation CLI: ``python test.py <config> <checkpoint> --eval bbox segm``.

Matches the reference CLI surface (reference: root test.py — eval metrics,
result dumping/format-only, show/show-dir rendering, fuse-conv-bn,
multi-device data-parallel eval)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    p = argparse.ArgumentParser(description='Test a detector')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None,
                   help='checkpoint dir (omit for random weights smoke)')
    p.add_argument('--eval', nargs='+', default=['bbox'],
                   choices=['bbox', 'segm', 'proposal', 'proposal_fast',
                            'mAP', 'recall'])
    p.add_argument('--out', help='dump raw results json')
    p.add_argument('--format-only', action='store_true',
                   help='format results (json dump) without evaluating '
                        '(reference test.py --format-only)')
    p.add_argument('--show', action='store_true',
                   help='render detections (headless: requires --show-dir)')
    p.add_argument('--show-dir',
                   help='directory to save rendered detection images')
    p.add_argument('--show-score-thr', type=float, default=0.3)
    p.add_argument('--fuse-conv-bn', action='store_true',
                   help='fold BN statistics into convs before inference '
                        '(reference test.py --fuse-conv-bn)')
    p.add_argument('--devices', type=int, default=1,
                   help='data-parallel eval over N devices '
                        '(reference multi_gpu_test)')
    p.add_argument('--max-images', type=int, default=None)
    p.add_argument('--tta', action='store_true',
                   help='test-time augmentation: flip (+ --tta-scales) '
                        'variants merged via aug_test (reference '
                        'MultiScaleFlipAug + forward_test TTA routing)')
    p.add_argument('--tta-scales', type=int, nargs='+', default=None,
                   help='extra TTA scales as flat h w pairs, e.g. '
                        '--tta-scales 800 1333 1000 1666')
    p.add_argument('--classwise', action='store_true',
                   help='print per-category AP table (reference '
                        'coco.py:496-516 classwise eval option)')
    p.add_argument('--options', nargs='+', default=[])
    return p.parse_args()


def _render_results(args, cfg, dataset, results, classes):
    """--show/--show-dir: draw boxes+masks on the source images."""
    import numpy as np
    import cv2
    from dynamask_tpu.apis.inference import show_result
    out_dir = args.show_dir
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    elif args.show:
        print('warning: headless environment, --show requires --show-dir; '
              'skipping display', file=sys.stderr)
        return
    img_prefix = dict(cfg.data['test']).get('img_prefix', '')
    # key by the same id the test loop emitted (dataset.sample_id: COCO
    # image id for coco-style datasets, dataset index otherwise)
    by_id = {int(dataset.sample_id(i)): info
             for i, info in enumerate(dataset.img_infos)}
    num_classes = len(classes)
    for res in results:
        info = by_id.get(res['img_id'])
        if info is None:
            continue
        path = os.path.join(img_prefix, info['file_name'])
        img = cv2.imread(path)
        if img is None:
            continue
        bbox_results = [[] for _ in range(num_classes)]
        segm_results = [[] for _ in range(num_classes)]
        for d in np.nonzero(np.asarray(res['valid']))[0]:
            cls = int(res['labels'][d])
            bbox_results[cls].append(np.asarray(res['dets'][d]))
            if res.get('masks') is not None:
                segm_results[cls].append(np.asarray(res['masks'][d]))
        result = ([np.stack(b) if b else np.zeros((0, 5))
                   for b in bbox_results], segm_results)
        show_result(img, result, classes, score_thr=args.show_score_thr,
                    out_file=os.path.join(out_dir, info['file_name']))


def main():
    args = parse_args()
    if os.environ.get('JAX_PLATFORMS'):
        # honor the env var even when a sitecustomize pre-registered a
        # different platform plugin (jax.config wins over registration)
        import jax
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
    from dynamask_tpu.utils.config import Config
    from dynamask_tpu.apis.inference import init_detector
    from dynamask_tpu.apis.test import (single_device_test,
                                        multi_device_test, aug_device_test)
    from dynamask_tpu.data import build_dataset

    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_from_options(dict(kv.split('=', 1) for kv in args.options))

    model = init_detector(cfg, args.checkpoint)
    variables = model.variables
    if args.fuse_conv_bn:
        from dynamask_tpu.engine.fuse import fuse_conv_bn
        variables, n = fuse_conv_bn(variables)
        print(f'fused {n} conv+bn pairs')
    dataset = build_dataset(dict(cfg.data['test']),
                            default_args=dict(test_mode=True))
    if args.tta:
        scales = None
        if args.tta_scales:
            assert len(args.tta_scales) % 2 == 0, '--tta-scales wants pairs'
            scales = [tuple(args.tta_scales[i:i + 2])
                      for i in range(0, len(args.tta_scales), 2)]
        results = aug_device_test(model.det, variables, dataset,
                                  scales=scales,
                                  max_images=args.max_images)
    elif args.devices > 1:
        import jax
        results = multi_device_test(model.det, variables, dataset,
                                    devices=jax.devices()[:args.devices],
                                    max_images=args.max_images)
    else:
        results = single_device_test(model.det, variables, dataset,
                                     max_images=args.max_images)
    if args.out or args.format_only:
        if hasattr(dataset, 'results2json'):
            det_json, segm_json = dataset.results2json(results)
            out_path = args.out or 'results.json'
            with open(out_path, 'w') as f:
                json.dump({'bbox': det_json, 'segm': segm_json}, f)
            print(f'results written to {out_path}')
        else:
            print('warning: this dataset has no results2json '
                  '(COCO-format only); skipping --out/--format-only',
                  file=sys.stderr)
    if args.show or args.show_dir:
        classes = getattr(dataset, 'CLASSES',
                          [str(i) for i in range(1000)])
        _render_results(args, cfg, dataset, results, classes)
    if args.format_only:
        return
    eval_kw = {}
    if args.classwise:
        import inspect
        if 'classwise' in inspect.signature(dataset.evaluate).parameters:
            eval_kw['classwise'] = True
        else:
            print('warning: --classwise is not supported by '
                  f'{type(dataset).__name__}.evaluate; ignoring',
                  file=sys.stderr)
    metrics = dataset.evaluate(results, metric=args.eval, **eval_kw)
    for k, v in metrics.items():
        print(f'{k}: {v:.4f}')


if __name__ == '__main__':
    main()
