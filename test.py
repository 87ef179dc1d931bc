#!/usr/bin/env python
"""Evaluation CLI: ``python test.py <config> <checkpoint> --eval bbox segm``.

Matches the reference CLI surface (reference: root test.py — eval metrics,
result dumping, show-dir)."""

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
                   choices=['bbox', 'segm', 'proposal'])
    p.add_argument('--out', help='dump raw results json')
    p.add_argument('--max-images', type=int, default=None)
    p.add_argument('--options', nargs='+', default=[])
    return p.parse_args()


def main():
    args = parse_args()
    from dynamask_tpu.utils.config import Config
    from dynamask_tpu.apis.inference import init_detector
    from dynamask_tpu.apis.test import single_device_test
    from dynamask_tpu.data import build_dataset

    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_from_options(dict(kv.split('=', 1) for kv in args.options))

    model = init_detector(cfg, args.checkpoint)
    dataset = build_dataset(dict(cfg.data['test']),
                            default_args=dict(test_mode=True))
    results = single_device_test(model.det, model.variables, dataset,
                                 max_images=args.max_images)
    if args.out:
        det_json, segm_json = dataset.results2json(results)
        with open(args.out, 'w') as f:
            json.dump({'bbox': det_json, 'segm': segm_json}, f)
    metrics = dataset.evaluate(results, metric=args.eval)
    for k, v in metrics.items():
        print(f'{k}: {v:.4f}')


if __name__ == '__main__':
    main()
