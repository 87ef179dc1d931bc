#!/usr/bin/env python
"""Run inference over the test set and dump results in submission format
WITHOUT evaluating (reference: tools/format_result.py — the --format-only
test-runner used for test-server submissions).

Usage: python tools/format_result.py <config> <ckpt> --out results.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out', default='results.json')
    p.add_argument('--max-images', type=int, default=None)
    args = p.parse_args()

    from dynamask_tpu.utils.config import Config
    from dynamask_tpu.apis.inference import init_detector
    from dynamask_tpu.apis.test import single_device_test
    from dynamask_tpu.data import build_dataset

    cfg = Config.fromfile(args.config)
    model = init_detector(cfg, args.checkpoint)
    dataset = build_dataset(dict(cfg.data['test']),
                            default_args=dict(test_mode=True))
    results = single_device_test(model.det, model.variables, dataset,
                                 max_images=args.max_images)
    det_json, segm_json = dataset.results2json(results)
    base, ext = os.path.splitext(args.out)
    with open(f'{base}.bbox{ext}', 'w') as f:
        json.dump(det_json, f)
    with open(f'{base}.segm{ext}', 'w') as f:
        json.dump(segm_json, f)
    print(f'written {base}.bbox{ext} / {base}.segm{ext}')


if __name__ == '__main__':
    main()
