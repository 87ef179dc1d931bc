#!/usr/bin/env python
"""Corruption-robustness benchmark runner (reference:
tools/test_robustness.py:1-458): evaluates a checkpoint over the 15
benchmark corruptions x severities by injecting the ``Corrupt`` transform
after image loading, and writes the corruption->severity->metrics json that
``tools/robustness_eval.py`` aggregates into P/mPC/rPC.

Requires the external ``imagecorruptions`` package (the reference's own
lazy dependency).
"""

import argparse
import copy
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

BENCHMARK_CORRUPTIONS = (
    'gaussian_noise', 'shot_noise', 'impulse_noise', 'defocus_blur',
    'glass_blur', 'motion_blur', 'zoom_blur', 'snow', 'frost', 'fog',
    'brightness', 'contrast', 'elastic_transform', 'pixelate',
    'jpeg_compression')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?')
    p.add_argument('--corruptions', nargs='+',
                   default=['benchmark'],
                   help="corruption names, or 'benchmark' for all 15")
    p.add_argument('--severities', type=int, nargs='+',
                   default=[0, 1, 2, 3, 4, 5])
    p.add_argument('--eval', nargs='+', default=['bbox'])
    p.add_argument('--out', default='robustness_results.json')
    p.add_argument('--max-images', type=int, default=None)
    args = p.parse_args()

    from dynamask_tpu.utils.config import Config
    from dynamask_tpu.apis.test import run_eval

    corruptions = (BENCHMARK_CORRUPTIONS
                   if args.corruptions == ['benchmark']
                   else args.corruptions)
    base_cfg = Config.fromfile(args.config)

    results = {}
    for corruption in corruptions:
        for severity in args.severities:
            cfg = copy.deepcopy(base_cfg)
            test_data = dict(cfg.data['test'])
            pipeline = [dict(s) for s in test_data['pipeline']]
            if severity > 0:
                # corruption goes right after image loading
                # (reference test_robustness.py:inject pipeline logic)
                pipeline.insert(1, dict(type='Corrupt',
                                        corruption=corruption,
                                        severity=severity))
            test_data['pipeline'] = pipeline
            cfg.data['test'] = test_data
            tag = 'clean' if severity == 0 else corruption
            print(f'== {tag} severity {severity} ==', flush=True)
            metrics = run_eval(cfg, args.checkpoint, metrics=args.eval,
                               max_images=args.max_images)
            if severity == 0:
                results['clean'] = metrics
            else:
                results.setdefault(corruption, {})[str(severity)] = metrics
            with open(args.out, 'w') as f:
                json.dump(results, f, indent=2)
        if 0 in args.severities:
            # clean only needs to run once
            args.severities = [s for s in args.severities if s != 0]
    print(f'saved {args.out}')


if __name__ == '__main__':
    main()
