#!/usr/bin/env python
"""Aggregate corruption-benchmark results into mPC / rPC
(reference: tools/robustness_eval.py).

Input: a json mapping corruption -> severity -> metric dict, e.g. produced
by running test.py over pipelines with the Corrupt transform at severities
1-5 (clean results under the key "clean").

    {"clean": {"bbox_mAP": 0.38}, "gaussian_noise": {"1": {...}, ...}, ...}

Outputs P (clean), mPC (mean over corruptions x severities) and
rPC = mPC / P — the benchmark-corruption protocol of Michaelis et al.
(the reference's robustness suite).
"""

import argparse
import json

import numpy as np

BENCHMARK_CORRUPTIONS = (
    'gaussian_noise', 'shot_noise', 'impulse_noise', 'defocus_blur',
    'glass_blur', 'motion_blur', 'zoom_blur', 'snow', 'frost', 'fog',
    'brightness', 'contrast', 'elastic_transform', 'pixelate',
    'jpeg_compression')


def main():
    p = argparse.ArgumentParser(description='Aggregate robustness results')
    p.add_argument('result_json')
    p.add_argument('--metric', default='bbox_mAP')
    p.add_argument('--corruptions', nargs='*',
                   default=list(BENCHMARK_CORRUPTIONS))
    args = p.parse_args()

    with open(args.result_json) as f:
        data = json.load(f)

    clean = data.get('clean', {}).get(args.metric)
    vals = []
    for c in args.corruptions:
        sev = data.get(c)
        if not sev:
            continue
        for s, metrics in sorted(sev.items()):
            v = metrics.get(args.metric)
            if v is not None:
                vals.append(v)
    if clean is not None:
        print(f'P   ({args.metric}, clean): {clean:.4f}')
    if vals:
        mpc = float(np.mean(vals))
        print(f'mPC ({len(vals)} corruption x severity runs): {mpc:.4f}')
        if clean:
            print(f'rPC: {mpc / clean:.4f}')
    else:
        print('no corruption results found')


if __name__ == '__main__':
    main()
