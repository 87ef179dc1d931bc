#!/usr/bin/env python
"""Training-log analysis (reference: tools/analyze_logs.py) — loss curves and
timing stats from the ``<timestamp>.log.json`` files train.py writes."""

import argparse
import json
import os
import sys
from collections import defaultdict

import numpy as np


def load_json_log(path):
    entries = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                entries.append(json.loads(line))
    return entries


def cal_train_time(entries):
    times = [e['time'] for e in entries if e.get('mode') == 'train'
             and 'time' in e]
    if not times:
        print('no timing entries')
        return
    t = np.asarray(times)
    print(f'average iter time: {t.mean():.4f} s/iter '
          f'(fastest {t.min():.4f}, slowest {t.max():.4f}, std {t.std():.4f})')


def plot_curve(entries, keys, out=None):
    by_key = defaultdict(list)
    for e in entries:
        if e.get('mode') != 'train':
            continue
        for k in keys:
            if k in e:
                by_key[k].append((e.get('epoch', 0), e.get('iter', 0), e[k]))
    for k, vals in by_key.items():
        v = np.asarray([x[2] for x in vals])
        print(f'{k}: first {v[0]:.4f} last {v[-1]:.4f} '
              f'min {v.min():.4f} max {v.max():.4f} ({len(v)} points)')
    if out:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        for k, vals in by_key.items():
            plt.plot([x[2] for x in vals], label=k)
        plt.legend()
        plt.xlabel('log step')
        plt.savefig(out)
        print(f'saved plot to {out}')


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='task', required=True)
    pt = sub.add_parser('cal_train_time')
    pt.add_argument('json_log')
    pp = sub.add_parser('plot_curve')
    pp.add_argument('json_log')
    pp.add_argument('--keys', nargs='+', default=['loss'])
    pp.add_argument('--out', default=None)
    args = p.parse_args()

    entries = load_json_log(args.json_log)
    if args.task == 'cal_train_time':
        cal_train_time(entries)
    else:
        plot_curve(entries, args.keys, args.out)


if __name__ == '__main__':
    main()
