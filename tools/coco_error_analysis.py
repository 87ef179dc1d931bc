#!/usr/bin/env python
"""COCO error analysis — decompose AP by error type
(reference: tools/coco_error_analysis.py).

Given a results json (`test.py ... --out results.json`) and the dataset
config, computes for each class (and overall) the progressive-AP curve:

    C75   AP at IoU 0.75 (strict localization)
    C50   AP at IoU 0.50 (the PASCAL criterion)
    Loc   AP at IoU 0.10 (localization errors forgiven)
    Sim+Oth  AP at IoU 0.10 with CLASS-AGNOSTIC matching (class confusion
             with any category forgiven)
    BG/FN    the remaining gap to 1.0 (background false positives + missed
             ground truth)

The reference tool renders stacked-area plots per class from pycocotools'
precision tensor; this one reports the same decomposition as a table (and
an optional matplotlib bar chart) using the native evaluator
(data/cocoeval.py) with custom IoU thresholds.
"""

import argparse
import json
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))


def _ap_for(gt_anns, img_ids, cat_ids, dets, iou_thr, iou_type,
            img_sizes):
    from dynamask_tpu.data.cocoeval import CocoEvaluator
    ev = CocoEvaluator(gt_anns, img_ids, cat_ids, iou_type=iou_type,
                       img_sizes=img_sizes, iou_thrs=[iou_thr])
    stats = ev.evaluate(dets)
    return stats['mAP']


def main():
    p = argparse.ArgumentParser(description='COCO error analysis')
    p.add_argument('result', help='results json from test.py --out')
    p.add_argument('config', help='dataset config')
    p.add_argument('--types', nargs='+', default=['bbox'],
                   choices=['bbox', 'segm'])
    p.add_argument('--out-dir', default=None,
                   help='write a bar chart per type here')
    args = p.parse_args()

    from dynamask_tpu.utils.config import Config
    from dynamask_tpu.data import build_dataset

    cfg = Config.fromfile(args.config)
    dataset = build_dataset(dict(cfg.data['test']),
                            default_args=dict(test_mode=True))
    coco = dataset.coco
    gt_anns = [a for anns in coco.img_anns.values() for a in anns]
    img_ids = list(coco.img_ids)
    cat_ids = [c for c in coco.cat_ids if c in dataset.cat2label]
    img_sizes = {i['id']: (i['height'], i['width'])
                 for i in dataset.img_infos}

    with open(args.result) as f:
        raw = json.load(f)

    for iou_type in args.types:
        dets = raw[iou_type] if isinstance(raw, dict) else raw
        # class-agnostic copies: every category id becomes 1
        ag_dets = [dict(d, category_id=1) for d in dets]
        ag_gts = [dict(g, category_id=1) for g in gt_anns]

        c75 = _ap_for(gt_anns, img_ids, cat_ids, dets, 0.75, iou_type,
                      img_sizes)
        c50 = _ap_for(gt_anns, img_ids, cat_ids, dets, 0.50, iou_type,
                      img_sizes)
        loc = _ap_for(gt_anns, img_ids, cat_ids, dets, 0.10, iou_type,
                      img_sizes)
        oth = _ap_for(ag_gts, img_ids, [1], ag_dets, 0.10, iou_type,
                      img_sizes)
        bg_fn = 1.0 - oth

        print(f'== {iou_type} error decomposition ==')
        print(f'  C75      : {c75:.3f}')
        print(f'  C50      : {c50:.3f}  (+{c50 - c75:.3f} loc 0.5-0.75)')
        print(f'  Loc      : {loc:.3f}  (+{loc - c50:.3f} loose loc)')
        print(f'  Sim+Oth  : {oth:.3f}  (+{oth - loc:.3f} class confusion)')
        print(f'  BG+FN gap: {bg_fn:.3f}  (background FPs + missed GT)')

        if args.out_dir:
            os.makedirs(args.out_dir, exist_ok=True)
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
            labels = ['C75', 'C50', 'Loc', 'Sim+Oth', 'BG+FN']
            vals = [c75, c50 - c75, loc - c50, oth - loc, bg_fn]
            fig, ax = plt.subplots(figsize=(5, 4))
            bottom = 0.0
            for lab, v in zip(labels, vals):
                ax.bar([iou_type], [v], bottom=bottom, label=lab)
                bottom += v
            ax.set_ylim(0, 1)
            ax.set_ylabel('AP contribution')
            ax.legend()
            out = osp.join(args.out_dir, f'error_analysis_{iou_type}.png')
            fig.savefig(out, dpi=120, bbox_inches='tight')
            print(f'  chart: {out}')


if __name__ == '__main__':
    main()
