#!/usr/bin/env python
"""Boundary F1 between predicted and GT instance masks.

Rebuild of the reference's boundary-quality metric (reference:
tools/boundary_f1_score.py, 357 LoC — disk-dilated boundary precision/recall
over matched COCO masks). Used for the Cityscapes/boundary-quality claims.

Protocol: for each matched (pred, gt) mask pair, extract 1px boundaries,
dilate by a distance tolerance ``d`` (fraction of the image diagonal), then
precision = |pred_b ∩ dilate(gt_b)| / |pred_b|,
recall    = |gt_b ∩ dilate(pred_b)| / |gt_b|,  F = 2PR/(P+R).
"""

import argparse
import json
import os
import sys
from collections import defaultdict
from multiprocessing import Pool

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def mask_boundary(mask: np.ndarray) -> np.ndarray:
    """1-pixel-wide boundary via erosion difference."""
    import cv2
    kernel = np.ones((3, 3), np.uint8)
    eroded = cv2.erode(mask.astype(np.uint8), kernel)
    return (mask.astype(np.uint8) - eroded).astype(bool)


def boundary_f1(pred: np.ndarray, gt: np.ndarray,
                dilation_ratio: float = 0.02) -> float:
    import cv2
    h, w = gt.shape
    d = max(1, int(round(dilation_ratio * np.sqrt(h * h + w * w))))
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE,
                                       (2 * d + 1, 2 * d + 1))
    pb = mask_boundary(pred)
    gb = mask_boundary(gt)
    if pb.sum() == 0 or gb.sum() == 0:
        return 0.0
    gb_d = cv2.dilate(gb.astype(np.uint8), kernel).astype(bool)
    pb_d = cv2.dilate(pb.astype(np.uint8), kernel).astype(bool)
    precision = (pb & gb_d).sum() / pb.sum()
    recall = (gb & pb_d).sum() / gb.sum()
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def _eval_image(task):
    from dynamask_tpu.data.mask_codec import ann_to_mask
    from dynamask_tpu.data.mask_codec import _masks_pairwise_iou
    gts, dets, h, w, iou_thr, dil = task
    if not gts or not dets:
        return []
    g_masks = [ann_to_mask(g['segmentation'], h, w).astype(bool) for g in gts]
    d_masks = [ann_to_mask(d['segmentation'], h, w).astype(bool)
               for d in dets]
    ious = _masks_pairwise_iou(d_masks, g_masks, [False] * len(g_masks))
    f1s = []
    used = set()
    order = np.argsort([-d['score'] for d in dets])
    for di in order:
        gi = int(np.argmax(ious[di]))
        if ious[di, gi] >= iou_thr and gi not in used:
            used.add(gi)
            f1s.append(boundary_f1(d_masks[di], g_masks[gi], dil))
    return f1s


def evaluate_boundary_f1(gt_anns, det_anns, img_sizes, iou_thr=0.5,
                         dilation_ratio=0.02, workers=8):
    gt_by_img = defaultdict(list)
    for g in gt_anns:
        if not g.get('iscrowd', 0):
            gt_by_img[g['image_id']].append(g)
    det_by_img = defaultdict(list)
    for d in det_anns:
        det_by_img[d['image_id']].append(d)
    tasks = [(gt_by_img[i], det_by_img.get(i, []), *img_sizes[i], iou_thr,
              dilation_ratio) for i in gt_by_img]
    if workers > 1:
        with Pool(workers) as pool:
            all_f1 = pool.map(_eval_image, tasks)
    else:
        all_f1 = [_eval_image(t) for t in tasks]
    flat = [f for fs in all_f1 for f in fs]
    return float(np.mean(flat)) if flat else 0.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument('gt_json', help='COCO-format gt annotations')
    p.add_argument('det_json', help='segm results json (list of det anns)')
    p.add_argument('--iou-thr', type=float, default=0.5)
    p.add_argument('--dilation-ratio', type=float, default=0.02)
    p.add_argument('--workers', type=int, default=8)
    args = p.parse_args()

    with open(args.gt_json) as f:
        gt = json.load(f)
    with open(args.det_json) as f:
        dets = json.load(f)
    if isinstance(dets, dict):
        dets = dets.get('segm', dets)
    sizes = {im['id']: (im['height'], im['width']) for im in gt['images']}
    f1 = evaluate_boundary_f1(gt['annotations'], dets, sizes,
                              args.iou_thr, args.dilation_ratio, args.workers)
    print(f'boundary F1 @ IoU {args.iou_thr}: {f1:.4f}')


if __name__ == '__main__':
    main()
