#!/usr/bin/env python
"""Single-image demo (reference: demo/image_demo.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('img')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--out-file', default='demo_out.jpg')
    args = p.parse_args()

    import cv2
    from dynamask_tpu.apis import (init_detector, inference_detector,
                                   show_result)

    model = init_detector(args.config, args.checkpoint)
    result = inference_detector(model, args.img)
    img = cv2.imread(args.img)
    show_result(img, result, model.CLASSES, score_thr=args.score_thr,
                out_file=args.out_file)
    print(f'saved: {args.out_file}')


if __name__ == '__main__':
    main()
