#!/usr/bin/env python
"""Live webcam demo (reference: demo/webcam_demo.py).

Grabs frames from a cv2 camera, runs the jitted inference path per frame
(the first frame pays the XLA compile; later frames reuse it because the
input canvas shape is static), and displays the drawn result. ``--out``
writes frames to a video file instead of a window (headless hosts)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--camera-id', type=int, default=0)
    p.add_argument('--score-thr', type=float, default=0.5)
    p.add_argument('--out', default=None,
                   help='write an mp4 instead of opening a window')
    p.add_argument('--max-frames', type=int, default=0,
                   help='stop after N frames (0 = until ESC/EOF)')
    args = p.parse_args()

    import cv2
    from dynamask_tpu.apis import (init_detector, inference_detector,
                                   show_result)

    cam = cv2.VideoCapture(args.camera_id)
    if not cam.isOpened():
        print(f'camera {args.camera_id} not available', file=sys.stderr)
        return 1

    model = init_detector(args.config, args.checkpoint)
    print('Press "Esc", "q" or "Q" to exit.')

    writer = None
    n = 0
    while True:
        ok, img = cam.read()
        if not ok:
            break
        result = inference_detector(model, img)
        drawn = show_result(img, result, model.CLASSES,
                            score_thr=args.score_thr, out_file=None)
        if args.out:
            if writer is None:
                writer = cv2.VideoWriter(
                    args.out, cv2.VideoWriter_fourcc(*'mp4v'), 15,
                    (drawn.shape[1], drawn.shape[0]))
            writer.write(drawn)
        else:
            cv2.imshow('result', drawn)
            ch = cv2.waitKey(1)
            if ch == 27 or ch == ord('q') or ch == ord('Q'):
                break
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    cam.release()
    if writer is not None:
        writer.release()
        print(f'wrote {n} frames -> {args.out}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
