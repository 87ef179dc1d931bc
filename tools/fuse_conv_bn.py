#!/usr/bin/env python
"""Fold BatchNorm statistics into conv kernels in a saved checkpoint.

Reference: tools/fuse_conv_bn.py (fuse_module over torch Conv+BN pairs).
Here the fusion operates on the orbax checkpoint's variable tree
(engine/fuse.py) and writes a new checkpoint directory.

Usage: python tools/fuse_conv_bn.py <config> <ckpt_dir> <out_dir>
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('out')
    args = p.parse_args()

    from dynamask_tpu.utils.config import Config
    from dynamask_tpu.apis.inference import init_detector
    from dynamask_tpu.engine.fuse import fuse_conv_bn
    from dynamask_tpu.engine.checkpoint import save_checkpoint

    cfg = Config.fromfile(args.config)
    model = init_detector(cfg, args.checkpoint)
    fused, n = fuse_conv_bn(model.variables)
    print(f'fused {n} conv+bn pairs')
    save_checkpoint(args.out, fused, epoch=0,
                    meta={'fused_conv_bn': True, 'config': args.config})
    print(f'written to {args.out}')


if __name__ == '__main__':
    main()
