#!/usr/bin/env python
"""Dump the fully-resolved config (reference: tools/print_config.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--options', nargs='+', default=[])
    args = p.parse_args()
    from dynamask_tpu.utils.config import Config
    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_from_options(dict(kv.split('=', 1) for kv in args.options))
    print(cfg.dump())


if __name__ == '__main__':
    main()
