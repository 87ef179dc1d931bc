#!/usr/bin/env python
"""Training CLI: ``python train.py <config> [--work-dir ...]``.

Matches the reference CLI surface (reference: root train.py, minus the
hardcoded CUDA_VISIBLE_DEVICES quirk): config path, work-dir, resume/load,
seed, and ``--options k=v`` deep overrides.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    p = argparse.ArgumentParser(description='Train a detector')
    p.add_argument('config', help='config file path')
    p.add_argument('--work-dir', help='dir to save logs and checkpoints')
    p.add_argument('--resume-from', help='checkpoint to resume from')
    p.add_argument('--load-from', help='checkpoint to load weights from')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--no-validate', action='store_true',
                   help='skip checkpoint evaluation during training '
                        '(reference train.py --no-validate)')
    p.add_argument('--devices', type=int, default=None,
                   help='train on the first N local devices (reference '
                        '--gpus; default: all local devices)')
    p.add_argument('--deterministic', action='store_true',
                   help='accepted for reference-CLI compatibility; XLA/TPU '
                        'execution is already deterministic for this model')
    p.add_argument('--max-steps-per-epoch', type=int, default=None,
                   help='truncate epochs (smoke runs)')
    p.add_argument('--launcher', choices=['none', 'jax'], default='none',
                   help="'jax' initializes jax.distributed for multi-host "
                        'training (the reference equivalent of '
                        '--launcher pytorch + init_dist)')
    p.add_argument('--options', nargs='+', default=[],
                   help='override config: key=value (dotted keys)')
    return p.parse_args()


def main():
    args = parse_args()
    if os.environ.get('JAX_PLATFORMS'):
        # honor the env var even when a sitecustomize pre-registered a
        # different platform plugin (jax.config wins over registration) —
        # e.g. JAX_PLATFORMS=cpu for a hermetic smoke run on a TPU host
        import jax
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
    if args.launcher == 'jax' or os.environ.get('JAX_COORDINATOR_ADDRESS'):
        # multi-host init BEFORE first jax use (coordinator/process ids from
        # the standard env vars or TPU metadata); reference:
        # mmdet/apis/train.py init_dist via mmcv
        import jax
        jax.distributed.initialize()
    from dynamask_tpu.utils.config import Config
    from dynamask_tpu.apis import train_detector

    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_from_options(dict(kv.split('=', 1) for kv in args.options))
    work_dir = args.work_dir or cfg.get('work_dir') or os.path.join(
        './work_dirs', os.path.splitext(os.path.basename(args.config))[0])
    devices = None
    if args.devices is not None:
        import jax
        devices = jax.local_devices()[:args.devices]
    train_detector(cfg, work_dir=work_dir,
                   resume_from=args.resume_from or cfg.get('resume_from'),
                   load_from=args.load_from or cfg.get('load_from'),
                   seed=args.seed,
                   max_steps_per_epoch=args.max_steps_per_epoch,
                   devices=devices,
                   validate=not args.no_validate)


if __name__ == '__main__':
    main()
