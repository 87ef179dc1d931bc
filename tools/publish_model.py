#!/usr/bin/env python
"""Publish a checkpoint: strip optimizer state, append content hash
(reference: tools/publish_model.py)."""

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('in_ckpt', help='checkpoint dir (epoch_N or work_dir)')
    p.add_argument('out_prefix', help='output path prefix')
    args = p.parse_args()

    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    path = os.path.abspath(args.in_ckpt)
    latest = os.path.join(path, 'latest')
    if os.path.isfile(latest):
        with open(latest) as f:
            path = os.path.join(path, f.read().strip())
    ckpt = ocp.StandardCheckpointer()
    state = ckpt.restore(path)
    slim = {'params': state['params'],
            'batch_stats': state.get('batch_stats', {})}

    out = os.path.abspath(args.out_prefix)
    ckpt.save(out + '-published', slim, force=True)
    ckpt.wait_until_finished()

    # content hash over the flattened weights
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(slim):
        h.update(np.ascontiguousarray(leaf).tobytes())
    digest = h.hexdigest()[:8]
    final = f'{out}-{digest}'
    os.rename(out + '-published', final)
    print(f'published: {final}')


if __name__ == '__main__':
    main()
