#!/usr/bin/env python
"""Convert pycls RegNet checkpoints to the mmdet-style key layout this
framework's torch importer understands (reference: tools/regnet2mmdet.py:1-89
— same stem/head/reslayer renames; the output .pth feeds
``dynamask_tpu/engine/pretrained.py``)."""

import argparse
from collections import OrderedDict


def convert(src, dst):
    import torch
    ckpt = torch.load(src, map_location='cpu')
    blobs = ckpt.get('model_state', ckpt)
    state_dict = OrderedDict()
    converted = set()
    for key, weight in blobs.items():
        if 'stem.conv' in key or 'stem.bn' in key:
            new = key.replace('stem.conv', 'conv1').replace('stem.bn', 'bn1')
        elif 'head.fc' in key:
            new = key.replace('head.fc', 'fc')
        elif key.startswith('s'):
            parts = key.split('.')
            layer, block, module = parts[:3]
            block_id = int(block[1:])
            prefix = f'layer{int(layer[1:])}.{block_id - 1}'
            if block_id == 1 and module == 'bn':
                new = f'{prefix}.downsample.1.{parts[-1]}'
            elif block_id == 1 and module == 'proj':
                new = f'{prefix}.downsample.0.{parts[-1]}'
            elif module == 'f':
                sub = {'a': 'conv1', 'b': 'conv2', 'c': 'conv3',
                       'a_bn': 'bn1', 'b_bn': 'bn2', 'c_bn': 'bn3',
                       'se': 'se'}[parts[3]]
                if sub == 'se':
                    new = f'{prefix}.se.{".".join(parts[4:])}'
                else:
                    new = f'{prefix}.{sub}.{parts[-1]}'
            else:
                raise ValueError(f'unsupported key {key}')
        else:
            print(f'skip {key}')
            continue
        state_dict[new] = weight
        converted.add(key)
        print(f'{key} -> {new}')
    import torch
    torch.save({'state_dict': state_dict}, dst)
    print(f'saved {len(state_dict)} tensors to {dst}')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src')
    p.add_argument('dst')
    args = p.parse_args()
    convert(args.src, args.dst)


if __name__ == '__main__':
    main()
