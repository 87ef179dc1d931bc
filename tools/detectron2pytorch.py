#!/usr/bin/env python
"""Convert Detectron (caffe2) ResNet pickles into torch-style state dicts
the importer understands (reference: tools/detectron2pytorch.py:1-82 —
same bn-scale merge and res-block renames)."""

import argparse
import pickle
from collections import OrderedDict


def convert_bn(blobs, state_dict, caffe_name, torch_name, converted):
    import torch
    # detectron affine-only bn: gamma/beta; running stats folded upstream
    state_dict[torch_name + '.weight'] = torch.from_numpy(
        blobs[caffe_name + '_s'])
    state_dict[torch_name + '.bias'] = torch.from_numpy(
        blobs[caffe_name + '_b'])
    state_dict[torch_name + '.running_mean'] = torch.zeros_like(
        state_dict[torch_name + '.weight'])
    state_dict[torch_name + '.running_var'] = torch.ones_like(
        state_dict[torch_name + '.weight'])
    converted.update({caffe_name + '_s', caffe_name + '_b'})


def convert(src, dst, depth):
    import torch
    with open(src, 'rb') as f:
        data = pickle.load(f, encoding='latin1')
    blobs = data.get('blobs', data)
    state_dict = OrderedDict()
    converted = set()
    arch = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]

    state_dict['conv1.weight'] = torch.from_numpy(blobs['conv1_w'])
    converted.add('conv1_w')
    convert_bn(blobs, state_dict, 'res_conv1_bn', 'bn1', converted)
    for i, n_blocks in enumerate(arch, start=2):
        for j in range(n_blocks):
            if j == 0:
                state_dict[f'layer{i - 1}.0.downsample.0.weight'] = \
                    torch.from_numpy(blobs[f'res{i}_{j}_branch1_w'])
                converted.add(f'res{i}_{j}_branch1_w')
                convert_bn(blobs, state_dict, f'res{i}_{j}_branch1_bn',
                           f'layer{i - 1}.0.downsample.1', converted)
            for sub, tname in zip('abc', ('conv1', 'conv2', 'conv3')):
                state_dict[f'layer{i - 1}.{j}.{tname}.weight'] = \
                    torch.from_numpy(blobs[f'res{i}_{j}_branch2{sub}_w'])
                converted.add(f'res{i}_{j}_branch2{sub}_w')
                convert_bn(blobs, state_dict, f'res{i}_{j}_branch2{sub}_bn',
                           f'layer{i - 1}.{j}.bn{"abc".index(sub) + 1}',
                           converted)
    skipped = [k for k in blobs if k not in converted]
    if skipped:
        print(f'not converted: {skipped}')
    torch.save({'state_dict': state_dict}, dst)
    print(f'saved {len(state_dict)} tensors to {dst}')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src')
    p.add_argument('dst')
    p.add_argument('--depth', type=int, default=50, choices=[50, 101])
    args = p.parse_args()
    convert(args.src, args.dst, args.depth)


if __name__ == '__main__':
    main()
