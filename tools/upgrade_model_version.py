#!/usr/bin/env python
"""Upgrade mmdetection v1.x checkpoints to the v2-style layout this
framework's torch importer expects (reference:
tools/upgrade_model_version.py:1-193).

The two v1->v2 semantic changes that matter for weight import:
  * classification channel order: v1 puts background at index 0, v2 puts it
    LAST — class channels of cls convs/fcs are rolled by one;
  * RPN objectness: v1 uses 2-channel softmax, v2 1-channel sigmoid — the
    foreground channel is kept.
The upgraded ``.pth`` feeds ``dynamask_tpu/engine/pretrained.py``.
"""

import argparse
import re
from collections import OrderedDict


def reorder_cls_channel(val, num_classes):
    import torch
    if val.dim() == 1:
        return torch.cat((val[1:], val[:1]), dim=0)
    out_channels, in_channels = val.shape[:2]
    if out_channels != num_classes and out_channels % num_classes == 0:
        new = val.reshape(-1, num_classes, in_channels, *val.shape[2:])
        new = torch.cat((new[:, 1:], new[:, :1]), dim=1)
        return new.reshape(val.size())
    if out_channels == num_classes:
        return torch.cat((val[1:], val[:1]), dim=0)
    return val


def truncate_rpn_channel(val):
    """2-ch softmax objectness -> 1-ch sigmoid (keep the fg channel)."""
    return val[1:2] if val.shape[0] == 2 else val


def convert(in_file, out_file, num_classes):
    import torch
    ckpt = torch.load(in_file, map_location='cpu')
    in_state = ckpt.get('state_dict', ckpt)
    out_state = OrderedDict()
    for key, val in in_state.items():
        new_key = key
        new_val = val
        if re.search(r'(fc_cls|retina_cls|conv_cls)\.(weight|bias)', key) \
                and 'rpn' not in key:
            new_val = reorder_cls_channel(val, num_classes)
        if re.search(r'rpn_cls\.(weight|bias)', key):
            new_val = truncate_rpn_channel(val)
        out_state[new_key] = new_val
    torch.save({'state_dict': out_state,
                'meta': ckpt.get('meta', {})}, out_file)
    print(f'upgraded {len(out_state)} tensors -> {out_file}')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('in_file')
    p.add_argument('out_file')
    p.add_argument('--num-classes', type=int, default=81,
                   help='v1 class count INCLUDING background')
    args = p.parse_args()
    convert(args.in_file, args.out_file, args.num_classes)


if __name__ == '__main__':
    main()
