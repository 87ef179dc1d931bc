#!/usr/bin/env python
"""Strip LVIS v0.5 'COCO_val2014_' filename prefixes so images resolve in a
coco2017 layout (reference: tools/lvis_filename_to2017.py)."""

import json
import os
import sys

with open(sys.argv[1], 'r') as fd:
    coco = json.load(fd)
for img in coco['images']:
    prefix, img['file_name'] = img['file_name'].rsplit('_', 1)
    assert prefix == 'COCO_val2014', prefix

save_name = os.path.basename(sys.argv[1]) + '.2017'
with open(save_name, 'w') as fd:
    json.dump(coco, fd)
print(f'processed {sys.argv[1]}, saved to {save_name}')
