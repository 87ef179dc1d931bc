#!/usr/bin/env python
"""Convert Cityscapes gtFine annotations to COCO-format json.

Counterpart of the reference converter (reference:
tools/convert_datasets/cityscapes.py) without the cityscapesscripts /
pycocotools / mmcv dependencies: the label table is inlined and RLE encoding
uses the repo's native codec (dynamask_tpu/data/mask_codec.py).

Usage:
    python tools/convert_datasets/cityscapes.py \
        /path/to/cityscapes --out-dir /path/to/cityscapes/annotations

Expects the standard layout:
    <root>/leftImg8bit/{train,val,test}/<city>/*_leftImg8bit.png
    <root>/gtFine/{train,val,test}/<city>/*_gtFine_instanceIds.png

Produces instancesonly_filtered_gtFine_{train,val,test}.json with the 8
instance classes (person, rider, car, truck, bus, train, motorcycle,
bicycle) using the official cityscapes label ids as category ids — the
format the reference's CityscapesDataset consumes (mmdet/datasets/
cityscapes.py) and this repo's CityscapesDataset expects.
"""

import argparse
import glob
import json
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

# (name, official id, hasInstances, ignoreInEval) — subset of the official
# cityscapesscripts label table that matters for instance segmentation.
INSTANCE_LABELS = [
    ('person', 24), ('rider', 25), ('car', 26), ('truck', 27),
    ('bus', 28), ('train', 31), ('motorcycle', 32), ('bicycle', 33),
]
INSTANCE_IDS = {lid for _, lid in INSTANCE_LABELS}


def collect_files(img_dir, gt_dir):
    suffix = 'leftImg8bit.png'
    files = []
    for img_file in sorted(glob.glob(osp.join(img_dir, '**/*.png'))):
        assert img_file.endswith(suffix), img_file
        inst_file = gt_dir + img_file[
            len(img_dir):-len(suffix)] + 'gtFine_instanceIds.png'
        segm_file = gt_dir + img_file[
            len(img_dir):-len(suffix)] + 'gtFine_labelIds.png'
        files.append((img_file, inst_file, segm_file))
    assert files, f'No images found in {img_dir}'
    print(f'Loaded {len(files)} images from {img_dir}')
    return files


def load_img_info(files):
    """One image's COCO-style info + annotations from its instanceIds map.

    Cityscapes encoding: pixels of instance-capable classes carry
    ``label_id * 1000 + instance_index``; pixels with values < 1000 are
    either stuff or crowd regions of that label id.
    """
    import cv2
    from dynamask_tpu.data.mask_codec import encode_mask, rle_area

    img_file, inst_file, segm_file = files
    inst_img = cv2.imread(inst_file, cv2.IMREAD_UNCHANGED)
    assert inst_img is not None, inst_file

    anno_info = []
    unique_inst_ids = np.unique(inst_img[inst_img >= 24])
    for inst_id in unique_inst_ids:
        label_id = int(inst_id) // 1000 if inst_id >= 1000 else int(inst_id)
        if label_id not in INSTANCE_IDS:
            continue
        iscrowd = int(inst_id < 1000)
        mask = (inst_img == inst_id).astype(np.uint8)
        rle = encode_mask(mask)
        if isinstance(rle.get('counts'), bytes):
            rle['counts'] = rle['counts'].decode()
        area = int(rle_area(rle) if 'size' in rle else mask.sum())
        ys, xs = np.nonzero(mask)
        x0, y0 = int(xs.min()), int(ys.min())
        bw, bh = int(xs.max()) - x0 + 1, int(ys.max()) - y0 + 1
        anno_info.append(dict(
            iscrowd=iscrowd, category_id=label_id,
            bbox=[x0, y0, bw, bh], area=area, segmentation=rle))

    city = osp.basename(osp.dirname(img_file))
    return dict(
        file_name=osp.join(city, osp.basename(img_file)),
        height=int(inst_img.shape[0]), width=int(inst_img.shape[1]),
        anno_info=anno_info,
        segm_file=osp.join(city, osp.basename(segm_file)))


def cvt_annotations(image_infos, out_json_name):
    out = dict(images=[], categories=[], annotations=[])
    img_id, ann_id = 0, 0
    for image_info in image_infos:
        image_info['id'] = img_id
        anno_infos = image_info.pop('anno_info')
        out['images'].append(image_info)
        for anno_info in anno_infos:
            anno_info.update(id=ann_id, image_id=img_id)
            out['annotations'].append(anno_info)
            ann_id += 1
        img_id += 1
    for name, lid in INSTANCE_LABELS:
        out['categories'].append(dict(id=lid, name=name))
    if not out['annotations']:
        out.pop('annotations')
    with open(out_json_name, 'w') as f:
        json.dump(out, f)
    return out


def main():
    parser = argparse.ArgumentParser(
        description='Convert Cityscapes annotations to COCO format')
    parser.add_argument('cityscapes_path', help='cityscapes data root')
    parser.add_argument('--img-dir', default='leftImg8bit')
    parser.add_argument('--gt-dir', default='gtFine')
    parser.add_argument('-o', '--out-dir', help='output path')
    parser.add_argument('--nproc', default=1, type=int,
                        help='number of processes')
    args = parser.parse_args()

    out_dir = args.out_dir or args.cityscapes_path
    os.makedirs(out_dir, exist_ok=True)
    img_dir = osp.join(args.cityscapes_path, args.img_dir)
    gt_dir = osp.join(args.cityscapes_path, args.gt_dir)

    sets = [('train', 'instancesonly_filtered_gtFine_train.json'),
            ('val', 'instancesonly_filtered_gtFine_val.json'),
            ('test', 'instancesonly_filtered_gtFine_test.json')]
    for split, json_name in sets:
        print(f'Converting {split} into {json_name}')
        files = collect_files(osp.join(img_dir, split),
                              osp.join(gt_dir, split))
        if args.nproc > 1:
            from multiprocessing import Pool
            with Pool(args.nproc) as pool:
                image_infos = pool.map(load_img_info, files)
        else:
            image_infos = [load_img_info(f) for f in files]
        cvt_annotations(image_infos, osp.join(out_dir, json_name))


if __name__ == '__main__':
    main()
