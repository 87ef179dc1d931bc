#!/usr/bin/env python
"""Convert PASCAL VOC devkit annotations to COCO-format json.

Reference: tools/convert_datasets/pascal_voc.py (XML -> middle-format pkl).
This port emits COCO json directly — the native annotation format of this
framework's dataset layer (data/coco.py) — one file per split.

Usage:
  python tools/convert_datasets/pascal_voc.py <devkit_path> -o <out_dir> \
      [--years 2007 2012] [--splits trainval test]
"""

import argparse
import json
import os
import os.path as osp
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

VOC_CLASSES = ('aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus',
               'car', 'cat', 'chair', 'cow', 'diningtable', 'dog', 'horse',
               'motorbike', 'person', 'pottedplant', 'sheep', 'sofa',
               'train', 'tvmonitor')


def parse_xml(xml_path, img_path, img_id, ann_start):
    tree = ET.parse(xml_path)
    root = tree.getroot()
    size = root.find('size')
    w = int(size.find('width').text)
    h = int(size.find('height').text)
    image = {'id': img_id, 'file_name': img_path, 'width': w, 'height': h}
    anns = []
    label_ids = {name: i + 1 for i, name in enumerate(VOC_CLASSES)}
    for obj in root.findall('object'):
        name = obj.find('name').text
        if name not in label_ids:
            continue
        difficult = int(obj.find('difficult').text)
        b = obj.find('bndbox')
        # VOC pixel indices are 1-based (reference parse_xml subtracts 1)
        x1 = int(float(b.find('xmin').text)) - 1
        y1 = int(float(b.find('ymin').text)) - 1
        x2 = int(float(b.find('xmax').text)) - 1
        y2 = int(float(b.find('ymax').text)) - 1
        anns.append({
            'id': ann_start + len(anns),
            'image_id': img_id,
            'category_id': label_ids[name],
            'bbox': [x1, y1, x2 - x1, y2 - y1],
            'area': (x2 - x1) * (y2 - y1),
            'iscrowd': 0,
            'ignore': difficult,
            'difficult': difficult,
        })
    return image, anns


def cvt_split(devkit_path, years, split, out_file):
    images, annotations = [], []
    img_id = 0
    for year in years:
        filelist = osp.join(devkit_path,
                            f'VOC{year}/ImageSets/Main/{split}.txt')
        if not osp.isfile(filelist):
            print(f'filelist does not exist: {filelist}, '
                  f'skip voc{year} {split}')
            continue
        with open(filelist) as f:
            names = [ln.strip() for ln in f if ln.strip()]
        for name in names:
            xml_path = osp.join(devkit_path,
                                f'VOC{year}/Annotations/{name}.xml')
            img_path = f'VOC{year}/JPEGImages/{name}.jpg'
            image, anns = parse_xml(xml_path, img_path, img_id,
                                    len(annotations) + 1)
            images.append(image)
            annotations.extend(anns)
            img_id += 1
    categories = [{'id': i + 1, 'name': n}
                  for i, n in enumerate(VOC_CLASSES)]
    with open(out_file, 'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': categories}, f)
    print(f'{out_file}: {len(images)} images, {len(annotations)} anns')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('devkit_path')
    p.add_argument('-o', '--out-dir', default='.')
    p.add_argument('--years', nargs='+', default=['2007', '2012'])
    p.add_argument('--splits', nargs='+', default=['trainval', 'test'])
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for split in args.splits:
        out = osp.join(args.out_dir,
                       f'voc{"_".join(args.years)}_{split}.json')
        cvt_split(args.devkit_path, args.years, split, out)


if __name__ == '__main__':
    main()
