#!/usr/bin/env python
"""Filter LVIS annotations down to the 80 COCO categories ("cocofied" LVIS).

Reference: tools/cocofied_lvis.py. The synset -> COCO-category-id table is
public data from the official LVIS API (lvis-api/data/coco_to_synset.json);
it is reproduced here as a compact data table.

Usage: python tools/cocofied_lvis.py <lvis.json> <out.json>
"""

import argparse
import copy
import json
from collections import defaultdict

COCO_SYNSET_CATEGORIES = [
    ('person.n.01', 1), ('bicycle.n.01', 2), ('car.n.01', 3),
    ('motorcycle.n.01', 4), ('airplane.n.01', 5), ('bus.n.01', 6),
    ('train.n.01', 7), ('truck.n.01', 8), ('boat.n.01', 9),
    ('traffic_light.n.01', 10), ('fireplug.n.01', 11), ('stop_sign.n.01',
    13), ('parking_meter.n.01', 14), ('bench.n.01', 15), ('bird.n.01', 16),
    ('cat.n.01', 17), ('dog.n.01', 18), ('horse.n.01', 19), ('sheep.n.01',
    20), ('beef.n.01', 21), ('elephant.n.01', 22), ('bear.n.01', 23),
    ('zebra.n.01', 24), ('giraffe.n.01', 25), ('backpack.n.01', 27),
    ('umbrella.n.01', 28), ('bag.n.04', 31), ('necktie.n.01', 32),
    ('bag.n.06', 33), ('frisbee.n.01', 34), ('ski.n.01', 35),
    ('snowboard.n.01', 36), ('ball.n.06', 37), ('kite.n.03', 38),
    ('baseball_bat.n.01', 39), ('baseball_glove.n.01', 40),
    ('skateboard.n.01', 41), ('surfboard.n.01', 42), ('tennis_racket.n.01',
    43), ('bottle.n.01', 44), ('wineglass.n.01', 46), ('cup.n.01', 47),
    ('fork.n.01', 48), ('knife.n.01', 49), ('spoon.n.01', 50), ('bowl.n.03',
    51), ('banana.n.02', 52), ('apple.n.01', 53), ('sandwich.n.01', 54),
    ('orange.n.01', 55), ('broccoli.n.01', 56), ('carrot.n.01', 57),
    ('frank.n.02', 58), ('pizza.n.01', 59), ('doughnut.n.02', 60),
    ('cake.n.03', 61), ('chair.n.01', 62), ('sofa.n.01', 63), ('pot.n.04',
    64), ('bed.n.01', 65), ('dining_table.n.01', 67), ('toilet.n.02', 70),
    ('television_receiver.n.01', 72), ('laptop.n.01', 73), ('mouse.n.04',
    74), ('remote_control.n.01', 75), ('computer_keyboard.n.01', 76),
    ('cellular_telephone.n.01', 77), ('microwave.n.02', 78), ('oven.n.01',
    79), ('toaster.n.02', 80), ('sink.n.01', 81),
    ('electric_refrigerator.n.01', 82), ('book.n.01', 84), ('clock.n.01',
    85), ('vase.n.01', 86), ('scissors.n.01', 87), ('teddy.n.01', 88),
    ('hand_blower.n.01', 89), ('toothbrush.n.01', 90)
]


def cocofy_lvis(input_filename, output_filename):
    """Remap LVIS annotations/categories/image negatives onto COCO ids,
    dropping everything without a COCO synset (reference cocofy_lvis)."""
    with open(input_filename) as f:
        lvis_json = json.load(f)
    lvis_annos = lvis_json.pop('annotations')
    out = copy.deepcopy(lvis_json)
    lvis_json['annotations'] = lvis_annos

    id2synset = {c['id']: c['synset'] for c in lvis_json['categories']}
    synset2coco = dict(COCO_SYNSET_CATEGORIES)
    keep = set(synset2coco)
    seen = defaultdict(int)

    new_annos = []
    for ann in lvis_annos:
        synset = id2synset[ann['category_id']]
        if synset not in keep:
            continue
        new = copy.deepcopy(ann)
        new['category_id'] = synset2coco[synset]
        new['id'] = len(new_annos) + 1
        new_annos.append(new)
        seen[new['category_id']] += 1
    out['annotations'] = new_annos

    for image in out['images']:
        for key in ('not_exhaustive_category_ids', 'neg_category_ids'):
            new_list = []
            for cid in image.get(key, []):
                synset = id2synset[cid]
                if synset in keep:
                    new_list.append(synset2coco[synset])
                    seen[synset2coco[synset]] += 1
            image[key] = new_list

    out['categories'] = []
    for cat in lvis_json['categories']:
        synset = cat['synset']
        if synset not in keep or synset2coco[synset] not in seen:
            continue
        new = copy.deepcopy(cat)
        new['id'] = synset2coco[synset]
        out['categories'].append(new)

    with open(output_filename, 'w') as f:
        json.dump(out, f)
    print(f'{output_filename}: {len(new_annos)} annotations, '
          f'{len(out["categories"])} categories')


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('input')
    p.add_argument('output')
    a = p.parse_args()
    cocofy_lvis(a.input, a.output)
