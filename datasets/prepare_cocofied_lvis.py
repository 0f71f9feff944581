#!/usr/bin/env python3
"""COCOfy LVIS annotations: keep only the 80 LVIS categories with a COCO
counterpart and relabel them with the (incontiguous) COCO dataset ids, so
COCO-style AP can be computed on LVIS data with the plain COCO evaluator.

The synset->COCO-id table is the official lvis-api ``coco_to_synset.json``
mapping (public spec data; reference counterpart
``datasets/prepare_cocofied_lvis.py``).  Annotations whose category has no
COCO synset are dropped; per-image ``not_exhaustive_category_ids`` /
``neg_category_ids`` lists are remapped the same way; categories that end up
with zero instances are removed.

Usage: python datasets/prepare_cocofied_lvis.py [--root $JTSM_DATASETS/lvis]
"""

import argparse
import copy
import json
import os
from collections import Counter

# WordNet synset -> COCO dataset category id (the 80 COCO things).
SYNSET_TO_COCO_ID = {
    "person.n.01": 1, "bicycle.n.01": 2, "car.n.01": 3, "motorcycle.n.01": 4,
    "airplane.n.01": 5, "bus.n.01": 6, "train.n.01": 7, "truck.n.01": 8,
    "boat.n.01": 9, "traffic_light.n.01": 10, "fireplug.n.01": 11, "stop_sign.n.01": 13,
    "parking_meter.n.01": 14, "bench.n.01": 15, "bird.n.01": 16, "cat.n.01": 17,
    "dog.n.01": 18, "horse.n.01": 19, "sheep.n.01": 20, "beef.n.01": 21,
    "elephant.n.01": 22, "bear.n.01": 23, "zebra.n.01": 24, "giraffe.n.01": 25,
    "backpack.n.01": 27, "umbrella.n.01": 28, "bag.n.04": 31, "necktie.n.01": 32,
    "bag.n.06": 33, "frisbee.n.01": 34, "ski.n.01": 35, "snowboard.n.01": 36,
    "ball.n.06": 37, "kite.n.03": 38, "baseball_bat.n.01": 39, "baseball_glove.n.01": 40,
    "skateboard.n.01": 41, "surfboard.n.01": 42, "tennis_racket.n.01": 43, "bottle.n.01": 44,
    "wineglass.n.01": 46, "cup.n.01": 47, "fork.n.01": 48, "knife.n.01": 49,
    "spoon.n.01": 50, "bowl.n.03": 51, "banana.n.02": 52, "apple.n.01": 53,
    "sandwich.n.01": 54, "orange.n.01": 55, "broccoli.n.01": 56, "carrot.n.01": 57,
    "frank.n.02": 58, "pizza.n.01": 59, "doughnut.n.02": 60, "cake.n.03": 61,
    "chair.n.01": 62, "sofa.n.01": 63, "pot.n.04": 64, "bed.n.01": 65,
    "dining_table.n.01": 67, "toilet.n.02": 70, "television_receiver.n.01": 72, "laptop.n.01": 73,
    "mouse.n.04": 74, "remote_control.n.01": 75, "computer_keyboard.n.01": 76, "cellular_telephone.n.01": 77,
    "microwave.n.02": 78, "oven.n.01": 79, "toaster.n.02": 80, "sink.n.01": 81,
    "electric_refrigerator.n.01": 82, "book.n.01": 84, "clock.n.01": 85, "vase.n.01": 86,
    "scissors.n.01": 87, "teddy.n.01": 88, "hand_blower.n.01": 89, "toothbrush.n.01": 90,
}


def cocofy_lvis(input_json, output_json):
    with open(input_json) as f:
        lvis = json.load(f)

    synset_of = {c["id"]: c["synset"] for c in lvis["categories"]}

    def to_coco_id(lvis_cat_id):
        return SYNSET_TO_COCO_ID.get(synset_of[lvis_cat_id])

    out = {k: copy.deepcopy(v) for k, v in lvis.items() if k != "annotations"}
    used = Counter()

    annos = []
    for ann in lvis["annotations"]:
        coco_id = to_coco_id(ann["category_id"])
        if coco_id is None:
            continue
        ann = copy.deepcopy(ann)
        ann["category_id"] = coco_id
        ann["id"] = len(annos) + 1
        used[coco_id] += 1
        annos.append(ann)
    out["annotations"] = annos

    for image in out["images"]:
        for key in ("not_exhaustive_category_ids", "neg_category_ids"):
            remapped = []
            for lvis_cat_id in image.get(key, []):
                coco_id = to_coco_id(lvis_cat_id)
                if coco_id is not None:
                    remapped.append(coco_id)
                    used[coco_id] += 1
            image[key] = remapped

    cats = []
    for cat in lvis["categories"]:
        coco_id = SYNSET_TO_COCO_ID.get(cat["synset"])
        if coco_id is None or coco_id not in used:
            continue
        cat = copy.deepcopy(cat)
        cat["id"] = coco_id
        cats.append(cat)
    out["categories"] = cats

    with open(output_json, "w") as f:
        json.dump(out, f)
    print(f"{input_json}: kept {len(annos)} annotations / {len(cats)} categories "
          f"-> {output_json}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--root", default=os.path.join(os.getenv("JTSM_DATASETS", "datasets"), "lvis")
    )
    ap.add_argument("--splits", nargs="*", default=["lvis_v0.5_train", "lvis_v0.5_val"])
    args = ap.parse_args()
    for split in args.splits:
        src = os.path.join(args.root, f"{split}.json")
        if not os.path.isfile(src):
            print(f"skip {split}: {src} not found")
            continue
        cocofy_lvis(src, os.path.join(args.root, f"{split}_cocofied.json"))


if __name__ == "__main__":
    main()
