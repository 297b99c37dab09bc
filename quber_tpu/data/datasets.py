"""Dataset registration and perturbed-panoptic JSON loading.

Mirrors the reference's dataset layer
(/root/reference/maskrefiner/data/datasets/register_uoais_sim_panoptic.py:
30-120): a registry mapping dataset names to loader functions that join the
COCO-panoptic `images` and `annotations` records and pull the
`perturbed_segmentation` RLE list plus the 8 TP/TN/FP/FN error-map RLEs into
per-image dicts. Registered names follow the reference:
uoais_sim_{train,val}_panoptic, tod_v2_{train,val}_panoptic,
armbench_{train,test}_panoptic.
"""

from __future__ import annotations

import json
import os

DATASET_REGISTRY: dict = {}

EEE_KEYS = [
    "tp_mask", "tn_mask", "fp_mask", "fn_mask",
    "tp_boundary", "tn_boundary", "fp_boundary", "fn_boundary",
]


def register_dataset(name: str, loader, metadata: dict | None = None):
    DATASET_REGISTRY[name] = {"loader": loader, "metadata": metadata or {}}


def get_dataset(name: str) -> list[dict]:
    return DATASET_REGISTRY[name]["loader"]()


def get_metadata(name: str) -> dict:
    return DATASET_REGISTRY[name]["metadata"]


def load_perturbed_panoptic_json(
    json_file: str, image_root: str, panoptic_root: str
) -> list[dict]:
    """Join images and annotations into dataset dicts with perturbed masks and
    error-map RLEs (register_uoais_sim_panoptic.py:63-120)."""
    with open(json_file) as f:
        coco = json.load(f)
    anns_by_image = {a["image_id"]: a for a in coco.get("annotations", [])}
    out = []
    for img in coco["images"]:
        ann = anns_by_image.get(img["id"], {})
        record = {
            "image_id": img["id"],
            "file_name": os.path.join(image_root, img["file_name"]),
            "pan_seg_file_name": os.path.join(
                panoptic_root, ann.get("file_name", img["file_name"]).replace(".jpg", ".png")
            ),
            "height": img.get("height"),
            "width": img.get("width"),
            "segments_info": ann.get("segments_info", []),
            "perturbed_segmentation": img.get("perturbed_segmentation", []),
        }
        if "depth_file_name" in img:
            record["depth_file_name"] = os.path.join(image_root, img["depth_file_name"])
        for key in EEE_KEYS:
            if key in img:
                record[key] = img[key]
        out.append(record)
    return out


UOAIS_METADATA = {
    "thing_classes": ["object"],
    "thing_dataset_id_to_contiguous_id": {1: 0},
    "stuff_classes": [],
    "label_divisor": 1000,
    "ignore_label": 255,
}


def register_standard_datasets(data_root: str = "datasets"):
    """Register the reference dataset names against a data root
    (register_uoais_sim_panoptic.py:30-61 layout)."""
    specs = {
        "uoais_sim_train_panoptic": (
            "UOAIS-Sim/annotations/coco_anns_panoptic_uoais_sim_train_perturbed.json",
            "UOAIS-Sim/train", "UOAIS-Sim/train/panoptic_annos",
        ),
        "uoais_sim_val_panoptic": (
            "UOAIS-Sim/annotations/coco_anns_panoptic_uoais_sim_val_perturbed.json",
            "UOAIS-Sim/val", "UOAIS-Sim/val/panoptic_annos",
        ),
        "tod_v2_train_panoptic": (
            "TODv2/annotations/train_panoptic_perturbed.json",
            "TODv2/train", "TODv2/train/panoptic",
        ),
        "armbench_train_panoptic": (
            "armbench/mix-object-tote/train_panoptic_perturbed.json",
            "armbench/mix-object-tote/images", "armbench/train",
        ),
        "armbench_test_panoptic": (
            "armbench/mix-object-tote/test_panoptic_perturbed.json",
            "armbench/mix-object-tote/images", "armbench/test",
        ),
    }
    for name, (json_rel, img_rel, pan_rel) in specs.items():
        json_file = os.path.join(data_root, json_rel)
        register_dataset(
            name,
            (lambda jf=json_file, ir=os.path.join(data_root, img_rel),
                    pr=os.path.join(data_root, pan_rel):
                load_perturbed_panoptic_json(jf, ir, pr)),
            UOAIS_METADATA,
        )


def rgb2id(color) -> "np.ndarray":
    """Panoptic PNG color -> segment id (panopticapi convention)."""
    import numpy as np

    color = np.asarray(color, dtype=np.uint32)
    return color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]
