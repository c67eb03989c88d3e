"""Dataset registry and factory.

Parity target: /root/reference/src/eoe/datasets/__init__.py — DS_CHOICES
registry (:21-145), DS_PARTS / MSM multiscale specs (:147-221), and the
``load_dataset`` factory (:237-341) that builds the normal dataset, an
optional OE dataset (flipped train label, deep-copied pipeline specs, MSM
conditional transforms, OE class subsampling) and wraps them in a
CombinedDataset.
"""

import importlib
from copy import deepcopy
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from eoe_tpu.datasets.bases import INF, ADDataset, CombinedDataset

# string ids of the filter transforms usable in MSMs (transformations.py:20)
MSM_TRANSFORMS = ("blur", "sharpen", "hpf", "lpf")

TRAIN_NOMINAL_ID = 0
TRAIN_OE_ID = 1
TEST_NOMINAL_ID = 2
TEST_ANOMALOUS_ID = 3
DS_PARTS = {
    "train_nominal": TRAIN_NOMINAL_ID, "train_oe": TRAIN_OE_ID,
    "test_nominal": TEST_NOMINAL_ID, "test_anomalous": TEST_ANOMALOUS_ID,
}

CIFAR10_LABELS = ["airplane", "automobile", "bird", "cat", "deer", "dog", "frog", "horse", "ship", "truck"]
MNIST_LABELS = ["zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine"]
FMNIST_LABELS = ["top", "trouser", "pullover", "dress", "coat", "sandal", "shirt", "sneaker", "bag", "ankle_boot"]
IMAGENET30_LABELS = [
    "acorn", "airliner", "ambulance", "american_alligator", "banjo", "barn", "bikini", "digital_clock",
    "dragonfly", "dumbbell", "forklift", "goblet", "grand_piano", "hotdog", "hourglass", "manhole_cover",
    "mosque", "nail", "parking_meter", "pillow", "revolver", "rotary_dial_telephone", "schooner",
    "snowmobile", "soccer_ball", "stingray", "strawberry", "tank", "toaster", "volcano",
]
MVTEC_LABELS = [
    "bottle", "cable", "capsule", "carpet", "grid", "hazelnut", "leather", "metal_nut", "pill",
    "screw", "tile", "toothbrush", "transistor", "wood", "zipper",
]
DTD_LABELS = [
    "banded", "blotchy", "braided", "bubbly", "bumpy", "chequered", "cobwebbed", "cracked", "crosshatched",
    "crystalline", "dotted", "fibrous", "flecked", "freckled", "frilly", "gauzy", "grid", "grooved",
    "honeycombed", "interlaced", "knitted", "lacelike", "lined", "marbled", "matted", "meshed", "paisley",
    "perforated", "pitted", "pleated", "polka-dotted", "porous", "potholed", "scaly", "smeared", "spiralled",
    "sprinkled", "stained", "stratified", "striped", "studded", "swirly", "veined", "waffled", "woven",
    "wrinkled", "zigzagged",
]
CIFAR100_LABELS = [
    "beaver", "dolphin", "otter", "seal", "whale",
    "aquarium_fish", "flatfish", "ray", "shark", "trout",
    "orchid", "poppy", "rose", "sunflower", "tulip",
    "bottle", "bowl", "can", "cup", "plate",
    "apple", "mushroom", "orange", "pear", "sweet_pepper",
    "clock", "keyboard", "lamp", "telephone", "television",
    "bed", "chair", "couch", "table", "wardrobe",
    "bee", "beetle", "butterfly", "caterpillar", "cockroach",
    "bear", "leopard", "lion", "tiger", "wolf",
    "bridge", "castle", "house", "road", "skyscraper",
    "cloud", "forest", "mountain", "plain", "sea",
    "camel", "cattle", "chimpanzee", "elephant", "kangaroo",
    "fox", "porcupine", "possum", "raccoon", "skunk",
    "crab", "lobster", "snail", "spider", "worm",
    "baby", "boy", "girl", "man", "woman",
    "crocodile", "dinosaur", "lizard", "snake", "turtle",
    "hamster", "mouse", "rabbit", "shrew", "squirrel",
    "maple_tree", "oak_tree", "palm_tree", "pine_tree", "willow_tree",
    "bicycle", "bus", "motorcycle", "pickup_truck", "train",
    "lawn_mower", "rocket", "streetcar", "tank", "tractor",
]

# registry entries: module + class name are resolved lazily so that optional
# datasets (big folder pipelines) don't burden import time
DS_CHOICES: Dict[str, dict] = {
    "cifar10": dict(module="eoe_tpu.datasets.cifar", cls="ADCIFAR10", default_size=32,
                    no_classes=10, oe_only=False, str_labels=CIFAR10_LABELS),
    "cifar100": dict(module="eoe_tpu.datasets.cifar", cls="ADCIFAR100", default_size=32,
                     no_classes=100, oe_only=False, str_labels=CIFAR100_LABELS),
    "mnist": dict(module="eoe_tpu.datasets.mnist", cls="ADMNIST", default_size=28,
                  no_classes=10, oe_only=False, str_labels=MNIST_LABELS),
    "emnist": dict(module="eoe_tpu.datasets.mnist", cls="ADEMNIST", default_size=28,
                   no_classes=26, oe_only=False, str_labels=[str(i) for i in range(26)]),
    "fmnist": dict(module="eoe_tpu.datasets.mnist", cls="ADFMNIST", default_size=28,
                   no_classes=10, oe_only=False, str_labels=FMNIST_LABELS),
    "imagenet": dict(module="eoe_tpu.datasets.imagenet", cls="ADImageNet", default_size=256,
                     no_classes=30, oe_only=False, str_labels=IMAGENET30_LABELS),
    "imagenet21k": dict(module="eoe_tpu.datasets.imagenet", cls="ADImageNet21k", default_size=256,
                        no_classes=21811, oe_only=False, str_labels=[str(i) for i in range(21811)]),
    "imagenet21ksubset": dict(module="eoe_tpu.datasets.imagenet", cls="ADImageNet21kSubSet", default_size=256,
                              no_classes=21811, oe_only=False, str_labels=[str(i) for i in range(21811)]),
    "imagenetoe": dict(module="eoe_tpu.datasets.imagenetoe", cls="ADImageNetOE", default_size=256,
                       no_classes=1000, oe_only=True, str_labels=[str(i) for i in range(1000)]),
    "tinyimages": dict(module="eoe_tpu.datasets.tinyimages", cls="ADTinyImages", default_size=32,
                       no_classes=1, oe_only=False, str_labels=["tiny_image"]),
    "mvtec": dict(module="eoe_tpu.datasets.mvtec", cls="ADMvTec", default_size=256,
                  no_classes=15, oe_only=False, str_labels=MVTEC_LABELS),
    "dtd": dict(module="eoe_tpu.datasets.dtd", cls="ADDTD", default_size=256,
                no_classes=47, oe_only=False, str_labels=DTD_LABELS),
    "cub": dict(module="eoe_tpu.datasets.cub", cls="ADCUB", default_size=256,
                no_classes=200, oe_only=False, str_labels=None),  # resolved lazily from cub module
    "custom": dict(module="eoe_tpu.datasets.custom", cls="ADCustomDS", default_size=256,
                   no_classes=None, oe_only=False, str_labels=None),  # determined from folder layout
}


def _resolve_class(name: str):
    entry = DS_CHOICES[name]
    mod = importlib.import_module(entry["module"])
    return getattr(mod, entry["cls"])


def no_classes(dataset_name: str) -> int:
    n = DS_CHOICES[dataset_name]["no_classes"]
    if n is None:
        raise ValueError(f"number of classes of '{dataset_name}' depends on the data folder; "
                         f"use ADCustomDS.determine_classes")
    return n


def str_labels(dataset_name: str) -> List[str]:
    labels = DS_CHOICES[dataset_name]["str_labels"]
    if labels is None and dataset_name == "cub":
        labels = importlib.import_module("eoe_tpu.datasets.cub").cub_labels()
    if labels is None:
        raise ValueError(f"class labels of '{dataset_name}' depend on the data folder")
    return labels


class MSM:
    """Multi-scale mode: a filter transform applied to one dataset part
    (parity: datasets/__init__.py:157-224). String form 'TRANSFORM+DSPART--M'."""

    def __init__(self, transform: str, ds_part: str, magnitude: Optional[int] = None):
        assert transform in MSM_TRANSFORMS, f"{transform} not in {MSM_TRANSFORMS}"
        assert ds_part in DS_PARTS, f"{ds_part} not in {list(DS_PARTS)}"
        self.transform_str = transform
        self.ds_part_str = ds_part
        self.ds_part = DS_PARTS[ds_part]
        self.magnitude = magnitude

    def set_magnitude(self, magnitude: int) -> "MSM":
        self.magnitude = magnitude
        return self

    def get_spec(self) -> dict:
        """The transform spec dict for ops.preprocess.compile_pipeline."""
        assert self.magnitude is not None, "MSM magnitude not set"
        if self.transform_str == "blur":
            return {"op": "blur", "sigma": float(self.magnitude)}
        if self.transform_str == "sharpen":
            return {"op": "sharpen", "percent": float(self.magnitude) * 100.0}
        return {"op": self.transform_str, "magnitude": int(self.magnitude)}

    def __str__(self):
        return "+".join((self.transform_str, self.ds_part_str)) + f"--M{self.magnitude}"

    __repr__ = __str__

    @staticmethod
    def load(msm: str, load_magnitude: bool = True) -> "MSM":
        transform, ds_part = msm.split("+")
        magnitude = None
        if "--M" in ds_part:
            ds_part, magnitude = ds_part.split("--M")
        res = MSM(transform, ds_part)
        if load_magnitude and magnitude is not None and magnitude != "None":
            res.set_magnitude(int(magnitude))
        return res


def get_raw_shape(train_specs: Sequence, dataset_name: str) -> Tuple[int, int, int]:
    """Raw data shape from the first resize spec, else the registry default
    (parity: datasets/__init__.py:226-234). NHWC here."""
    specs = list(train_specs or ())
    if specs:
        s = specs[0] if isinstance(specs[0], dict) else {"op": specs[0]}
        if s.get("op") == "resize":
            size = s["size"]
            if isinstance(size, int):
                return (size, size, 3)
            return (*tuple(size), 3)
    size = DS_CHOICES[dataset_name]["default_size"]
    return (size, size, 3)


def load_dataset(dataset_name: str, data_path: str, normal_classes: List[int], nominal_label: int,
                 train_specs: Sequence, test_specs: Sequence, logger=None,
                 oe_name: Optional[str] = None,
                 oe_limit_samples: Union[int, float, Sequence[int]] = INF,
                 oe_limit_classes: Union[int, float] = INF,
                 msms: Sequence[MSM] = (), ds_statistics: Optional[dict] = None,
                 rng: Optional[np.random.Generator] = None) -> Union[ADDataset, CombinedDataset]:
    """Build the normal dataset (+ optional OE dataset -> CombinedDataset).

    Matches the reference factory's semantics (datasets/__init__.py:237-341):
    the OE dataset reuses the normal dataset's pipeline specs and statistics,
    trains with the flipped label, owns `limit_samples`, and can be limited to
    a random subset of its classes. MSMs become label-conditional pipelines on
    the respective dataset part.
    """
    assert dataset_name in DS_CHOICES, f"{dataset_name} is not in {sorted(DS_CHOICES)}"
    rng = rng if rng is not None else np.random.default_rng()
    raw_shape = get_raw_shape(train_specs, dataset_name)

    train_conditional = [
        (nominal_label, [m.get_spec()], None) for m in msms if m.ds_part == TRAIN_NOMINAL_ID
    ]
    test_conditional = [
        (nominal_label,
         [m.get_spec()] if m.ds_part == TEST_NOMINAL_ID else None,
         [m.get_spec()] if m.ds_part == TEST_ANOMALOUS_ID else None)
        for m in msms if m.ds_part in (TEST_NOMINAL_ID, TEST_ANOMALOUS_ID)
    ]

    if DS_CHOICES[dataset_name]["oe_only"]:
        raise ValueError(f"{dataset_name} can only be used as OE!")
    cls = _resolve_class(dataset_name)
    dataset = cls(
        data_path, list(normal_classes), nominal_label, list(train_specs or ()), list(test_specs or ()),
        raw_shape, logger, INF, train_conditional, test_conditional, ds_statistics, rng)

    if oe_name is None:
        return dataset

    oe_cls = _resolve_class(oe_name)
    n_oe_classes = DS_CHOICES[oe_name]["no_classes"]
    is_custom_oe = dataset_name == "custom" and oe_name == "custom"
    if is_custom_oe:
        if oe_limit_classes < INF:
            raise ValueError(
                "Using the custom dataset with its own OE part cannot be combined with limiting the OE classes.")
        oe_classes = list(normal_classes)
        oe_label = nominal_label
    else:
        if oe_limit_classes < INF and n_oe_classes is not None:
            oe_classes = sorted(rng.choice(
                np.arange(n_oe_classes), min(n_oe_classes, int(oe_limit_classes)), replace=False).tolist())
        else:
            oe_classes = list(range(n_oe_classes)) if n_oe_classes is not None else []
        oe_label = 1 - nominal_label

    oe_train_conditional = [
        (nominal_label, [m.get_spec()], [m.get_spec()]) for m in msms if m.ds_part == TRAIN_OE_ID
    ]
    oe_kwargs = {}
    if is_custom_oe:
        oe_kwargs["oe"] = True
    oe = oe_cls(
        data_path, oe_classes, oe_label, deepcopy(dataset.train_specs), deepcopy(dataset.test_specs),
        raw_shape, logger, oe_limit_samples, oe_train_conditional, None,
        dataset.ds_statistics, rng, **oe_kwargs)
    return CombinedDataset(dataset, oe)
