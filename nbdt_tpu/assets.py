"""Built-in dataset class metadata.

The reference ships per-dataset wnid lists (``nbdt/wnids/*.txt``, one wnid
per line in dataset class order) and pre-generated hierarchy JSONs. In this
rebuild, small metadata is embedded as Python constants; larger assets are
either regenerated (``nbdt-hierarchy`` / ``nbdt-wnids`` CLIs) or imported
from an existing reference checkout via ``tools/import_assets.py``.

WNIDs are WordNet identities of the dataset classes — e.g. CIFAR10's class 0
("airplane") is synset n02691156. Class order is the dataset's label order.
"""

from __future__ import annotations

import os
from typing import List, Optional

from .utils import DATASET_TO_NUM_CLASSES, dataset_to_default_path_wnids

# CIFAR10 class -> wnid, in label order (parity fixture for the flagship
# config; see reference nbdt/wnids/CIFAR10.txt and utils.py:41-54).
CIFAR10_WNIDS = [
    "n02691156",  # airplane
    "n02958343",  # automobile (car)
    "n01503061",  # bird
    "n02121620",  # cat
    "n02430045",  # deer
    "n02084071",  # dog
    "n01639765",  # frog
    "n02374451",  # horse
    "n04194289",  # ship
    "n04490091",  # truck
]

DATASET_TO_WNIDS = {
    "CIFAR10": CIFAR10_WNIDS,
}


def dataset_to_dummy_wnids(dataset: str) -> List[str]:
    """FakeSynset wnids (f########) in class order (reference tree.py:20-23)."""
    num_classes = DATASET_TO_NUM_CLASSES[dataset]
    return ["f{:08d}".format(i) for i in range(num_classes)]


def get_dataset_wnids(dataset: str, path_wnids: Optional[str] = None) -> List[str]:
    """Resolve a dataset's wnid list: explicit file > packaged file >
    embedded constants > FakeSynset dummies."""
    from .hierarchy.wnid import get_wnids

    if path_wnids and os.path.exists(str(path_wnids)):
        return get_wnids(path_wnids)
    default = dataset_to_default_path_wnids(dataset)
    if os.path.exists(default):
        return get_wnids(default)
    if dataset in DATASET_TO_WNIDS:
        return list(DATASET_TO_WNIDS[dataset])
    return dataset_to_dummy_wnids(dataset)
