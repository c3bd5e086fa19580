"""CIFAR10/100 datasets (reference nbdt/data/cifar.py semantics).

Loads the standard python-pickle CIFAR batches from disk; download is
attempted only when explicitly requested (offline TPU pods have no egress).
When no data is present, :class:`SyntheticDataset` provides a drop-in with
the same shapes for tests and benchmarks.
"""

from __future__ import annotations

import os
import pickle
import tarfile
from pathlib import Path
from typing import List, Optional

import numpy as np

from .transforms import (
    CIFAR_MEAN,
    CIFAR_STD,
    InverseNormalize,
    make_train_transform,
    make_val_transform,
)

CIFAR10_URL = "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz"
CIFAR100_URL = "https://www.cs.toronto.edu/~kriz/cifar-100-python.tar.gz"

CIFAR10_CLASSES = [
    "airplane", "automobile", "bird", "cat", "deer",
    "dog", "frog", "horse", "ship", "truck",
]


class ArrayDataset:
    """In-memory uint8 image dataset: images [N, H, W, 3], labels [N]."""

    mean = CIFAR_MEAN
    std = CIFAR_STD

    def __init__(self, images: np.ndarray, labels: np.ndarray, classes: List[str]):
        assert images.ndim == 4 and images.dtype == np.uint8
        self.images = images
        self.labels = np.asarray(labels, dtype=np.int64)
        self.classes = list(classes)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return self.images[i], int(self.labels[i])

    @classmethod
    def transform_train(cls, seed: int = 0, device_normalize: bool = False):
        return make_train_transform(cls.mean, cls.std, crop_pad=4, seed=seed,
                                    device_normalize=device_normalize)

    @classmethod
    def transform_val(cls, device_normalize: bool = False):
        return make_val_transform(cls.mean, cls.std,
                                  device_normalize=device_normalize)

    @classmethod
    def transform_val_inverse(cls):
        return InverseNormalize(cls.mean, cls.std)


def _maybe_download(url: str, root: Path, download: bool) -> None:
    fname = root / url.rsplit("/", 1)[-1]
    if fname.exists():
        return
    if not download:
        return
    from urllib.request import urlretrieve

    root.mkdir(parents=True, exist_ok=True)
    urlretrieve(url, str(fname))


def _extract(root: Path, tar_name: str, member_dir: str) -> None:
    extracted = root / member_dir
    archive = root / tar_name
    if extracted.exists() or not archive.exists():
        return
    with tarfile.open(archive) as tf:
        tf.extractall(root)


class CIFAR10(ArrayDataset):
    """CIFAR10 from python-pickle batches (reference cifar.py:41-43)."""

    url = CIFAR10_URL
    dir_name = "cifar-10-batches-py"

    def __init__(self, root: str = "./data", train: bool = True, download: bool = False):
        root = Path(root)
        _maybe_download(self.url, root, download)
        _extract(root, self.url.rsplit("/", 1)[-1], self.dir_name)
        base = root / self.dir_name
        if not base.exists():
            raise FileNotFoundError(
                f"CIFAR10 not found at {base}. Download it (python -c ... "
                f"download=True with network) or point --data-root at it."
            )
        if train:
            files = [base / f"data_batch_{i}" for i in range(1, 6)]
        else:
            files = [base / "test_batch"]
        images, labels = [], []
        for f in files:
            with open(f, "rb") as fh:
                entry = pickle.load(fh, encoding="latin1")
            images.append(entry["data"])
            labels.extend(entry.get("labels", entry.get("fine_labels", [])))
        data = np.concatenate(images).reshape(-1, 3, 32, 32)
        data = data.transpose(0, 2, 3, 1).astype(np.uint8)  # NHWC
        super().__init__(data, np.array(labels), CIFAR10_CLASSES)


class CIFAR100(ArrayDataset):
    """CIFAR100 from the python-pickle archive (reference cifar.py:44-46)."""

    url = CIFAR100_URL
    dir_name = "cifar-100-python"

    def __init__(self, root: str = "./data", train: bool = True, download: bool = False):
        root = Path(root)
        _maybe_download(self.url, root, download)
        _extract(root, self.url.rsplit("/", 1)[-1], self.dir_name)
        base = root / self.dir_name
        if not base.exists():
            raise FileNotFoundError(f"CIFAR100 not found at {base}.")
        fname = base / ("train" if train else "test")
        with open(fname, "rb") as fh:
            entry = pickle.load(fh, encoding="latin1")
        data = np.asarray(entry["data"]).reshape(-1, 3, 32, 32)
        data = data.transpose(0, 2, 3, 1).astype(np.uint8)
        with open(base / "meta", "rb") as fh:
            meta = pickle.load(fh, encoding="latin1")
        super().__init__(
            data, np.array(entry["fine_labels"]), meta["fine_label_names"]
        )


class LearnableSyntheticDataset(ArrayDataset):
    """Separable synthetic classes: per-class fixed random template blended
    with per-sample noise. Unlike :class:`SyntheticDataset` (pure noise,
    learnable only by memorization) this poses a real generalization task —
    ``train=False`` draws fresh samples from the same class templates, so a
    model that learns the classes scores high on held-out data. The offline
    stand-in for accuracy-bearing runs (no dataset downloads here).

    ``groups`` optionally gives the classes SUPERCLASS structure (one group
    index per class): each class template becomes a blend of a shared
    per-group template and its own unique component, so sibling classes
    look alike. This is what makes the zero-shot superclass flow
    (reference analysis.py:430-559: train with --exclude-labels, eval
    Superclass/SuperclassNBDT) testable offline — an excluded class's
    samples still resemble its trained siblings. ``group_blend`` is the
    weight of the class-unique component (0 = identical siblings,
    1 = no group structure). ``groups=None`` draws templates exactly as
    before (seed-compatible)."""

    def __init__(
        self,
        num_classes: int = 10,
        size: int = 512,
        image_size: int = 32,
        seed: int = 0,
        noise: float = 0.35,
        train: bool = True,
        classes: Optional[List[str]] = None,
        groups: Optional[List[int]] = None,
        group_blend: float = 0.5,
    ):
        trng = np.random.RandomState(seed)  # templates: shared train/test
        templates = trng.randint(
            0, 256, (num_classes, image_size, image_size, 3)
        ).astype(np.float32)
        if groups is not None:
            groups = np.asarray(groups)
            if len(groups) != num_classes:
                raise ValueError(
                    f"groups must give one group per class: "
                    f"{len(groups)} != {num_classes}"
                )
            group_templates = trng.randint(
                0, 256, (int(groups.max()) + 1, image_size, image_size, 3)
            ).astype(np.float32)
            templates = (
                (1.0 - group_blend) * group_templates[groups]
                + group_blend * templates
            )
        srng = np.random.RandomState(seed + (1 if train else 2))
        labels = srng.randint(0, num_classes, size)
        noise_imgs = srng.randint(
            0, 256, (size, image_size, image_size, 3)
        ).astype(np.float32)
        images = (
            (1.0 - noise) * templates[labels] + noise * noise_imgs
        ).astype(np.uint8)
        classes = classes or [f"class{i}" for i in range(num_classes)]
        super().__init__(images, labels, classes)


class SyntheticDataset(ArrayDataset):
    """Random uint8 images with deterministic labels — shape-compatible
    stand-in when no real data is on disk (tests, offline benchmarks)."""

    def __init__(
        self,
        num_classes: int = 10,
        size: int = 512,
        image_size: int = 32,
        seed: int = 0,
        classes: Optional[List[str]] = None,
    ):
        rng = np.random.RandomState(seed)
        images = rng.randint(
            0, 256, size=(size, image_size, image_size, 3), dtype=np.uint8
        )
        labels = rng.randint(0, num_classes, size=size)
        classes = classes or [f"class{i}" for i in range(num_classes)]
        super().__init__(images, labels, classes)
