"""TinyImagenet200 and Imagenet1000 datasets (reference nbdt/data/imagenet.py).

ImageFolder-style directory layouts loaded into memory (TinyImagenet, 64x64)
or iterated lazily (ImageNet). Downloads are attempted only on request
(reference imagenet.py:67-87 auto-downloads TinyImagenet; Imagenet1000
refuses to download, imagenet.py:142-150 — same here).
"""

from __future__ import annotations

import os
import zipfile
from pathlib import Path
from typing import List, Optional

import numpy as np

from .cifar import ArrayDataset
from .transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    TINYIMAGENET_MEAN,
    TINYIMAGENET_STD,
    InverseNormalize,
    make_train_transform,
    make_val_transform,
)

TINYIMAGENET_URL = "http://cs231n.stanford.edu/tiny-imagenet-200.zip"


class TinyImagenet200(ArrayDataset):
    """64x64, 200 classes (reference imagenet.py:19-123). Train is an
    ImageFolder; val labels come from ``val_annotations.txt``."""

    mean = TINYIMAGENET_MEAN
    std = TINYIMAGENET_STD

    def __init__(self, root: str = "./data", train: bool = True, download: bool = False):
        root = Path(root)
        base = root / "tiny-imagenet-200"
        if not base.exists() and download:
            self._download(root)
        if not base.exists():
            raise FileNotFoundError(
                f"TinyImagenet200 not found at {base}; download it with "
                f"network access or mount it there."
            )
        wnids = [w.strip() for w in open(base / "wnids.txt")]
        wnid_to_index = {w: i for i, w in enumerate(sorted(wnids))}
        classes = sorted(wnids)
        images, labels = [], []
        if train:
            for wnid in classes:
                img_dir = base / "train" / wnid / "images"
                for f in sorted(os.listdir(img_dir)):
                    images.append(self._read(img_dir / f))
                    labels.append(wnid_to_index[wnid])
        else:
            ann = {}
            with open(base / "val" / "val_annotations.txt") as fh:
                for line in fh:
                    parts = line.split("\t")
                    ann[parts[0]] = parts[1]
            img_dir = base / "val" / "images"
            for f in sorted(os.listdir(img_dir)):
                images.append(self._read(img_dir / f))
                labels.append(wnid_to_index[ann[f]])
        super().__init__(
            np.stack(images).astype(np.uint8), np.array(labels), classes
        )

    @staticmethod
    def _read(path) -> np.ndarray:
        from PIL import Image

        img = Image.open(path).convert("RGB")
        return np.asarray(img, dtype=np.uint8)

    @staticmethod
    def _download(root: Path) -> None:
        from urllib.request import urlretrieve

        root.mkdir(parents=True, exist_ok=True)
        archive = root / "tiny-imagenet-200.zip"
        if not archive.exists():
            urlretrieve(TINYIMAGENET_URL, str(archive))
        with zipfile.ZipFile(archive) as zf:
            zf.extractall(root)

    # transform_train/transform_val/transform_val_inverse are inherited
    # from ArrayDataset (cifar.py): the classmethods resolve cls.mean/std
    # to THIS class's constants, same crop_pad=4 recipe.


class Imagenet1000:
    """ImageFolder at imagenet-1000/{train,val} (reference imagenet.py:126-194).

    Lazy: samples are decoded per batch via the loader protocol
    (images/labels attributes are not materialized). Refuses to download.
    """

    mean = IMAGENET_MEAN
    std = IMAGENET_STD

    def __init__(self, root: str = "./data", train: bool = True, download: bool = False):
        if download:
            raise RuntimeError(
                "Imagenet1000 must be downloaded manually "
                "(reference imagenet.py:142-150)."
            )
        base = Path(root) / "imagenet-1000" / ("train" if train else "val")
        if not base.exists():
            raise FileNotFoundError(f"Imagenet1000 not found at {base}")
        self.base = base
        self.classes = sorted(d.name for d in base.iterdir() if d.is_dir())
        self.class_to_index = {c: i for i, c in enumerate(self.classes)}
        self.samples = [
            (p, self.class_to_index[d.name])
            for d in sorted(base.iterdir())
            if d.is_dir()
            for p in sorted(d.iterdir())
        ]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        from PIL import Image

        path, label = self.samples[i]
        img = Image.open(path).convert("RGB").resize((224, 224))
        return np.asarray(img, dtype=np.uint8), label

    @classmethod
    def transform_train(cls, seed: int = 0, device_normalize: bool = False):
        return make_train_transform(cls.mean, cls.std, crop_pad=0, seed=seed,
                                    device_normalize=device_normalize)

    @classmethod
    def transform_val(cls, device_normalize: bool = False):
        return make_val_transform(cls.mean, cls.std,
                                  device_normalize=device_normalize)

    @classmethod
    def transform_val_inverse(cls):
        return InverseNormalize(cls.mean, cls.std)
