"""Batch-level numpy transforms (TPU-friendly input pipeline).

The reference uses per-sample torchvision transforms (reference
cifar.py:10-38, imagenet.py:38-65). Here augmentation operates on whole
uint8 numpy batches on the host — vectorized crop/flip/normalize — and
ships normalized NHWC float32 to the device. Normalization constants are
the reference's exactly.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# Reference cifar.py:12-31
CIFAR_MEAN = np.array([0.4914, 0.4822, 0.4465], dtype=np.float32)
CIFAR_STD = np.array([0.2023, 0.1994, 0.2010], dtype=np.float32)
# Reference imagenet.py:38-65 (TinyImagenet200)
TINYIMAGENET_MEAN = np.array([0.4802, 0.4481, 0.3975], dtype=np.float32)
TINYIMAGENET_STD = np.array([0.2302, 0.2265, 0.2262], dtype=np.float32)
# Reference imagenet.py:152-178 (ImageNet-1000, torchvision standard)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize(batch_u8: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """uint8 NHWC -> normalized float32 NHWC."""
    x = batch_u8.astype(np.float32) / 255.0
    return (x - mean) / std


def random_crop(batch: np.ndarray, pad: int, rng: np.random.RandomState) -> np.ndarray:
    """Pad-and-random-crop, vectorized over the batch (reference
    RandomCrop(32, padding=4))."""
    n, h, w, c = batch.shape
    padded = np.pad(
        batch, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="constant"
    )
    ys = rng.randint(0, 2 * pad + 1, size=n)
    xs = rng.randint(0, 2 * pad + 1, size=n)
    out = np.empty_like(batch)
    for off in range(2 * pad + 1):
        # group samples sharing a y-offset to slice in bulk
        sel = ys == off
        if sel.any():
            rows = padded[sel, off : off + h]
            xoff = xs[sel]
            for xo in np.unique(xoff):
                sub = xoff == xo
                idx = np.flatnonzero(sel)[sub]
                out[idx] = rows[sub][:, :, xo : xo + w]
    return out


def random_hflip(batch: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    flips = rng.rand(batch.shape[0]) < 0.5
    out = batch.copy()
    out[flips] = out[flips, :, ::-1]
    return out


class InverseNormalize:
    """Un-normalize for analyzer image dumps (reference transforms.py:4-15)."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, batch: np.ndarray) -> np.ndarray:
        return np.asarray(batch) * self.std + self.mean


def apply_augment_numpy(
    batch_u8: np.ndarray,
    pad: int,
    ys: np.ndarray,
    xs: np.ndarray,
    flips: np.ndarray,
    mean: np.ndarray,
    std: np.ndarray,
) -> np.ndarray:
    """Reference-semantics pad+crop+flip+normalize with explicit offsets —
    the numpy twin of the native kernel (nbdt_tpu/native/augment.cpp), used
    as its fallback and its parity oracle."""
    return normalize(augment_uint8(batch_u8, pad, ys, xs, flips), mean, std)


def make_train_transform(mean, std, crop_pad: int = 4, hflip: bool = True,
                         seed: int = 0, device_normalize: bool = False):
    """Fused train-time augmentation. Uses the native C++ kernel when
    available (single pass, OpenMP), else the vectorized numpy path; both
    consume identical RNG draws so results match bit-for-bit.

    ``device_normalize=True`` keeps the output uint8 (crop/flip only) so the
    loader ships 4x fewer bytes to the device and the jitted step normalizes
    there (Trainer ``device_normalize=``) — the transfer, not the float
    conversion, is what bounds PCIe/tunnel-attached training."""
    from .. import native

    rng = np.random.RandomState(seed)
    mean = np.asarray(mean, dtype=np.float32)
    std = np.asarray(std, dtype=np.float32)
    use_native = native.available() and not device_normalize

    def transform(batch_u8: np.ndarray) -> np.ndarray:
        if not crop_pad and not hflip:
            return batch_u8 if device_normalize else normalize(batch_u8, mean, std)
        if use_native:
            out = native.augment_batch(batch_u8, crop_pad, mean, std, rng,
                                       hflip=hflip)
            if out is not None:
                return out
        n = batch_u8.shape[0]
        ys = rng.randint(0, 2 * crop_pad + 1, size=n).astype(np.int32)
        xs = rng.randint(0, 2 * crop_pad + 1, size=n).astype(np.int32)
        flips = (
            (rng.rand(n) < 0.5).astype(np.uint8)
            if hflip else np.zeros(n, dtype=np.uint8)
        )
        if device_normalize:
            return augment_uint8(batch_u8, crop_pad, ys, xs, flips)
        return apply_augment_numpy(batch_u8, crop_pad, ys, xs, flips, mean, std)

    return transform


def augment_uint8(batch_u8, pad, ys, xs, flips) -> np.ndarray:
    """pad+crop+flip in uint8 (no normalize) — the device-normalize twin of
    :func:`apply_augment_numpy`, identical offsets/flips semantics.

    Vectorized by (y, x)-offset groups like :func:`random_crop`: at most
    (2*pad+1)^2 bulk slices instead of a per-image Python loop — this IS
    the hot host path of ``--device-normalize`` training (the native
    kernel only serves the fused normalize variant)."""
    n, h, w, c = batch_u8.shape
    padded = np.pad(batch_u8, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = np.empty((n, h, w, c), dtype=np.uint8)
    for yo in np.unique(ys):
        sel = ys == yo
        rows = padded[sel, yo : yo + h]
        xoff = xs[sel]
        for xo in np.unique(xoff):
            sub = xoff == xo
            idx = np.flatnonzero(sel)[sub]
            out[idx] = rows[sub][:, :, xo : xo + w]
    fl = flips.astype(bool)
    out[fl] = out[fl, :, ::-1]
    return out


def make_val_transform(mean, std, device_normalize: bool = False):
    from .. import native

    mean = np.asarray(mean, dtype=np.float32)
    std = np.asarray(std, dtype=np.float32)

    def transform(batch_u8: np.ndarray) -> np.ndarray:
        if device_normalize:
            return batch_u8
        out = native.normalize_batch(batch_u8, mean, std)
        return out if out is not None else normalize(batch_u8, mean, std)

    return transform
