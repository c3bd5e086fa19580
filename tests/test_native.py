"""Native C++ input-pipeline kernels vs their numpy oracles."""

import numpy as np
import pytest

from nbdt_tpu import native
from nbdt_tpu.data.transforms import (
    CIFAR_MEAN,
    CIFAR_STD,
    apply_augment_numpy,
    make_train_transform,
    make_val_transform,
    normalize,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def batch(rng_local=np.random.RandomState(3)):
    return rng_local.randint(0, 256, (16, 32, 32, 3), dtype=np.uint8)


def test_augment_matches_numpy_oracle(batch):
    pad = 4
    n = batch.shape[0]
    rng = np.random.RandomState(0)
    ys = rng.randint(0, 2 * pad + 1, size=n).astype(np.int32)
    xs = rng.randint(0, 2 * pad + 1, size=n).astype(np.int32)
    flips = (rng.rand(n) < 0.5).astype(np.uint8)

    # native consumes the same draw sequence from a fresh rng
    class FixedRng:
        def __init__(self):
            self.calls = iter([ys, xs])

        def randint(self, lo, hi, size):
            return next(self.calls)

        def rand(self, n):
            return np.where(flips > 0, 0.0, 1.0)

    ours = native.augment_batch(batch, pad, CIFAR_MEAN, CIFAR_STD, FixedRng())
    ref = apply_augment_numpy(batch, pad, ys, xs, flips, CIFAR_MEAN, CIFAR_STD)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)


def test_normalize_matches_numpy(batch):
    ours = native.normalize_batch(batch, CIFAR_MEAN, CIFAR_STD)
    ref = normalize(batch, CIFAR_MEAN, CIFAR_STD)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)


def test_gather_matches_numpy(batch):
    idx = np.array([3, 1, 1, 15, 0], dtype=np.int64)
    ours = native.gather_batch_u8(batch, idx)
    np.testing.assert_array_equal(ours, batch[idx])


def test_transform_factories_run(batch):
    train_t = make_train_transform(CIFAR_MEAN, CIFAR_STD, seed=0)
    val_t = make_val_transform(CIFAR_MEAN, CIFAR_STD)
    out = train_t(batch)
    assert out.shape == batch.shape and out.dtype == np.float32
    np.testing.assert_allclose(
        val_t(batch), normalize(batch, CIFAR_MEAN, CIFAR_STD), atol=1e-6
    )
