"""SqueezeNet 1.0 / 1.1 in Flax (torchvision topology).

The reference's model zoo star-imports all of torchvision.models
(reference models/__init__.py:1-12), so ``--arch squeezenet1_0`` is valid
there; this provides the native equivalent. Fire modules (1x1 squeeze ->
parallel 1x1 + 3x3 expands, concatenated), a fully-convolutional
classifier head (``classifier.1`` 1x1 conv — one of the FC keys hierarchy
induction probes via its 2-D reshape), global average pool.

Flax module names mirror the torchvision Sequential indices
(``features.{i}`` -> ``f{i}[_...]``) so the converter mapping is a pure
string rewrite (models/convert.py:_squeezenet_spec).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ("SqueezeNet", "squeezenet1_0", "squeezenet1_1")


class Fire(nn.Module):
    squeeze: int
    expand1x1: int
    expand3x3: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze",
                            dtype=self.dtype)(x))
        e1 = nn.relu(nn.Conv(self.expand1x1, (1, 1), name="expand1x1",
                             dtype=self.dtype)(s))
        e3 = nn.relu(nn.Conv(self.expand3x3, (3, 3), padding=1,
                             name="expand3x3", dtype=self.dtype)(s))
        return jnp.concatenate([e1, e3], axis=-1)


# torchvision Sequential layouts: (index, kind, args)
_LAYOUTS = {
    "1_0": (
        (0, "conv", (96, 7, 2)),
        (2, "pool", ()),
        (3, "fire", (16, 64, 64)),
        (4, "fire", (16, 64, 64)),
        (5, "fire", (32, 128, 128)),
        (6, "pool", ()),
        (7, "fire", (32, 128, 128)),
        (8, "fire", (48, 192, 192)),
        (9, "fire", (48, 192, 192)),
        (10, "fire", (64, 256, 256)),
        (11, "pool", ()),
        (12, "fire", (64, 256, 256)),
    ),
    "1_1": (
        (0, "conv", (64, 3, 2)),
        (2, "pool", ()),
        (3, "fire", (16, 64, 64)),
        (4, "fire", (16, 64, 64)),
        (5, "pool", ()),
        (6, "fire", (32, 128, 128)),
        (7, "fire", (32, 128, 128)),
        (8, "pool", ()),
        (9, "fire", (48, 192, 192)),
        (10, "fire", (48, 192, 192)),
        (11, "fire", (64, 256, 256)),
        (12, "fire", (64, 256, 256)),
    ),
}


class SqueezeNet(nn.Module):
    num_classes: int = 1000
    version: str = "1_0"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        del train  # no BatchNorm anywhere in SqueezeNet
        for idx, kind, args in _LAYOUTS[self.version]:
            if kind == "conv":
                c, k, s = args
                # torchvision: padding=0 on the stem conv (VALID)
                x = nn.relu(nn.Conv(c, (k, k), strides=(s, s), padding=0,
                                    name=f"f{idx}", dtype=self.dtype)(x))
            elif kind == "pool":
                # MaxPool2d(kernel=3, stride=2, ceil_mode=True)
                from .googlenet import ceil_max_pool

                x = ceil_max_pool(x, 3, 2)
            else:
                x = Fire(*args, name=f"f{idx}", dtype=self.dtype)(x)
        if features_only:
            raise NotImplementedError(
                "SqueezeNet's classifier is a 1x1 conv applied BEFORE the "
                "ReLU and global pool (logits = mean(relu(conv(x)))), so "
                "no exact (features, linear) decomposition exists for the "
                "fused traversal head — use the standard logits path."
            )
        x = nn.Conv(self.num_classes, (1, 1), name="classifier",
                    dtype=self.dtype)(x)
        x = nn.relu(x)
        return x.mean(axis=(1, 2))


def squeezenet1_0(num_classes: int = 1000, dtype=jnp.float32) -> SqueezeNet:
    return SqueezeNet(num_classes=num_classes, version="1_0", dtype=dtype)


def squeezenet1_1(num_classes: int = 1000, dtype=jnp.float32) -> SqueezeNet:
    return SqueezeNet(num_classes=num_classes, version="1_1", dtype=dtype)
