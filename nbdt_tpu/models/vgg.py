"""VGG with BatchNorm in Flax (torchvision topology).

Zoo-parity backbone (reference models/__init__.py:1-12 accepts torchvision's
vgg16_bn etc.). conv3x3-BN-ReLU stacks with maxpool between stages; the
torchvision 3-layer MLP head is collapsed to global-avg-pool + one Dense
named ``classifier`` — on TPU the 25M-param fc6/fc7 are pure HBM waste and
the FC probing contract only needs the final class-row matrix
(reference graph.py:386-397).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ("VGG", "vgg11", "vgg13", "vgg16", "vgg19",
           "vgg11_bn", "vgg13_bn", "vgg16_bn", "vgg19_bn")

_CONFIGS = {
    11: (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    13: (64, 64, "M", 128, 128, "M", 256, 256, "M",
         512, 512, "M", 512, 512, "M"),
    16: (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
         512, 512, 512, "M", 512, 512, 512, "M"),
    19: (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
         512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


class VGG(nn.Module):
    depth: int = 16
    num_classes: int = 1000
    batch_norm: bool = True  # False = torchvision's plain vgg11/13/16/19
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
        out = x.astype(self.dtype)
        i = 0
        for v in _CONFIGS[self.depth]:
            if v == "M":
                out = nn.max_pool(out, (2, 2), strides=(2, 2))
            else:
                # plain VGG convs carry a bias (there is no BN to absorb it)
                out = nn.Conv(int(v), (3, 3), padding=1,
                              use_bias=not self.batch_norm,
                              name=f"conv{i}", dtype=self.dtype)(out)
                if self.batch_norm:
                    out = norm(name=f"bn{i}")(out)
                out = nn.relu(out)
                i += 1
        out = out.mean(axis=(1, 2)).astype(jnp.float32)
        if features_only:
            return out
        return nn.Dense(self.num_classes, name="classifier",
                        dtype=jnp.float32)(out)


def vgg11(num_classes: int = 1000, dtype=jnp.float32) -> VGG:
    return VGG(depth=11, num_classes=num_classes, batch_norm=False,
               dtype=dtype)


def vgg13(num_classes: int = 1000, dtype=jnp.float32) -> VGG:
    return VGG(depth=13, num_classes=num_classes, batch_norm=False,
               dtype=dtype)


def vgg16(num_classes: int = 1000, dtype=jnp.float32) -> VGG:
    return VGG(depth=16, num_classes=num_classes, batch_norm=False,
               dtype=dtype)


def vgg19(num_classes: int = 1000, dtype=jnp.float32) -> VGG:
    return VGG(depth=19, num_classes=num_classes, batch_norm=False,
               dtype=dtype)


def vgg11_bn(num_classes: int = 1000, dtype=jnp.float32) -> VGG:
    return VGG(depth=11, num_classes=num_classes, dtype=dtype)


def vgg13_bn(num_classes: int = 1000, dtype=jnp.float32) -> VGG:
    return VGG(depth=13, num_classes=num_classes, dtype=dtype)


def vgg16_bn(num_classes: int = 1000, dtype=jnp.float32) -> VGG:
    return VGG(depth=16, num_classes=num_classes, dtype=dtype)


def vgg19_bn(num_classes: int = 1000, dtype=jnp.float32) -> VGG:
    return VGG(depth=19, num_classes=num_classes, dtype=dtype)
