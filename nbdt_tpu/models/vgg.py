"""VGG with BatchNorm in Flax (torchvision topology).

Zoo-parity backbone (reference models/__init__.py:1-12 accepts torchvision's
vgg16_bn etc.). conv3x3-BN-ReLU stacks with maxpool between stages. Two
heads:

* default (``classic_head=False``): the torchvision 3-layer MLP head is
  collapsed to global-avg-pool + one Dense named ``classifier`` — on TPU
  the ~120M-param fc6/fc7 are pure HBM waste and the FC probing contract
  only needs the final class-row matrix (reference graph.py:386-397).
* ``classic_head=True``: torchvision's exact head — adaptive-avg-pool to
  7x7, channel-major flatten, Linear(4096)+ReLU ×2, Linear(C) — so
  *pretrained torchvision VGG checkpoints convert and reproduce logits*
  (the one zoo family round 3 left without a checkpoint-parity path).
  torch's train-mode Dropout(0.5) after each ReLU is eval-identity and is
  not reproduced (no dropout anywhere in this zoo); eval logits match.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .alexnet import adaptive_avg_pool

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
    classic_head: bool = False  # True = torchvision fc1/fc2 MLP head
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
                # torchvision VGG convs carry a bias in BOTH variants (its
                # make_layers never sets bias=False, even before BN) — keep
                # it so vgg*_bn checkpoints convert key-for-key
                out = nn.Conv(int(v), (3, 3), padding=1,
                              name=f"conv{i}", dtype=self.dtype)(out)
                if self.batch_norm:
                    out = norm(name=f"bn{i}")(out)
                out = nn.relu(out)
                i += 1
        if self.classic_head:
            out = adaptive_avg_pool(out, (7, 7))
            # torch flattens NCHW (channel-major); transpose before reshape
            # so fc1's converted [25088, 4096] kernel sees the same columns
            n = out.shape[0]
            out = out.transpose(0, 3, 1, 2).reshape(n, -1)
            out = out.astype(jnp.float32)
            out = nn.relu(nn.Dense(4096, name="fc1", dtype=jnp.float32)(out))
            out = nn.relu(nn.Dense(4096, name="fc2", dtype=jnp.float32)(out))
        else:
            out = out.mean(axis=(1, 2)).astype(jnp.float32)
        if features_only:
            return out
        return nn.Dense(self.num_classes, name="classifier",
                        dtype=jnp.float32)(out)


def vgg11(num_classes: int = 1000, dtype=jnp.float32,
          classic_head: bool = False) -> VGG:
    return VGG(depth=11, num_classes=num_classes, batch_norm=False,
               classic_head=classic_head, dtype=dtype)


def vgg13(num_classes: int = 1000, dtype=jnp.float32,
          classic_head: bool = False) -> VGG:
    return VGG(depth=13, num_classes=num_classes, batch_norm=False,
               classic_head=classic_head, dtype=dtype)


def vgg16(num_classes: int = 1000, dtype=jnp.float32,
          classic_head: bool = False) -> VGG:
    return VGG(depth=16, num_classes=num_classes, batch_norm=False,
               classic_head=classic_head, dtype=dtype)


def vgg19(num_classes: int = 1000, dtype=jnp.float32,
          classic_head: bool = False) -> VGG:
    return VGG(depth=19, num_classes=num_classes, batch_norm=False,
               classic_head=classic_head, dtype=dtype)


def vgg11_bn(num_classes: int = 1000, dtype=jnp.float32,
             classic_head: bool = False) -> VGG:
    return VGG(depth=11, num_classes=num_classes,
               classic_head=classic_head, dtype=dtype)


def vgg13_bn(num_classes: int = 1000, dtype=jnp.float32,
             classic_head: bool = False) -> VGG:
    return VGG(depth=13, num_classes=num_classes,
               classic_head=classic_head, dtype=dtype)


def vgg16_bn(num_classes: int = 1000, dtype=jnp.float32,
             classic_head: bool = False) -> VGG:
    return VGG(depth=16, num_classes=num_classes,
               classic_head=classic_head, dtype=dtype)


def vgg19_bn(num_classes: int = 1000, dtype=jnp.float32,
             classic_head: bool = False) -> VGG:
    return VGG(depth=19, num_classes=num_classes,
               classic_head=classic_head, dtype=dtype)
