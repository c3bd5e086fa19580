"""DenseNet-BC in Flax (torchvision topology).

Zoo-parity backbone (the reference accepts any torchvision arch,
reference models/__init__.py:1-12). Dense blocks of BN-ReLU-1x1 ->
BN-ReLU-3x3 layers with channel concatenation, 1x1+avgpool transitions
with 0.5 compression, classifier head named ``classifier``
(an FC key hierarchy induction probes, reference graph.py:386-397).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ("DenseNet", "densenet121", "densenet161", "densenet169",
           "densenet201")

_CONFIGS = {
    121: (6, 12, 24, 16),
    161: (6, 12, 36, 24),
    169: (6, 12, 32, 32),
    201: (6, 12, 48, 32),
}


class DenseLayer(nn.Module):
    growth_rate: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
        out = nn.relu(norm(name="bn1")(x))
        out = nn.Conv(4 * self.growth_rate, (1, 1), use_bias=False,
                      name="conv1", dtype=self.dtype)(out)
        out = nn.relu(norm(name="bn2")(out))
        out = nn.Conv(self.growth_rate, (3, 3), padding=1, use_bias=False,
                      name="conv2", dtype=self.dtype)(out)
        return jnp.concatenate([x, out], axis=-1)


class DenseNet(nn.Module):
    depth: int = 121
    growth_rate: int = 32
    num_classes: int = 1000
    small_input: bool = False  # CIFAR stem (3x3, no maxpool)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
        block_config: Tuple[int, ...] = _CONFIGS[self.depth]
        x = x.astype(self.dtype)
        if self.small_input:
            out = nn.Conv(2 * self.growth_rate, (3, 3), padding=1,
                          use_bias=False, name="stem", dtype=self.dtype)(x)
        else:
            out = nn.Conv(2 * self.growth_rate, (7, 7), strides=(2, 2),
                          padding=3, use_bias=False, name="stem",
                          dtype=self.dtype)(x)
            out = nn.relu(norm(name="stem_bn")(out))
            out = nn.max_pool(out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for b, layers in enumerate(block_config):
            for l in range(layers):
                out = DenseLayer(self.growth_rate, dtype=self.dtype,
                                 name=f"block{b}_layer{l}")(out, train=train)
            if b != len(block_config) - 1:
                out = nn.relu(norm(name=f"trans{b}_bn")(out))
                out = nn.Conv(out.shape[-1] // 2, (1, 1), use_bias=False,
                              name=f"trans{b}_conv", dtype=self.dtype)(out)
                out = nn.avg_pool(out, (2, 2), strides=(2, 2))
        out = nn.relu(norm(name="final_bn")(out))
        out = out.mean(axis=(1, 2)).astype(jnp.float32)
        if features_only:
            return out
        return nn.Dense(self.num_classes, name="classifier",
                        dtype=jnp.float32)(out)


def densenet121(num_classes: int = 1000, dtype=jnp.float32) -> DenseNet:
    return DenseNet(depth=121, num_classes=num_classes, dtype=dtype)


def densenet161(num_classes: int = 1000, dtype=jnp.float32) -> DenseNet:
    # torchvision densenet161: growth 48, 96-channel stem (= 2 * growth).
    return DenseNet(depth=161, growth_rate=48, num_classes=num_classes,
                    dtype=dtype)


def densenet169(num_classes: int = 1000, dtype=jnp.float32) -> DenseNet:
    return DenseNet(depth=169, num_classes=num_classes, dtype=dtype)


def densenet201(num_classes: int = 1000, dtype=jnp.float32) -> DenseNet:
    return DenseNet(depth=201, num_classes=num_classes, dtype=dtype)
