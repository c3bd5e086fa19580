"""ShuffleNetV2 in Flax (torchvision topology).

The reference's model zoo star-imports all of torchvision.models
(reference models/__init__.py:1-12), so ``--arch shufflenet_v2_x1_0`` is
valid there; this provides the native equivalent. Channel-split units with
depthwise 3x3 convs and a channel shuffle after each unit; ``fc`` head
(the first FC key hierarchy induction probes, reference graph.py:386-397).

Flax module names mirror torchvision's (conv1/stage{2,3,4}.{i}/conv5/fc,
branch1/branch2 with their Sequential indices) so the converter mapping is
a pure string rewrite (models/convert.py:_shufflenet_key_to_path).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ("ShuffleNetV2", "shufflenet_v2_x0_5", "shufflenet_v2_x1_0",
           "shufflenet_v2_x1_5", "shufflenet_v2_x2_0")

# stages_repeats = [4, 8, 4]; stages_out_channels per width multiplier
_CHANNELS = {
    "x0_5": (24, 48, 96, 192, 1024),
    "x1_0": (24, 116, 232, 464, 1024),
    "x1_5": (24, 176, 352, 704, 1024),
    "x2_0": (24, 244, 488, 976, 2048),
}
_REPEATS = (4, 8, 4)


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    """torchvision channel_shuffle on NHWC: channel c = g*(C/g)+i maps to
    i*g + g_idx (view (g, C/g) -> transpose -> flatten)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = x.transpose(0, 1, 2, 4, 3)
    return x.reshape(b, h, w, c)


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        branch_c = self.out_channels // 2

        if self.stride > 1:
            # branch1: dw3x3(s) + BN, 1x1 + BN + ReLU (torchvision
            # Sequential indices 0,1,2,3 — named b1_{i})
            cin = x.shape[-1]
            b1 = conv(cin, (3, 3), strides=(self.stride,) * 2, padding=1,
                      feature_group_count=cin, name="b1_0")(x)
            b1 = norm(name="b1_1")(b1)
            b1 = nn.relu(norm(name="b1_3")(
                conv(branch_c, (1, 1), name="b1_2")(b1)))
            x2 = x
        else:
            x1, x2 = jnp.split(x, 2, axis=-1)
            b1 = x1

        # branch2: 1x1+BN+ReLU, dw3x3(s)+BN, 1x1+BN+ReLU (indices
        # 0,1,3,4,5,6,7 — ReLUs at 2 and 7 are activation-only)
        b2 = nn.relu(norm(name="b2_1")(
            conv(branch_c, (1, 1), name="b2_0")(x2)))
        b2 = norm(name="b2_4")(
            conv(branch_c, (3, 3), strides=(self.stride,) * 2, padding=1,
                 feature_group_count=branch_c, name="b2_3")(b2))
        b2 = nn.relu(norm(name="b2_6")(
            conv(branch_c, (1, 1), name="b2_5")(b2)))

        return channel_shuffle(jnp.concatenate([b1, b2], axis=-1), 2)


class ShuffleNetV2(nn.Module):
    num_classes: int = 1000
    width: str = "x1_0"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
        chans = _CHANNELS[self.width]
        x = nn.Conv(chans[0], (3, 3), strides=(2, 2), padding=1,
                    use_bias=False, name="conv1_0", dtype=self.dtype)(x)
        x = nn.relu(norm(name="conv1_1")(x))
        # MaxPool2d(kernel=3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage_i, (repeats, c) in enumerate(zip(_REPEATS, chans[1:4]),
                                               start=2):
            for unit in range(repeats):
                x = InvertedResidual(
                    c, stride=2 if unit == 0 else 1,
                    name=f"stage{stage_i}_{unit}", dtype=self.dtype,
                )(x, train=train)
        x = nn.Conv(chans[4], (1, 1), use_bias=False, name="conv5_0",
                    dtype=self.dtype)(x)
        x = nn.relu(norm(name="conv5_1")(x))
        x = x.mean(axis=(1, 2))  # global pool (torchvision x.mean([2, 3]))
        if features_only:
            return x
        return nn.Dense(self.num_classes, name="fc",
                        dtype=self.dtype)(x)

    def features(self, variables, x, train: bool = False):
        return self.apply(variables, x, train=train, features_only=True)


def shufflenet_v2_x0_5(num_classes: int = 1000, dtype=jnp.float32):
    return ShuffleNetV2(num_classes=num_classes, width="x0_5", dtype=dtype)


def shufflenet_v2_x1_0(num_classes: int = 1000, dtype=jnp.float32):
    return ShuffleNetV2(num_classes=num_classes, width="x1_0", dtype=dtype)


def shufflenet_v2_x1_5(num_classes: int = 1000, dtype=jnp.float32):
    return ShuffleNetV2(num_classes=num_classes, width="x1_5", dtype=dtype)


def shufflenet_v2_x2_0(num_classes: int = 1000, dtype=jnp.float32):
    return ShuffleNetV2(num_classes=num_classes, width="x2_0", dtype=dtype)
