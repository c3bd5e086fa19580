"""MobileNetV2 in Flax (torchvision topology).

The reference's model zoo star-imports all of torchvision.models
(reference models/__init__.py:1-12), so ``--arch mobilenet_v2`` is valid
there; this provides the native equivalent. Inverted-residual bottlenecks
with linear (non-activated) projections; ReLU6; classifier head named
``classifier`` (one of the FC keys hierarchy induction probes,
reference graph.py:386-397).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ("MobileNetV2", "mobilenet_v2")

# (expansion t, out channels c, repeats n, stride s) — torchvision defaults
_INVERTED_RESIDUAL_SETTINGS: Tuple[Tuple[int, int, int, int], ...] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
        cin = x.shape[-1]
        hidden = cin * self.expand_ratio
        use_res = self.stride == 1 and cin == self.out_channels

        out = x
        if self.expand_ratio != 1:
            out = nn.Conv(hidden, (1, 1), use_bias=False, name="expand",
                          dtype=self.dtype)(out)
            out = nn.relu6(norm(name="expand_bn")(out))
        out = nn.Conv(
            hidden, (3, 3), strides=(self.stride, self.stride), padding=1,
            feature_group_count=hidden, use_bias=False, name="depthwise",
            dtype=self.dtype,
        )(out)
        out = nn.relu6(norm(name="depthwise_bn")(out))
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      name="project", dtype=self.dtype)(out)
        out = norm(name="project_bn")(out)
        return x + out if use_res else out


class MobileNetV2(nn.Module):
    num_classes: int = 1000
    width_mult: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
        x = x.astype(self.dtype)
        c = _make_divisible(32 * self.width_mult)
        out = nn.Conv(c, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                      name="stem", dtype=self.dtype)(x)
        out = nn.relu6(norm(name="stem_bn")(out))
        i = 0
        for t, ch, n, s in _INVERTED_RESIDUAL_SETTINGS:
            cout = _make_divisible(ch * self.width_mult)
            for unit in range(n):
                out = InvertedResidual(
                    out_channels=cout,
                    stride=s if unit == 0 else 1,
                    expand_ratio=t,
                    dtype=self.dtype,
                    name=f"block{i}",
                )(out, train=train)
                i += 1
        last = _make_divisible(1280 * max(1.0, self.width_mult))
        out = nn.Conv(last, (1, 1), use_bias=False, name="head_conv",
                      dtype=self.dtype)(out)
        out = nn.relu6(norm(name="head_bn")(out))
        out = out.mean(axis=(1, 2)).astype(jnp.float32)
        if features_only:
            return out
        return nn.Dense(self.num_classes, name="classifier",
                        dtype=jnp.float32)(out)


def mobilenet_v2(num_classes: int = 1000, dtype=jnp.float32) -> MobileNetV2:
    return MobileNetV2(num_classes=num_classes, dtype=dtype)
