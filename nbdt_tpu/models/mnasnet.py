"""MNASNet in Flax (torchvision topology, _version=2 layout).

Zoo-parity backbone: the reference star-imports torchvision.models
(reference models/__init__.py:1-12), which ships mnasnet0_5/0_75/1_0/1_3.
torchvision's v2 layout alpha-scales the STEM as well as the six
inverted-residual stacks (``_get_depths`` rounds all eight base channels
32/16/24/40/80/96/192/320 to multiples of 8 with a 0.9 round-up bias;
the fixed 32/16 stem was the deprecated _version=1 layout). Flax names
mirror the torch Sequential indices: ``layers.{i}`` -> ``l{i}``, stack
r-th block -> ``l{i}_{r}`` with inner ``conv0/bn1/conv3/bn4/conv6/bn7``,
``classifier.1`` -> ``classifier`` (the induction-probe name, reference
graph.py:386-397).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

__all__ = ("MNASNet", "mnasnet0_5", "mnasnet0_75", "mnasnet1_0",
           "mnasnet1_3", "get_depths")

_BASE_DEPTHS = (32, 16, 24, 40, 80, 96, 192, 320)
# (kernel, stride, expansion, repeats) per stack — torchvision mnasnet.py
_STACKS = ((3, 2, 3, 3), (5, 2, 3, 3), (5, 2, 6, 3),
           (3, 1, 6, 2), (5, 2, 6, 4), (3, 1, 6, 1))


def _round_to_multiple_of(val: float, divisor: int,
                          round_up_bias: float = 0.9) -> int:
    """torchvision's channel rounding: nearest multiple, biased up."""
    new_val = max(divisor, int(val + divisor / 2) // divisor * divisor)
    return new_val if new_val >= round_up_bias * val else new_val + divisor


def get_depths(alpha: float):
    """torchvision's _get_depths: all eight channels scale, stem included."""
    return [_round_to_multiple_of(d * alpha, 8) for d in _BASE_DEPTHS]


class _InvertedResidual(nn.Module):
    features: int
    kernel: int
    stride: int
    expand: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        mid = cin * self.expand
        # torchvision mnasnet uses _BN_MOMENTUM = 1 - 0.9997 (torch
        # convention) = flax momentum 0.9997, NOT the usual 0.9 — matters
        # only for train-mode running-stat EMA, but exported stats must
        # track the reference's decay
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9997, epsilon=1e-5,
            dtype=jnp.float32, name=name)
        h = nn.Conv(mid, (1, 1), use_bias=False, name="conv0",
                    dtype=self.dtype)(x)
        h = nn.relu(norm("bn1")(h))
        h = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=self.kernel // 2, feature_group_count=mid,
                    use_bias=False, name="conv3", dtype=self.dtype)(h)
        h = nn.relu(norm("bn4")(h))
        h = nn.Conv(self.features, (1, 1), use_bias=False, name="conv6",
                    dtype=self.dtype)(h)
        h = norm("bn7")(h)
        if self.stride == 1 and cin == self.features:
            h = h + x
        return h


class MNASNet(nn.Module):
    alpha: float = 1.0
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        # momentum: see _InvertedResidual (torchvision's 1 - 0.9997)
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9997, epsilon=1e-5,
            dtype=jnp.float32, name=name)
        depths = get_depths(self.alpha)
        out = x.astype(self.dtype)
        out = nn.Conv(depths[0], (3, 3), strides=(2, 2), padding=1,
                      use_bias=False, name="l0", dtype=self.dtype)(out)
        out = nn.relu(norm("l1")(out))
        out = nn.Conv(depths[0], (3, 3), padding=1,
                      feature_group_count=depths[0],
                      use_bias=False, name="l3", dtype=self.dtype)(out)
        out = nn.relu(norm("l4")(out))
        out = nn.Conv(depths[1], (1, 1), use_bias=False, name="l6",
                      dtype=self.dtype)(out)
        out = norm("l7")(out)
        for si, ((k, s, e, n), d) in enumerate(zip(_STACKS, depths[2:])):
            for r in range(n):
                out = _InvertedResidual(
                    d, k, s if r == 0 else 1, e,
                    name=f"l{8 + si}_{r}", dtype=self.dtype)(out, train)
        out = nn.Conv(1280, (1, 1), use_bias=False, name="l14",
                      dtype=self.dtype)(out)
        out = nn.relu(norm("l15")(out))
        out = out.mean(axis=(1, 2)).astype(jnp.float32)
        if features_only:
            return out
        # eval-mode Dropout(0.2) is the identity
        return nn.Dense(self.num_classes, name="classifier",
                        dtype=jnp.float32)(out)


def mnasnet0_5(num_classes: int = 1000, dtype=jnp.float32) -> MNASNet:
    return MNASNet(alpha=0.5, num_classes=num_classes, dtype=dtype)


def mnasnet0_75(num_classes: int = 1000, dtype=jnp.float32) -> MNASNet:
    return MNASNet(alpha=0.75, num_classes=num_classes, dtype=dtype)


def mnasnet1_0(num_classes: int = 1000, dtype=jnp.float32) -> MNASNet:
    return MNASNet(alpha=1.0, num_classes=num_classes, dtype=dtype)


def mnasnet1_3(num_classes: int = 1000, dtype=jnp.float32) -> MNASNet:
    return MNASNet(alpha=1.3, num_classes=num_classes, dtype=dtype)
