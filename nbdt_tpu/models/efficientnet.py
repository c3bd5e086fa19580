"""EfficientNet B0-B7 in Flax (NHWC, bf16-ready).

The reference's ImageNet NBDT config rides EfficientNet-B7b (reference
models/__init__.py:7-12 star-imports pytorchcv's efficientnet family;
examples/imagenet uses hierarchy='induced-efficientnet_b7b'). This is a
standard MBConv implementation with compound scaling — squeeze-excite,
expansion, swish — with the classifier named ``output`` so hierarchy
induction finds it via the same FC-key probe as the WRN family
(MODEL_FC_KEYS, reference graph.py:386-397).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ("EfficientNet",) + tuple(
    f"efficientnet_b{i}{s}" for i in range(9) for s in ("", "b", "c"))

# (width_mult, depth_mult, resolution, dropout)
COMPOUND = {
    "b0": (1.0, 1.0, 224, 0.2),
    "b1": (1.0, 1.1, 240, 0.2),
    "b2": (1.1, 1.2, 260, 0.3),
    "b3": (1.2, 1.4, 300, 0.3),
    "b4": (1.4, 1.8, 380, 0.4),
    "b5": (1.6, 2.2, 456, 0.4),
    "b6": (1.8, 2.6, 528, 0.5),
    "b7": (2.0, 3.1, 600, 0.5),
    "b8": (2.2, 3.6, 672, 0.5),
}

# Base B0 stage config: (expand, channels, repeats, stride, kernel)
BASE_STAGES = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]


def round_channels(c: float, divisor: int = 8) -> int:
    new = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new < 0.9 * c:
        new += divisor
    return new


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), name="reduce", dtype=self.dtype)(s)
        s = nn.swish(s)
        s = nn.Conv(x.shape[-1], (1, 1), name="expand", dtype=self.dtype)(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    out_channels: int
    expand_ratio: int
    stride: int
    kernel: int
    se_ratio: float = 0.25
    tf_pad: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-3, dtype=jnp.float32)
        inp = x.shape[-1]
        mid = inp * self.expand_ratio
        h = x
        if self.expand_ratio != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False, name="expand_conv",
                        dtype=self.dtype)(h)
            h = norm(name="expand_bn")(h)
            h = nn.swish(h)
        h = nn.Conv(
            mid, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME" if self.tf_pad else self.kernel // 2,
            feature_group_count=mid,
            use_bias=False, name="dw_conv", dtype=self.dtype,
        )(h)
        h = norm(name="dw_bn")(h)
        h = nn.swish(h)
        h = SqueezeExcite(
            reduced=max(1, int(inp * self.se_ratio)), dtype=self.dtype,
            name="se",
        )(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    name="project_conv", dtype=self.dtype)(h)
        h = norm(name="project_bn")(h)
        if self.stride == 1 and inp == self.out_channels:
            h = h + x
        return h


class EfficientNet(nn.Module):
    """``tf_mode``: TF-style SAME padding on strided convs — pytorchcv's
    "b" variants (efficientnet_b7b etc.) carry TF-ported weights whose
    stride-2 convs pad asymmetrically; required for checkpoint parity."""

    variant: str = "b0"
    num_classes: int = 1000
    tf_mode: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        wm, dm, _, _ = COMPOUND[self.variant]
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-3, dtype=jnp.float32)

        x = x.astype(self.dtype)
        h = nn.Conv(round_channels(32 * wm), (3, 3), strides=(2, 2),
                    padding="SAME" if self.tf_mode else 1,
                    use_bias=False, name="stem_conv",
                    dtype=self.dtype)(x)
        h = norm(name="stem_bn")(h)
        h = nn.swish(h)

        for si, (expand, c, repeats, stride, kernel) in enumerate(BASE_STAGES):
            out_c = round_channels(c * wm)
            n = int(math.ceil(repeats * dm))
            for bi in range(n):
                h = MBConv(
                    out_channels=out_c,
                    expand_ratio=expand,
                    stride=stride if bi == 0 else 1,
                    kernel=kernel,
                    tf_pad=self.tf_mode,
                    dtype=self.dtype,
                    name=f"stage{si + 1}_block{bi + 1}",
                )(h, train=train)

        h = nn.Conv(round_channels(1280 * wm), (1, 1), use_bias=False,
                    name="head_conv", dtype=self.dtype)(h)
        h = norm(name="head_bn")(h)
        h = nn.swish(h)
        h = h.mean(axis=(1, 2)).astype(jnp.float32)
        if features_only:
            return h
        return nn.Dense(self.num_classes, name="output", dtype=jnp.float32)(h)


def _make(variant, tf_mode: bool = False, suffix: str = ""):
    def ctor(num_classes: int = 1000, dtype=jnp.float32) -> EfficientNet:
        return EfficientNet(variant=variant, num_classes=num_classes,
                            tf_mode=tf_mode, dtype=dtype)

    ctor.__name__ = (f"efficientnet_{variant}"
                     + (suffix or ("b" if tf_mode else "")))
    return ctor


efficientnet_b0 = _make("b0")
efficientnet_b1 = _make("b1")
efficientnet_b2 = _make("b2")
efficientnet_b3 = _make("b3")
efficientnet_b4 = _make("b4")
efficientnet_b5 = _make("b5")
efficientnet_b6 = _make("b6")
efficientnet_b7 = _make("b7")
efficientnet_b8 = _make("b8")
# pytorchcv "b" aliases = TF-ported weights (SAME padding); pytorchcv's
# efficientnet module (star-imported by the reference) exposes the whole
# b0b..b8b family — b7b is the reference's ImageNet NBDT arch
# (hierarchy='induced-efficientnet_b7b').
efficientnet_b0b = _make("b0", tf_mode=True)
efficientnet_b1b = _make("b1", tf_mode=True)
efficientnet_b2b = _make("b2", tf_mode=True)
efficientnet_b3b = _make("b3", tf_mode=True)
efficientnet_b4b = _make("b4", tf_mode=True)
efficientnet_b5b = _make("b5", tf_mode=True)
efficientnet_b6b = _make("b6", tf_mode=True)
efficientnet_b7b = _make("b7", tf_mode=True)
efficientnet_b8b = _make("b8", tf_mode=True)
# pytorchcv "c" aliases: AdvProp-trained TF-mode weights — architecturally
# identical to the "b" family (get_efficientnet(..., tf_mode=True,
# bn_eps=1e-3) in pytorchcv efficientnet.py), only the released weights
# differ, so the constructors are the same module.
efficientnet_b0c = _make("b0", tf_mode=True, suffix="c")
efficientnet_b1c = _make("b1", tf_mode=True, suffix="c")
efficientnet_b2c = _make("b2", tf_mode=True, suffix="c")
efficientnet_b3c = _make("b3", tf_mode=True, suffix="c")
efficientnet_b4c = _make("b4", tf_mode=True, suffix="c")
efficientnet_b5c = _make("b5", tf_mode=True, suffix="c")
efficientnet_b6c = _make("b6", tf_mode=True, suffix="c")
efficientnet_b7c = _make("b7", tf_mode=True, suffix="c")
efficientnet_b8c = _make("b8", tf_mode=True, suffix="c")
