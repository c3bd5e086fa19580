"""WideResNet-28-10 in Flax, pytorchcv topology.

The reference re-exports pytorchcv's ``wrn28_10_cifar10/cifar100`` and a
``wrn28_10`` variant whose 8x8 final pool is replaced with global average
pooling for TinyImagenet's 64x64 inputs (reference wideresnet.py:28-40).
pytorchcv's CIFAR WRN is pre-activation: a bare 3x3 init conv, three stages
of 4 pre-act units (BN-ReLU-conv3x3 twice, 1x1 pre-act shortcut on resize),
a trailing BN-ReLU ("post activation"), pool, and an ``output`` linear head
— whose weight is one of the reference's known FC keys (graph.py:392
"output.weight"), so the head here is named ``output`` as well.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

__all__ = ("WRN", "wrn28_10", "wrn28_10_cifar10", "wrn28_10_cifar100",
           "model_urls")

# Released plain-backbone checkpoint (reference wideresnet.py:13-18).
model_urls = {
    ("wrn28_10", "TinyImagenet200"):
        "https://github.com/alvinwan/neural-backed-decision-trees/releases/"
        "download/0.0.1/ckpt-TinyImagenet200-wrn28_10.pth",
}


class PreResBlock(nn.Module):
    """Pre-activation basic block: (BN-ReLU-conv3x3) x2 + shortcut.

    The shortcut is taken from the *pre-activated* input when resizing
    (pytorchcv PreResUnit semantics).
    """

    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32
    bn_impl: str = "f32"  # see WRN.bn_impl

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn_bf16 = self.bn_impl == "bf16"
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype if bn_bf16 else jnp.float32,
            force_float32_reductions=not bn_bf16,
        )
        pre = norm(name="bn1")(x)
        pre = nn.relu(pre)

        resize = self.stride != 1 or x.shape[-1] != self.out_channels
        identity = x
        if resize:
            identity = nn.Conv(
                self.out_channels, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="identity_conv", dtype=self.dtype,
            )(pre)

        out = nn.Conv(
            self.out_channels, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, name="conv1", dtype=self.dtype,
        )(pre)
        out = norm(name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.out_channels, (3, 3), padding=1, use_bias=False,
            name="conv2", dtype=self.dtype,
        )(out)
        return out + identity


class WRN(nn.Module):
    """WideResNet for 32x32/64x64 inputs, pytorchcv CIFARWRN layout."""

    depth: int = 28
    width: int = 10
    num_classes: int = 10
    dtype: Any = jnp.float32
    # BatchNorm compute dtype, a perf knob (checkpoint compatible — no
    # parameter change). "f32" (default) normalizes and reduces batch
    # statistics in float32 like torch; "bf16" runs the whole norm in the
    # backbone stream dtype with bf16 reductions (flax
    # force_float32_reductions=False). Same knob as models/resnet.py.
    bn_impl: str = "f32"

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        assert self.bn_impl in ("f32", "bf16"), self.bn_impl
        assert (self.depth - 4) % 6 == 0
        n = (self.depth - 4) // 6  # units per stage (4 for depth 28)
        widths = [16 * self.width, 32 * self.width, 64 * self.width]

        x = x.astype(self.dtype)
        out = nn.Conv(
            16, (3, 3), padding=1, use_bias=False, name="init_conv",
            dtype=self.dtype,
        )(x)
        for stage, (w, stride) in enumerate(zip(widths, (1, 2, 2)), start=1):
            for unit in range(n):
                out = PreResBlock(
                    out_channels=w,
                    stride=stride if unit == 0 else 1,
                    dtype=self.dtype,
                    bn_impl=self.bn_impl,
                    name=f"stage{stage}_unit{unit + 1}",
                )(out, train=train)
        bn_bf16 = self.bn_impl == "bf16"
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype if bn_bf16 else jnp.float32,
            force_float32_reductions=not bn_bf16, name="post_bn",
        )(out)
        out = nn.relu(out)
        # global average pool: equals pytorchcv's AvgPool2d(8) on 32x32
        # inputs and implements the reference's AdaptiveAvgPool2d swap for
        # 64x64 TinyImagenet inputs (reference wideresnet.py:28-40).
        out = out.mean(axis=(1, 2)).astype(jnp.float32)
        if features_only:
            return out
        return nn.Dense(self.num_classes, name="output", dtype=jnp.float32)(out)


def wrn28_10(num_classes: int = 200, dtype=jnp.float32) -> WRN:
    """TinyImagenet variant (global pooled; reference wideresnet.py:28-40)."""
    return WRN(depth=28, width=10, num_classes=num_classes, dtype=dtype)


def wrn28_10_cifar10(num_classes: int = 10, dtype=jnp.float32) -> WRN:
    return WRN(depth=28, width=10, num_classes=num_classes, dtype=dtype)


def wrn28_10_cifar100(num_classes: int = 100, dtype=jnp.float32) -> WRN:
    return WRN(depth=28, width=10, num_classes=num_classes, dtype=dtype)
