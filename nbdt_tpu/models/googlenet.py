"""GoogLeNet (Inception v1) in Flax (torchvision topology).

Zoo-parity backbone: the reference star-imports torchvision.models
(reference models/__init__.py:1-12), whose ``googlenet`` is this
conv+BN(eps=1e-3) Inception stack. Flax module names mirror the torch
attribute paths (``inception3a.branch2.0`` -> ``inception3a/branch2_0``)
so the converter is a string rewrite (models/convert.py). The train-only
auxiliary heads (aux1/aux2) are not built — they never contribute to eval
logits, and NBDT consumes eval logits only; the converter skips their
checkpoint keys explicitly. ``transform_input`` is a real model option
(default False, matching the torchvision constructor): torchvision's
*pretrained* loader forces it True, so pass ``transform_input=True`` when
loading converted reference checkpoints to reproduce their logits — the
converter warns about this (models/convert.py).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ("GoogLeNet", "googlenet", "BasicConv2d", "ceil_max_pool",
           "transform_input_rescale")


def transform_input_rescale(x: jnp.ndarray) -> jnp.ndarray:
    """torchvision's ``transform_input`` per-channel affine (NHWC).

    Re-expresses an input normalized with the ImageNet mean/std as if it
    had been normalized with mean=std=0.5 (torchvision inception.py
    ``_transform_input``): ``x_c * (std_c/0.5) + (mean_c-0.5)/0.5``.
    """
    scale = jnp.asarray([0.229 / 0.5, 0.224 / 0.5, 0.225 / 0.5], x.dtype)
    shift = jnp.asarray([(0.485 - 0.5) / 0.5, (0.456 - 0.5) / 0.5,
                         (0.406 - 0.5) / 0.5], x.dtype)
    return x * scale + shift


def ceil_max_pool(x, kernel: int, stride: int):
    """torch ``MaxPool2d(kernel, stride, ceil_mode=True)`` on NHWC.

    ceil mode adds one partial trailing window when (H - kernel) % stride
    != 0; flax pads max-pool windows with -inf, so the partial window takes
    the max of its real elements — identical to torch.
    """
    pad_h = (x.shape[1] - kernel) % stride
    pad_w = (x.shape[2] - kernel) % stride
    pad_h = (stride - pad_h) % stride if pad_h else 0
    pad_w = (stride - pad_w) % stride if pad_w else 0
    # never let padding create a window with no real elements
    pad_h = min(pad_h, kernel - 1)
    pad_w = min(pad_w, kernel - 1)
    return nn.max_pool(x, (kernel, kernel), strides=(stride, stride),
                       padding=((0, pad_h), (0, pad_w)))


class BasicConv2d(nn.Module):
    """torchvision BasicConv2d: bias-free conv + BN(eps=0.001) + ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class Inception(nn.Module):
    """One GoogLeNet Inception block (four concatenated branches).

    Note torchvision's branch3 uses a 3x3 conv despite its ``ch5x5`` arg
    name (a known torchvision deviation from the paper) — reproduced here
    because checkpoint weights have 3x3 shapes.
    """

    ch1x1: int
    ch3x3red: int
    ch3x3: int
    ch5x5red: int
    ch5x5: int
    pool_proj: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda f, k, p, name: BasicConv2d(  # noqa: E731
            f, (k, k), padding=p, name=name, dtype=self.dtype)
        b1 = conv(self.ch1x1, 1, 0, "branch1")(x, train)
        b2 = conv(self.ch3x3red, 1, 0, "branch2_0")(x, train)
        b2 = conv(self.ch3x3, 3, 1, "branch2_1")(b2, train)
        b3 = conv(self.ch5x5red, 1, 0, "branch3_0")(x, train)
        b3 = conv(self.ch5x5, 3, 1, "branch3_1")(b3, train)
        # branch4.0 = MaxPool2d(3, stride=1, padding=1, ceil_mode=True):
        # with stride 1 the output size equals the input size either way
        b4 = nn.max_pool(x, (3, 3), strides=(1, 1),
                         padding=((1, 1), (1, 1)))
        b4 = conv(self.pool_proj, 1, 0, "branch4_1")(b4, train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


# (name, ch1x1, ch3x3red, ch3x3, ch5x5red, ch5x5, pool_proj) — in-channels
# are implied by the previous block's concatenated width
_BLOCKS = (
    ("inception3a", 64, 96, 128, 16, 32, 32),
    ("inception3b", 128, 128, 192, 32, 96, 64),
    ("pool", 3, 2),
    ("inception4a", 192, 96, 208, 16, 48, 64),
    ("inception4b", 160, 112, 224, 24, 64, 64),
    ("inception4c", 128, 128, 256, 24, 64, 64),
    ("inception4d", 112, 144, 288, 32, 64, 64),
    ("inception4e", 256, 160, 320, 32, 128, 128),
    ("pool", 2, 2),
    ("inception5a", 256, 160, 320, 32, 128, 128),
    ("inception5b", 384, 192, 384, 48, 128, 128),
)


class GoogLeNet(nn.Module):
    num_classes: int = 1000
    dtype: Any = jnp.float32
    # torchvision forces this True when pretrained=True; converted
    # reference checkpoints need it to reproduce logits
    transform_input: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        if self.transform_input:
            x = transform_input_rescale(x)
        out = x.astype(self.dtype)
        out = BasicConv2d(64, (7, 7), strides=(2, 2), padding=3,
                          name="conv1", dtype=self.dtype)(out, train)
        out = ceil_max_pool(out, 3, 2)
        out = BasicConv2d(64, (1, 1), name="conv2",
                          dtype=self.dtype)(out, train)
        out = BasicConv2d(192, (3, 3), padding=1, name="conv3",
                          dtype=self.dtype)(out, train)
        out = ceil_max_pool(out, 3, 2)
        for spec in _BLOCKS:
            if spec[0] == "pool":
                out = ceil_max_pool(out, spec[1], spec[2])
            else:
                name, *chans = spec
                out = Inception(*chans, name=name,
                                dtype=self.dtype)(out, train)
        out = out.mean(axis=(1, 2)).astype(jnp.float32)  # AdaptiveAvgPool 1x1
        if features_only:
            return out
        # eval-mode Dropout(0.2) is the identity
        return nn.Dense(self.num_classes, name="fc", dtype=jnp.float32)(out)


def googlenet(num_classes: int = 1000, dtype=jnp.float32,
              transform_input: bool = False) -> GoogLeNet:
    return GoogLeNet(num_classes=num_classes, dtype=dtype,
                     transform_input=transform_input)
