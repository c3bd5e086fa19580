"""CIFAR-style ResNet backbones in Flax.

Topology matches reference ``nbdt/models/resnet.py`` (3x3 stem, no maxpool,
4 stages, global average pool, ``linear`` head) so released checkpoints
convert 1:1 — the final ``linear`` kernel doubles as the class-embedding
matrix that hierarchy induction clusters (reference graph.py:415-419), so
the naming/shape contract is load-bearing.

TPU-native choices: NHWC layout, channel-last BatchNorm, optional bfloat16
compute with float32 params/statistics (MXU-friendly), no Python-level
control flow inside apply.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any

__all__ = (
    "ResNet",
    "ResNet10",
    "ResNet18",
    "ResNet34",
    "ResNet50",
    "ResNet101",
    "ResNet152",
    "model_urls",
)

# Released plain-backbone checkpoints (reference resnet.py:18-39) — what the
# reference's ``--pretrained`` arch constructors fetch (vs the NBDT-trained
# checkpoints in nbdt_tpu.model.model_urls).
_RELEASES = "https://github.com/alvinwan/neural-backed-decision-trees/releases/download/0.0.1"
model_urls = {
    ("ResNet10", "CIFAR10"): f"{_RELEASES}/ckpt-CIFAR10-ResNet10.pth",
    ("ResNet10", "CIFAR100"): f"{_RELEASES}/ckpt-CIFAR100-ResNet10.pth",
    ("ResNet18", "CIFAR10"): f"{_RELEASES}/ckpt-CIFAR10-ResNet18.pth",
    ("ResNet18", "CIFAR100"): f"{_RELEASES}/ckpt-CIFAR100-ResNet18.pth",
    ("ResNet18", "TinyImagenet200"): f"{_RELEASES}/ckpt-TinyImagenet200-ResNet18.pth",
}


class BasicBlock(nn.Module):
    """conv3x3-bn-relu, conv3x3-bn, +shortcut, relu (reference resnet.py:42-74).

    ``folded=True`` is the serving variant: BatchNorm layers are gone and the
    convs carry a bias instead (``models.fold.fold_batchnorm`` produces the
    matching params — standard inference-time BN folding)."""

    planes: int
    stride: int = 1
    expansion: int = 1
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    dtype: Any = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x):
        out = self.conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=self.folded, name="conv1", dtype=self.dtype,
        )(x)
        if not self.folded:
            out = self.norm(name="bn1")(out)
        out = nn.relu(out)
        out = self.conv(
            self.planes, (3, 3), strides=(1, 1), padding=1,
            use_bias=self.folded, name="conv2", dtype=self.dtype,
        )(out)
        if not self.folded:
            out = self.norm(name="bn2")(out)

        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.expansion * self.planes:
            shortcut = self.conv(
                self.expansion * self.planes, (1, 1),
                strides=(self.stride, self.stride), use_bias=self.folded,
                name="shortcut_conv", dtype=self.dtype,
            )(x)
            if not self.folded:
                shortcut = self.norm(name="shortcut_bn")(shortcut)
        return nn.relu(out + shortcut)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 with 4x expansion (reference resnet.py:77-112).

    ``groups``/``base_width`` generalize to torchvision's ResNeXt and wide
    ResNets (the reference reaches those archs through its torchvision
    star-import, models/__init__.py:1-12): the bottleneck width is
    ``planes * base_width/64 * groups`` and conv2 is a grouped conv
    (``feature_group_count`` — XLA lowers this to a blocked MXU matmul)."""

    planes: int
    stride: int = 1
    expansion: int = 4
    groups: int = 1
    base_width: int = 64
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    dtype: Any = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out = self.conv(
            width, (1, 1), use_bias=self.folded, name="conv1",
            dtype=self.dtype,
        )(x)
        if not self.folded:
            out = self.norm(name="bn1")(out)
        out = nn.relu(out)
        out = self.conv(
            width, (3, 3), strides=(self.stride, self.stride), padding=1,
            feature_group_count=self.groups,
            use_bias=self.folded, name="conv2", dtype=self.dtype,
        )(out)
        if not self.folded:
            out = self.norm(name="bn2")(out)
        out = nn.relu(out)
        out = self.conv(
            self.expansion * self.planes, (1, 1), use_bias=self.folded,
            name="conv3", dtype=self.dtype,
        )(out)
        if not self.folded:
            out = self.norm(name="bn3")(out)

        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.expansion * self.planes:
            shortcut = self.conv(
                self.expansion * self.planes, (1, 1),
                strides=(self.stride, self.stride), use_bias=self.folded,
                name="shortcut_conv", dtype=self.dtype,
            )(x)
            if not self.folded:
                shortcut = self.norm(name="shortcut_bn")(shortcut)
        return nn.relu(out + shortcut)


class ResNet(nn.Module):
    """CIFAR ResNet (reference resnet.py:115-157): features() + linear head.

    ``imagenet_stem=True`` swaps the 3x3 stem for the torchvision ImageNet
    stem (7x7 stride-2 conv + 3x3 stride-2 maxpool) — the architecture the
    reference reaches through its torchvision star-import (lowercase
    ``resnet18`` etc., used by the ClassyVision ImageNet example)."""

    block: Callable
    num_blocks: Sequence[int]
    num_classes: int = 10
    expansion: int = 1
    groups: int = 1
    base_width: int = 64
    imagenet_stem: bool = False
    dtype: Any = jnp.float32
    folded: bool = False
    # BatchNorm compute dtype, a serving/training perf knob (checkpoint
    # compatible — no parameter change). "f32" (default) normalizes and
    # reduces batch statistics in float32 like torch; "bf16" runs the
    # whole norm in the backbone stream dtype with bf16 reductions
    # (flax force_float32_reductions=False) — the training-path
    # BN-statistics-cost probe (tools/probe_train_scale.py).
    bn_impl: str = "f32"

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        assert not (self.folded and train), "folded models are inference-only"
        assert self.bn_impl in ("f32", "bf16"), self.bn_impl
        bn_bf16 = self.bn_impl == "bf16"
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,  # torch BatchNorm2d default momentum 0.1
            epsilon=1e-5,
            dtype=self.dtype if bn_bf16 else jnp.float32,
            force_float32_reductions=not bn_bf16,
        )
        conv = partial(nn.Conv, dtype=self.dtype)

        x = x.astype(self.dtype)
        if self.imagenet_stem:
            out = conv(64, (7, 7), strides=(2, 2), padding=3,
                       use_bias=self.folded, name="conv1")(x)
            if not self.folded:
                out = norm(name="bn1")(out)
            out = nn.relu(out)
            out = nn.max_pool(out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        else:
            out = conv(64, (3, 3), padding=1, use_bias=self.folded,
                       name="conv1")(x)
            if not self.folded:
                out = norm(name="bn1")(out)
            out = nn.relu(out)

        for stage, (planes, blocks, stride) in enumerate(
            zip((64, 128, 256, 512), self.num_blocks, (1, 2, 2, 2)), start=1
        ):
            strides = [stride] + [1] * (blocks - 1)
            extra = (
                {"groups": self.groups, "base_width": self.base_width}
                if (self.groups, self.base_width) != (1, 64) else {}
            )
            for i, s in enumerate(strides):
                out = self.block(
                    planes=planes,
                    stride=s,
                    expansion=self.expansion,
                    conv=conv,
                    norm=norm,
                    dtype=self.dtype,
                    folded=self.folded,
                    name=f"layer{stage}_{i}",
                    **extra,
                )(out)

        out = out.mean(axis=(1, 2))  # global average pool
        out = out.astype(jnp.float32)
        if features_only:
            return out
        out = nn.Dense(self.num_classes, name="linear", dtype=jnp.float32)(out)
        return out

    def features(self, variables, x, train: bool = False):
        return self.apply(variables, x, train=train, features_only=True)


def ResNet10(num_classes: int = 10, dtype=jnp.float32) -> ResNet:
    return ResNet(BasicBlock, (1, 1, 1, 1), num_classes, expansion=1, dtype=dtype)


def ResNet18(num_classes: int = 10, dtype=jnp.float32) -> ResNet:
    return ResNet(BasicBlock, (2, 2, 2, 2), num_classes, expansion=1, dtype=dtype)


def ResNet34(num_classes: int = 10, dtype=jnp.float32) -> ResNet:
    return ResNet(BasicBlock, (3, 4, 6, 3), num_classes, expansion=1, dtype=dtype)


def ResNet50(num_classes: int = 10, dtype=jnp.float32) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 6, 3), num_classes, expansion=4, dtype=dtype)


def ResNet101(num_classes: int = 10, dtype=jnp.float32) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 23, 3), num_classes, expansion=4, dtype=dtype)


def ResNet152(num_classes: int = 10, dtype=jnp.float32) -> ResNet:
    return ResNet(Bottleneck, (3, 8, 36, 3), num_classes, expansion=4, dtype=dtype)


# torchvision-style ImageNet ResNets (lowercase names, matching the
# reference's torchvision star-import; same layer naming, so the .pth
# converter handles them — torchvision's stem conv1/bn1 and `fc` head map
# onto conv1/bn1/linear).
def resnet18(num_classes: int = 1000, dtype=jnp.float32) -> ResNet:
    return ResNet(BasicBlock, (2, 2, 2, 2), num_classes, expansion=1,
                  imagenet_stem=True, dtype=dtype)


def resnet34(num_classes: int = 1000, dtype=jnp.float32) -> ResNet:
    return ResNet(BasicBlock, (3, 4, 6, 3), num_classes, expansion=1,
                  imagenet_stem=True, dtype=dtype)


def resnet50(num_classes: int = 1000, dtype=jnp.float32) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 6, 3), num_classes, expansion=4,
                  imagenet_stem=True, dtype=dtype)


def resnet101(num_classes: int = 1000, dtype=jnp.float32) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 23, 3), num_classes, expansion=4,
                  imagenet_stem=True, dtype=dtype)


def resnet152(num_classes: int = 1000, dtype=jnp.float32) -> ResNet:
    """torchvision resnet152 (named in reference README's zoo examples)."""
    return ResNet(Bottleneck, (3, 8, 36, 3), num_classes, expansion=4,
                  imagenet_stem=True, dtype=dtype)


# torchvision ResNeXt / wide-ResNet variants (reached by the reference via
# its torchvision star-import). Same key layout as torchvision resnets
# (downsample.{0,1}, fc) so the converter handles them unchanged.
def resnext50_32x4d(num_classes: int = 1000, dtype=jnp.float32) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 6, 3), num_classes, expansion=4,
                  groups=32, base_width=4, imagenet_stem=True, dtype=dtype)


def resnext101_32x8d(num_classes: int = 1000, dtype=jnp.float32) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 23, 3), num_classes, expansion=4,
                  groups=32, base_width=8, imagenet_stem=True, dtype=dtype)


def wide_resnet50_2(num_classes: int = 1000, dtype=jnp.float32) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 6, 3), num_classes, expansion=4,
                  base_width=128, imagenet_stem=True, dtype=dtype)


def wide_resnet101_2(num_classes: int = 1000, dtype=jnp.float32) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 23, 3), num_classes, expansion=4,
                  base_width=128, imagenet_stem=True, dtype=dtype)
