"""Flax backbone registry.

The reference exposes any zoo model by name via ``getattr(models, arch)``
(reference models/__init__.py:1-12). Here the registry is an explicit dict
of constructors ``arch -> (num_classes, dtype) -> nn.Module``; the same
names the reference uses keep CLI/checkpoint compatibility.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .alexnet import AlexNet, alexnet
from . import efficientnet as _efficientnet
from .efficientnet import EfficientNet
from .efficientnet import *  # noqa: F401,F403 — the b0..b8 x {,b,c} grid
from .densenet import (
    DenseNet,
    densenet121,
    densenet161,
    densenet169,
    densenet201,
)
from .googlenet import GoogLeNet, googlenet
from .inception import InceptionV3, inception_v3
from .mnasnet import MNASNet, mnasnet0_5, mnasnet0_75, mnasnet1_0, mnasnet1_3
from .mobilenet import MobileNetV2, mobilenet_v2
from .resnet import (
    ResNet,
    ResNet10,
    ResNet18,
    ResNet34,
    ResNet50,
    ResNet101,
    ResNet152,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    resnext50_32x4d,
    resnext101_32x8d,
    wide_resnet50_2,
    wide_resnet101_2,
)
from .shufflenet import (
    ShuffleNetV2,
    shufflenet_v2_x0_5,
    shufflenet_v2_x1_0,
    shufflenet_v2_x1_5,
    shufflenet_v2_x2_0,
)
from .squeezenet import SqueezeNet, squeezenet1_0, squeezenet1_1
from .vgg import (
    VGG,
    vgg11,
    vgg13,
    vgg16,
    vgg19,
    vgg11_bn,
    vgg13_bn,
    vgg16_bn,
    vgg19_bn,
)
from .vit import ViT, vit_b16, vit_s16
from .wideresnet import WRN, wrn28_10, wrn28_10_cifar10, wrn28_10_cifar100

MODEL_REGISTRY: Dict[str, Callable] = {
    "ResNet10": ResNet10,
    "ResNet18": ResNet18,
    "ResNet34": ResNet34,
    "ResNet50": ResNet50,
    "ResNet101": ResNet101,
    "ResNet152": ResNet152,
    # torchvision-style ImageNet ResNets (reference reaches these through
    # its torchvision star-import; lowercase names are torchvision's)
    "resnet18": resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "resnet101": resnet101,
    "resnet152": resnet152,
    "resnext50_32x4d": resnext50_32x4d,
    "resnext101_32x8d": resnext101_32x8d,
    "wide_resnet50_2": wide_resnet50_2,
    "wide_resnet101_2": wide_resnet101_2,
    "wrn28_10": wrn28_10,
    "wrn28_10_cifar10": wrn28_10_cifar10,
    "wrn28_10_cifar100": wrn28_10_cifar100,
    # pytorchcv's efficientnet module exports b0..b8 plus the TF-mode "b"
    # (ported) and "c" (AdvProp) weight families — all reachable through the
    # reference's star-import (reference models/__init__.py:3); the module
    # defines every one of them, so register the full b0..b8 x {,b,c} grid.
    **{name: getattr(_efficientnet, name)
       for name in _efficientnet.__all__ if name != "EfficientNet"},
    "vit_b16": vit_b16,
    "vit_s16": vit_s16,
    "mobilenet_v2": mobilenet_v2,
    "densenet121": densenet121,
    "densenet161": densenet161,
    "densenet169": densenet169,
    "densenet201": densenet201,
    "vgg11": vgg11,
    "vgg13": vgg13,
    "vgg16": vgg16,
    "vgg19": vgg19,
    "vgg11_bn": vgg11_bn,
    "vgg13_bn": vgg13_bn,
    "vgg16_bn": vgg16_bn,
    "vgg19_bn": vgg19_bn,
    "alexnet": alexnet,
    "googlenet": googlenet,
    "inception_v3": inception_v3,
    "mnasnet0_5": mnasnet0_5,
    "mnasnet0_75": mnasnet0_75,
    "mnasnet1_0": mnasnet1_0,
    "mnasnet1_3": mnasnet1_3,
    "squeezenet1_0": squeezenet1_0,
    "squeezenet1_1": squeezenet1_1,
    "shufflenet_v2_x0_5": shufflenet_v2_x0_5,
    "shufflenet_v2_x1_0": shufflenet_v2_x1_0,
    "shufflenet_v2_x1_5": shufflenet_v2_x1_5,
    "shufflenet_v2_x2_0": shufflenet_v2_x2_0,
}


def register_model(name: str, ctor: Optional[Callable] = None,
                   override: bool = False) -> Callable:
    """Register a custom backbone constructor (the reference's equivalent is
    defining YourNet in nbdt/models and star-importing it — README's
    ``--arch=yournet18`` flow). ``ctor(num_classes, dtype) -> nn.Module``;
    the module must expose ``__call__(x, train, features_only)`` and a
    classifier layer probe-able by hierarchy induction (a Dense named
    ``linear``/``fc``/``output`` or any MODEL_FC_KEYS name).

    Re-registering an existing name raises unless ``override=True`` —
    silently replacing a built-in would redirect every downstream
    get_model() (checkpoint conversion, induction, CLIs) to the wrong
    backbone.

    Usable as a decorator::

        @register_model("yournet18")
        def yournet18(num_classes=10, dtype=jnp.float32): ...
    """
    if ctor is None:
        return lambda fn: register_model(name, fn, override=override)
    if name in MODEL_REGISTRY and not override:
        raise ValueError(
            f"arch {name!r} is already registered; pass override=True to "
            "replace it"
        )
    MODEL_REGISTRY[name] = ctor
    return ctor


def get_model_choices():
    return sorted(MODEL_REGISTRY)


def get_model(arch: str, num_classes: int, dtype=jnp.float32, **kwargs):
    """Construct a backbone module by name.

    Extra keyword arguments pass through to the constructor (e.g.
    ``transform_input=True`` for googlenet/inception_v3 when loading
    torchvision *pretrained* checkpoints, which force it True).
    """
    if arch not in MODEL_REGISTRY:
        raise KeyError(f"Unknown arch {arch!r}. Choices: {get_model_choices()}")
    return MODEL_REGISTRY[arch](num_classes=num_classes, dtype=dtype, **kwargs)


def init_model(arch: str, num_classes: int, input_shape, seed: int = 0,
               dtype=jnp.float32):
    """Construct + initialize a backbone. Returns (module, variables)."""
    module = get_model(arch, num_classes, dtype=dtype)
    rng = jax.random.PRNGKey(seed)
    variables = module.init(rng, jnp.zeros((1,) + tuple(input_shape)), train=False)
    return module, variables


def make_eval_fn(module, variables):
    """Jitted eval-mode forward: x -> logits."""
    import functools

    # Pin the closure to DEVICE arrays: callers often hand over host numpy
    # (checkpoint conversions), which would lower as inline HLO constants —
    # the recorded 150MB-literal compile stall (CLAUDE.md) — and re-upload
    # weights per call. Same fix as serving.make_serving_fn.
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    @functools.partial(jax.jit)
    def forward(x):
        return module.apply(variables, x, train=False)

    return forward
