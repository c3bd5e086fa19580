"""torch state-dict -> Flax variables converter.

Checkpoint parity is a hard requirement (SURVEY §7: the final FC weights are
the clustering input for hierarchy induction, so conversion must be exact).
Conversion is rule-driven over flat torch keys:

  * conv ``weight`` [O, I, kh, kw] -> ``kernel`` HWIO (transpose 2,3,1,0)
  * linear ``weight`` [C, D] -> ``kernel`` [D, C] (transpose)
  * BN ``weight``/``bias`` -> ``scale``/``bias`` (params collection);
    ``running_mean``/``running_var`` -> ``mean``/``var`` (batch_stats)

Key layouts handled: this repo's Flax ResNet (reference nbdt/models/
resnet.py torch naming: conv1, bn1, layerS.I.*, shortcut.0/.1, linear) and
pytorchcv's CIFAR WRN naming (features.init_block, features.stageS.unitU.
body.convX.{bn,conv}, identity_conv, post_activ, output).
"""

from __future__ import annotations

import re
import warnings
from typing import Dict, Optional, Tuple

import numpy as np

from .utils import coerce_state_dict


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_BN_PARTS = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def _resnet_key_to_path(key: str) -> Optional[Tuple[str, Tuple[str, ...], str]]:
    """Map reference-ResNet torch keys to (collection, module path, leaf kind).

    Returns (collection, path, kind) with kind in {conv, linear, bn-<part>},
    or None if the key is not recognized (e.g. num_batches_tracked).
    """
    if key in ("linear.weight", "linear.bias", "fc.weight", "fc.bias"):
        name, part = key.split(".")
        return ("params", ("linear",), "linear-" + part)
    m = re.fullmatch(r"(conv1)\.weight", key)
    if m:
        return ("params", ("conv1",), "conv")
    m = re.fullmatch(r"(bn1)\.(\w+)", key)
    if m and m.group(2) in _BN_PARTS:
        coll, leaf = _BN_PARTS[m.group(2)]
        return (coll, ("bn1",), "bn-" + leaf)
    m = re.fullmatch(r"layer(\d+)\.(\d+)\.(conv\d)\.weight", key)
    if m:
        block = f"layer{m.group(1)}_{m.group(2)}"
        return ("params", (block, m.group(3)), "conv")
    m = re.fullmatch(r"layer(\d+)\.(\d+)\.(bn\d)\.(\w+)", key)
    if m and m.group(4) in _BN_PARTS:
        coll, leaf = _BN_PARTS[m.group(4)]
        block = f"layer{m.group(1)}_{m.group(2)}"
        return (coll, (block, m.group(3)), "bn-" + leaf)
    # Both the reference's `shortcut.{0,1}` and torchvision's
    # `downsample.{0,1}` namings map onto the same Flax modules.
    m = re.fullmatch(r"layer(\d+)\.(\d+)\.(?:shortcut|downsample)\.0\.weight", key)
    if m:
        block = f"layer{m.group(1)}_{m.group(2)}"
        return ("params", (block, "shortcut_conv"), "conv")
    m = re.fullmatch(r"layer(\d+)\.(\d+)\.(?:shortcut|downsample)\.1\.(\w+)", key)
    if m and m.group(3) in _BN_PARTS:
        coll, leaf = _BN_PARTS[m.group(3)]
        block = f"layer{m.group(1)}_{m.group(2)}"
        return (coll, (block, "shortcut_bn"), "bn-" + leaf)
    return None


def _wrn_key_to_path(key: str) -> Optional[Tuple[str, Tuple[str, ...], str]]:
    """Map pytorchcv CIFAR-WRN torch keys to Flax paths (see module doc)."""
    if key in ("output.weight", "output.bias"):
        return ("params", ("output",), "linear-" + key.split(".")[1])
    if key in ("features.init_block.weight", "features.init_block.conv.weight"):
        return ("params", ("init_conv",), "conv")
    m = re.fullmatch(
        r"features\.stage(\d+)\.unit(\d+)\.body\.conv(\d)\.conv\.weight", key
    )
    if m:
        unit = f"stage{m.group(1)}_unit{m.group(2)}"
        return ("params", (unit, f"conv{m.group(3)}"), "conv")
    m = re.fullmatch(
        r"features\.stage(\d+)\.unit(\d+)\.body\.conv(\d)\.bn\.(\w+)", key
    )
    if m and m.group(4) in _BN_PARTS:
        coll, leaf = _BN_PARTS[m.group(4)]
        unit = f"stage{m.group(1)}_unit{m.group(2)}"
        return (coll, (unit, f"bn{m.group(3)}"), "bn-" + leaf)
    m = re.fullmatch(
        r"features\.stage(\d+)\.unit(\d+)\.identity_conv(?:\.conv)?\.weight", key
    )
    if m:
        unit = f"stage{m.group(1)}_unit{m.group(2)}"
        return ("params", (unit, "identity_conv"), "conv")
    m = re.fullmatch(r"features\.post_activ\.bn\.(\w+)", key)
    if m and m.group(1) in _BN_PARTS:
        coll, leaf = _BN_PARTS[m.group(1)]
        return (coll, ("post_bn",), "bn-" + leaf)
    return None


def _squeezenet_key_to_path(key: str) -> Optional[Tuple[str, Tuple[str, ...], str]]:
    """torchvision SqueezeNet keys (features.{i}[.fire-sub], classifier.1)
    -> Flax paths (models/squeezenet.py mirrors the Sequential indices)."""
    m = re.fullmatch(r"features\.(\d+)\.(weight|bias)", key)
    if m:
        return ("params", (f"f{m.group(1)}",),
                "conv" if m.group(2) == "weight" else "bias")
    m = re.fullmatch(
        r"features\.(\d+)\.(squeeze|expand1x1|expand3x3)\.(weight|bias)", key
    )
    if m:
        return ("params", (f"f{m.group(1)}", m.group(2)),
                "conv" if m.group(3) == "weight" else "bias")
    m = re.fullmatch(r"classifier\.1\.(weight|bias)", key)
    if m:
        return ("params", ("classifier",),
                "conv" if m.group(1) == "weight" else "bias")
    return None


# which Sequential indices inside a ShuffleNetV2 branch are convs (the rest
# are BatchNorms; ReLUs carry no weights)
_SHUFFLE_CONV_IDX = {1: {0, 2}, 2: {0, 3, 5}}


def _shufflenet_key_to_path(key: str) -> Optional[Tuple[str, Tuple[str, ...], str]]:
    """torchvision ShuffleNetV2 keys -> Flax paths
    (models/shufflenet.py mirrors conv1/stage{s}.{u}.branch{b}.{i}/conv5/fc)."""
    if key in ("fc.weight", "fc.bias"):
        return ("params", ("fc",), "linear-" + key.split(".")[1])
    m = re.fullmatch(r"conv([15])\.(\d)\.(\w+)", key)
    if m:
        block = f"conv{m.group(1)}_{m.group(2)}"
        if m.group(2) == "0":
            return ("params", (block,), "conv") if m.group(3) == "weight" \
                else None
        if m.group(3) in _BN_PARTS:
            coll, leaf = _BN_PARTS[m.group(3)]
            return (coll, (block,), "bn-" + leaf)
        return None
    m = re.fullmatch(r"stage(\d)\.(\d+)\.branch(\d)\.(\d)\.(\w+)", key)
    if m:
        unit = f"stage{m.group(1)}_{m.group(2)}"
        b, i, part = int(m.group(3)), int(m.group(4)), m.group(5)
        sub = f"b{b}_{i}"
        if i in _SHUFFLE_CONV_IDX[b]:
            return ("params", (unit, sub), "conv") if part == "weight" \
                else None
        if part in _BN_PARTS:
            coll, leaf = _BN_PARTS[part]
            return (coll, (unit, sub), "bn-" + leaf)
    return None


def _densenet_key_to_path(key: str) -> Optional[Tuple[str, Tuple[str, ...], str]]:
    """torchvision DenseNet keys (features.conv0/norm0, denseblock{b}.
    denselayer{l}.{norm1,conv1,norm2,conv2}, transition{t}.{norm,conv},
    norm5, classifier) -> Flax paths (models/densenet.py: stem/stem_bn,
    block{b-1}_layer{l-1}/{bn1,conv1,bn2,conv2}, trans{t-1}_{bn,conv},
    final_bn, classifier)."""
    if key in ("classifier.weight", "classifier.bias"):
        return ("params", ("classifier",), "linear-" + key.split(".")[1])
    if key == "features.conv0.weight":
        return ("params", ("stem",), "conv")
    m = re.fullmatch(r"features\.norm0\.(\w+)", key)
    if m and m.group(1) in _BN_PARTS:
        coll, leaf = _BN_PARTS[m.group(1)]
        return (coll, ("stem_bn",), "bn-" + leaf)
    m = re.fullmatch(
        r"features\.denseblock(\d+)\.denselayer(\d+)\.(conv[12])\.weight", key
    )
    if m:
        block = f"block{int(m.group(1)) - 1}_layer{int(m.group(2)) - 1}"
        return ("params", (block, m.group(3)), "conv")
    m = re.fullmatch(
        r"features\.denseblock(\d+)\.denselayer(\d+)\.(norm[12])\.(\w+)", key
    )
    if m and m.group(4) in _BN_PARTS:
        coll, leaf = _BN_PARTS[m.group(4)]
        block = f"block{int(m.group(1)) - 1}_layer{int(m.group(2)) - 1}"
        return (coll, (block, "bn" + m.group(3)[-1]), "bn-" + leaf)
    m = re.fullmatch(r"features\.transition(\d+)\.conv\.weight", key)
    if m:
        return ("params", (f"trans{int(m.group(1)) - 1}_conv",), "conv")
    m = re.fullmatch(r"features\.transition(\d+)\.norm\.(\w+)", key)
    if m and m.group(2) in _BN_PARTS:
        coll, leaf = _BN_PARTS[m.group(2)]
        return (coll, (f"trans{int(m.group(1)) - 1}_bn",), "bn-" + leaf)
    m = re.fullmatch(r"features\.norm5\.(\w+)", key)
    if m and m.group(1) in _BN_PARTS:
        coll, leaf = _BN_PARTS[m.group(1)]
        return (coll, ("final_bn",), "bn-" + leaf)
    return None


def _mobilenet_key_to_path(key: str) -> Optional[Tuple[str, Tuple[str, ...], str]]:
    """torchvision MobileNetV2 keys -> Flax paths (models/mobilenet.py).

    torch layout: features.0.{0,1} stem, features.{1..17}.conv.* inverted
    residuals (block 1 has expand_ratio 1 so its conv Sequential is
    [dw, dw_bn, project, project_bn]; the rest prepend [expand, expand_bn]),
    features.18.{0,1} head, classifier.1 linear."""
    if key in ("classifier.1.weight", "classifier.1.bias"):
        return ("params", ("classifier",), "linear-" + key.split(".")[2])
    m = re.fullmatch(r"features\.0\.0\.weight", key)
    if m:
        return ("params", ("stem",), "conv")
    m = re.fullmatch(r"features\.0\.1\.(\w+)", key)
    if m and m.group(1) in _BN_PARTS:
        coll, leaf = _BN_PARTS[m.group(1)]
        return (coll, ("stem_bn",), "bn-" + leaf)
    m = re.fullmatch(r"features\.18\.0\.weight", key)
    if m:
        return ("params", ("head_conv",), "conv")
    m = re.fullmatch(r"features\.18\.1\.(\w+)", key)
    if m and m.group(1) in _BN_PARTS:
        coll, leaf = _BN_PARTS[m.group(1)]
        return (coll, ("head_bn",), "bn-" + leaf)
    m = re.fullmatch(r"features\.(\d+)\.conv\.([\d.]+)\.(\w+)", key)
    if m:
        block = f"block{int(m.group(1)) - 1}"
        # Sequential position -> (flax submodule, is_conv); torchvision's
        # first inverted residual (expand_ratio=1) omits the expand pair.
        t1 = int(m.group(1)) == 1
        layout = (
            {"0.0": ("depthwise", True), "0.1": ("depthwise_bn", False),
             "1": ("project", True), "2": ("project_bn", False)}
            if t1 else
            {"0.0": ("expand", True), "0.1": ("expand_bn", False),
             "1.0": ("depthwise", True), "1.1": ("depthwise_bn", False),
             "2": ("project", True), "3": ("project_bn", False)}
        )
        sub = layout.get(m.group(2))
        if sub is None:
            return None
        name, is_conv = sub
        if is_conv:
            return ("params", (block, name), "conv") \
                if m.group(3) == "weight" else None
        if m.group(3) in _BN_PARTS:
            coll, leaf = _BN_PARTS[m.group(3)]
            return (coll, (block, name), "bn-" + leaf)
    return None


def _alexnet_key_to_path(key: str) -> Optional[Tuple[str, Tuple[str, ...], str]]:
    """torchvision AlexNet keys (features.{i}, classifier.{1,4,6}) -> Flax
    paths (models/alexnet.py: f{i}, fc1/fc2/classifier)."""
    m = re.fullmatch(r"features\.(\d+)\.(weight|bias)", key)
    if m:
        return ("params", (f"f{m.group(1)}",),
                "conv" if m.group(2) == "weight" else "bias")
    m = re.fullmatch(r"classifier\.([146])\.(weight|bias)", key)
    if m:
        name = {"1": "fc1", "4": "fc2", "6": "classifier"}[m.group(1)]
        return ("params", (name,), "linear-" + m.group(2))
    return None


def _vgg_layout(depth: int, bn: bool):
    """torchvision VGG features.* Sequential indices -> Flax conv/bn
    counters: conv at i, then (bn,) relu; 'M' maxpools occupy one slot."""
    from .vgg import _CONFIGS

    conv_at, bn_at, seq, i = {}, {}, 0, 0
    for v in _CONFIGS[depth]:
        if v == "M":
            seq += 1
            continue
        conv_at[seq] = i
        seq += 1
        if bn:
            bn_at[seq] = i
            seq += 1
        seq += 1  # ReLU
        i += 1
    return conv_at, bn_at


def _make_vgg_mapper(depth: int, bn: bool):
    """torchvision VGG keys -> Flax paths (models/vgg.py names). The MLP
    head (classifier.{0,3,6}) maps onto the ``classic_head=True`` modules
    fc1/fc2/classifier; collapsed-head models have no torchvision
    checkpoint form (documented deviation, docs/ZOO.md)."""
    conv_at, bn_at = _vgg_layout(depth, bn)

    def mapper(key: str):
        m = re.fullmatch(r"features\.(\d+)\.(\w+)", key)
        if m:
            idx, part = int(m.group(1)), m.group(2)
            if idx in conv_at and part in ("weight", "bias"):
                return ("params", (f"conv{conv_at[idx]}",),
                        "conv" if part == "weight" else "bias")
            if idx in bn_at and part in _BN_PARTS:
                coll, leaf = _BN_PARTS[part]
                return (coll, (f"bn{bn_at[idx]}",), "bn-" + leaf)
            return None
        m = re.fullmatch(r"classifier\.([036])\.(weight|bias)", key)
        if m:
            name = {"0": "fc1", "3": "fc2", "6": "classifier"}[m.group(1)]
            return ("params", (name,), "linear-" + m.group(2))
        return None

    return mapper


# train-only auxiliary classifier heads (GoogLeNet aux1/aux2, Inception v3
# AuxLogits) — never part of eval logits, deliberately not built in Flax
_AUX_PREFIXES = ("aux1.", "aux2.", "AuxLogits.")


def _inception_key_to_path(key: str):
    """GoogLeNet / Inception-v3 keys -> Flax paths. Module names mirror the
    torch attribute paths; Sequential indices fuse into the parent name
    (``branch2.0`` -> ``branch2_0``). Aux-head keys return "skip"."""
    if key.startswith(_AUX_PREFIXES):
        return "skip"
    if key in ("fc.weight", "fc.bias"):
        return ("params", ("fc",), "linear-" + key.split(".")[1])
    parts = key.split(".")
    if len(parts) >= 3 and parts[-2] in ("conv", "bn"):
        mods = []
        for p in parts[:-2]:
            if p.isdigit() and mods:
                mods[-1] = f"{mods[-1]}_{p}"
            else:
                mods.append(p)
        if parts[-2] == "conv" and parts[-1] == "weight":
            return ("params", tuple(mods) + ("conv",), "conv")
        if parts[-2] == "bn" and parts[-1] in _BN_PARTS:
            coll, leaf = _BN_PARTS[parts[-1]]
            return (coll, tuple(mods) + ("bn",), "bn-" + leaf)
    return None


# MNASNet `layers` Sequential: convs at 0/3/6/14 (stem + head) and 0/3/6
# inside each inverted residual; BNs at the index right after each conv
_MNAS_STEM_CONV, _MNAS_STEM_BN = {0, 3, 6, 14}, {1, 4, 7, 15}
_MNAS_BLOCK_CONV, _MNAS_BLOCK_BN = {0, 3, 6}, {1, 4, 7}


def _mnasnet_key_to_path(key: str) -> Optional[Tuple[str, Tuple[str, ...], str]]:
    """torchvision MNASNet keys (layers.{i}[.{r}.layers.{j}], classifier.1)
    -> Flax paths (models/mnasnet.py: l{i}[, l{i}_{r}/conv{j}|bn{j}])."""
    if key in ("classifier.1.weight", "classifier.1.bias"):
        return ("params", ("classifier",), "linear-" + key.split(".")[2])
    m = re.fullmatch(r"layers\.(\d+)\.(\w+)", key)
    if m:
        i, part = int(m.group(1)), m.group(2)
        if part == "weight" and i in _MNAS_STEM_CONV:
            return ("params", (f"l{i}",), "conv")
        if i in _MNAS_STEM_BN and part in _BN_PARTS:
            coll, leaf = _BN_PARTS[part]
            return (coll, (f"l{i}",), "bn-" + leaf)
        return None
    m = re.fullmatch(r"layers\.(\d+)\.(\d+)\.layers\.(\d+)\.(\w+)", key)
    if m:
        block = f"l{m.group(1)}_{m.group(2)}"
        j, part = int(m.group(3)), m.group(4)
        if part == "weight" and j in _MNAS_BLOCK_CONV:
            return ("params", (block, f"conv{j}"), "conv")
        if j in _MNAS_BLOCK_BN and part in _BN_PARTS:
            coll, leaf = _BN_PARTS[part]
            return (coll, (block, f"bn{j}"), "bn-" + leaf)
    return None


_ARCH_MAPPERS = {
    "ResNet10": _resnet_key_to_path,
    "ResNet18": _resnet_key_to_path,
    "ResNet34": _resnet_key_to_path,
    "ResNet50": _resnet_key_to_path,
    "ResNet101": _resnet_key_to_path,
    "ResNet152": _resnet_key_to_path,
    # torchvision ImageNet ResNet family: same key grammar as the reference
    # CIFAR ResNets (the mapper accepts both shortcut.* and downsample.*)
    "resnet18": _resnet_key_to_path,
    "resnet34": _resnet_key_to_path,
    "resnet50": _resnet_key_to_path,
    "resnet101": _resnet_key_to_path,
    "resnet152": _resnet_key_to_path,
    "resnext50_32x4d": _resnet_key_to_path,
    "resnext101_32x8d": _resnet_key_to_path,
    "wide_resnet50_2": _resnet_key_to_path,
    "wide_resnet101_2": _resnet_key_to_path,
    "wrn28_10": _wrn_key_to_path,
    "wrn28_10_cifar10": _wrn_key_to_path,
    "wrn28_10_cifar100": _wrn_key_to_path,
    "squeezenet1_0": _squeezenet_key_to_path,
    "squeezenet1_1": _squeezenet_key_to_path,
    "shufflenet_v2_x0_5": _shufflenet_key_to_path,
    "shufflenet_v2_x1_0": _shufflenet_key_to_path,
    "shufflenet_v2_x1_5": _shufflenet_key_to_path,
    "shufflenet_v2_x2_0": _shufflenet_key_to_path,
    "densenet121": _densenet_key_to_path,
    "densenet161": _densenet_key_to_path,
    "densenet169": _densenet_key_to_path,
    "densenet201": _densenet_key_to_path,
    "mobilenet_v2": _mobilenet_key_to_path,
    "alexnet": _alexnet_key_to_path,
    "googlenet": _inception_key_to_path,
    "inception_v3": _inception_key_to_path,
    "mnasnet0_5": _mnasnet_key_to_path,
    "mnasnet0_75": _mnasnet_key_to_path,
    "mnasnet1_0": _mnasnet_key_to_path,
    "mnasnet1_3": _mnasnet_key_to_path,
    "vgg11": _make_vgg_mapper(11, bn=False),
    "vgg13": _make_vgg_mapper(13, bn=False),
    "vgg16": _make_vgg_mapper(16, bn=False),
    "vgg19": _make_vgg_mapper(19, bn=False),
    "vgg11_bn": _make_vgg_mapper(11, bn=True),
    "vgg13_bn": _make_vgg_mapper(13, bn=True),
    "vgg16_bn": _make_vgg_mapper(16, bn=True),
    "vgg19_bn": _make_vgg_mapper(19, bn=True),
}


# ---------------------------------------------------------------------------
# Spec-driven converters: EfficientNet (pytorchcv naming) + ViT (torchvision)
# ---------------------------------------------------------------------------
#
# A *spec* is the full, ordered list of (torch_key, collection, flax_path,
# kind) for an architecture instance — generated from the same compound/depth
# config the Flax module uses, so completeness is structural: conversion
# asserts every spec key exists in the checkpoint and every checkpoint weight
# is consumed. Kinds:
#   conv      [O,I,kh,kw] -> HWIO kernel  (also depthwise + 1x1 SE convs)
#   linear    [C,D] -> [D,C] kernel
#   raw       copied as-is (biases, BN stats, cls token, pos embeddings)
#   qkv_w/qkv_b/outproj_w  torch MultiheadAttention packed projections ->
#             flax MultiHeadDotProductAttention per-head kernels


def _efficientnet_spec(variant: str):
    """pytorchcv EfficientNet state-dict layout (efficientnet.py in
    pytorchcv): features.init_block / stage{g}.unit{u} / final_block +
    output.fc. pytorchcv groups units into 5 stages broken at stride-2
    boundaries; this repo's module keeps the 7 base stages — the flattened
    block order is identical, so units pair 1:1."""
    import math

    from .efficientnet import BASE_STAGES, COMPOUND

    wm, dm, _, _ = COMPOUND[variant]
    entries = []

    def conv(tk, *path):
        entries.append((tk, "params", path + ("kernel",), "conv"))

    def raw(tk, coll, *path):
        entries.append((tk, coll, path, "raw"))

    def bn(tk_base, flax_name, *prefix):
        for part, (coll, leaf) in _BN_PARTS.items():
            raw(f"{tk_base}.{part}", coll, *(prefix + (flax_name, leaf)))

    conv("features.init_block.conv.conv.weight", "stem_conv")
    bn("features.init_block.conv.bn", "stem_bn")

    # pytorchcv stage of each base stage: new stage at every stride-2 block.
    group_of_base = []
    g = 0
    for _, _, _, stride, _ in BASE_STAGES:
        if stride == 2 or not group_of_base:
            g += 1
        group_of_base.append(g)
    unit_counter: Dict[int, int] = {}
    for si, (expand, c, repeats, stride, kernel) in enumerate(BASE_STAGES):
        n = int(math.ceil(repeats * dm))
        g = group_of_base[si]
        for bi in range(n):
            u = unit_counter.get(g, 0) + 1
            unit_counter[g] = u
            tb = f"features.stage{g}.unit{u}"
            fb = f"stage{si + 1}_block{bi + 1}"
            if expand == 1:  # pytorchcv EffiDwsConvUnit
                conv(f"{tb}.dw_conv.conv.weight", fb, "dw_conv")
                bn(f"{tb}.dw_conv.bn", "dw_bn", fb)
                conv(f"{tb}.se.conv1.weight", fb, "se", "reduce")
                raw(f"{tb}.se.conv1.bias", "params", fb, "se", "reduce", "bias")
                conv(f"{tb}.se.conv2.weight", fb, "se", "expand")
                raw(f"{tb}.se.conv2.bias", "params", fb, "se", "expand", "bias")
                conv(f"{tb}.pw_conv.conv.weight", fb, "project_conv")
                bn(f"{tb}.pw_conv.bn", "project_bn", fb)
            else:  # pytorchcv EffiInvResUnit
                conv(f"{tb}.conv1.conv.weight", fb, "expand_conv")
                bn(f"{tb}.conv1.bn", "expand_bn", fb)
                conv(f"{tb}.conv2.conv.weight", fb, "dw_conv")
                bn(f"{tb}.conv2.bn", "dw_bn", fb)
                conv(f"{tb}.se.conv1.weight", fb, "se", "reduce")
                raw(f"{tb}.se.conv1.bias", "params", fb, "se", "reduce", "bias")
                conv(f"{tb}.se.conv2.weight", fb, "se", "expand")
                raw(f"{tb}.se.conv2.bias", "params", fb, "se", "expand", "bias")
                conv(f"{tb}.conv3.conv.weight", fb, "project_conv")
                bn(f"{tb}.conv3.bn", "project_bn", fb)

    conv("features.final_block.conv.weight", "head_conv")
    bn("features.final_block.bn", "head_bn")
    entries.append(("output.fc.weight", "params", ("output", "kernel"), "linear"))
    entries.append(("output.fc.bias", "params", ("output", "bias"), "raw"))
    return entries


def _vit_spec(depth: int = 12):
    """torchvision VisionTransformer state-dict layout (vit_b_16):
    conv_proj, class_token, encoder.pos_embedding,
    encoder.layers.encoder_layer_{i}.{ln_1,self_attention,ln_2,mlp.{0,3}},
    encoder.ln, heads.head."""
    entries = [
        ("conv_proj.weight", "params", ("patch_embed", "kernel"), "conv"),
        ("conv_proj.bias", "params", ("patch_embed", "bias"), "raw"),
        ("class_token", "params", ("cls",), "raw"),
        ("encoder.pos_embedding", "params", ("pos_embed",), "raw"),
    ]
    for i in range(depth):
        tb = f"encoder.layers.encoder_layer_{i}"
        fb = f"block{i}"
        entries += [
            (f"{tb}.ln_1.weight", "params", (fb, "ln1", "scale"), "raw"),
            (f"{tb}.ln_1.bias", "params", (fb, "ln1", "bias"), "raw"),
            (f"{tb}.self_attention.in_proj_weight", "params", (fb, "attn"), "qkv_w"),
            (f"{tb}.self_attention.in_proj_bias", "params", (fb, "attn"), "qkv_b"),
            (f"{tb}.self_attention.out_proj.weight", "params",
             (fb, "attn", "out", "kernel"), "outproj_w"),
            (f"{tb}.self_attention.out_proj.bias", "params",
             (fb, "attn", "out", "bias"), "raw"),
            (f"{tb}.ln_2.weight", "params", (fb, "ln2", "scale"), "raw"),
            (f"{tb}.ln_2.bias", "params", (fb, "ln2", "bias"), "raw"),
            (f"{tb}.mlp.0.weight", "params", (fb, "fc1", "kernel"), "linear"),
            (f"{tb}.mlp.0.bias", "params", (fb, "fc1", "bias"), "raw"),
            (f"{tb}.mlp.3.weight", "params", (fb, "fc2", "kernel"), "linear"),
            (f"{tb}.mlp.3.bias", "params", (fb, "fc2", "bias"), "raw"),
        ]
    entries += [
        ("encoder.ln.weight", "params", ("ln", "scale"), "raw"),
        ("encoder.ln.bias", "params", ("ln", "bias"), "raw"),
        ("heads.head.weight", "params", ("output", "kernel"), "linear"),
        ("heads.head.bias", "params", ("output", "bias"), "raw"),
    ]
    return entries


def _vit_heads(arch: str) -> int:
    return {"vit_s16": 6}.get(arch, 12)


_ARCH_SPECS = {
    # pytorchcv exports b0..b8 plus the TF-mode "b" (ported) and "c"
    # (AdvProp) weight families; all share the plain variants' key layout
    # (pytorchcv get_efficientnet builds one topology for all three).
    **{f"efficientnet_{v}{s}": (lambda v=v: _efficientnet_spec(v))
       for v in ("b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7", "b8")
       for s in ("", "b", "c")},
    "vit_b16": _vit_spec,
    "vit_s16": _vit_spec,
}


def _spec_state_dict_to_flax(state_dict, spec, heads: int) -> dict:
    state_dict = coerce_state_dict(state_dict)
    variables: dict = {"params": {}, "batch_stats": {}}
    consumed = set()
    for tk, coll, path, kind in spec:
        assert tk in state_dict, f"checkpoint missing {tk}"
        v = np.asarray(state_dict[tk])
        consumed.add(tk)
        if kind == "conv":
            _set(variables[coll], path, _conv_kernel(v))
        elif kind == "linear":
            _set(variables[coll], path, v.T)
        elif kind == "raw":
            _set(variables[coll], path, v)
        elif kind == "qkv_w":
            # torch packed in_proj_weight [3D, D]; torch computes x @ W.T,
            # flax q = x @ kernel[D, H, hd] -> kernel = W_q.T reshaped.
            d = v.shape[1]
            hd = d // heads
            for name, w in zip(("query", "key", "value"), np.split(v, 3, axis=0)):
                _set(variables[coll], path + (name, "kernel"),
                     np.ascontiguousarray(w.T).reshape(d, heads, hd))
        elif kind == "qkv_b":
            d = v.shape[0] // 3
            hd = d // heads
            for name, b in zip(("query", "key", "value"), np.split(v, 3)):
                _set(variables[coll], path + (name, "bias"),
                     b.reshape(heads, hd))
        elif kind == "outproj_w":
            # torch out = attn @ W_o.T, W_o [D, D]; flax out kernel [H,hd,D].
            d = v.shape[0]
            hd = d // heads
            _set(variables[coll], path,
                 np.ascontiguousarray(v.T).reshape(heads, hd, d))
        else:  # pragma: no cover
            raise AssertionError(kind)
    leftovers = [
        k for k in state_dict
        if k not in consumed and not k.endswith("num_batches_tracked")
    ]
    assert not leftovers, f"Unmapped checkpoint keys: {leftovers[:8]}"
    if not variables["batch_stats"]:
        variables.pop("batch_stats")
    return variables


def _spec_flax_to_state_dict(variables, spec, heads: int) -> Dict[str, np.ndarray]:
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}

    def get(coll, path):
        node = params if coll == "params" else stats
        for p in path:
            node = node[p]
        return np.asarray(node)

    for tk, coll, path, kind in spec:
        if kind == "conv":
            out[tk] = np.transpose(get(coll, path), (3, 2, 0, 1))
        elif kind == "linear":
            out[tk] = get(coll, path).T
        elif kind == "raw":
            out[tk] = get(coll, path)
        elif kind == "qkv_w":
            ws = [
                get(coll, path + (n, "kernel")) for n in ("query", "key", "value")
            ]
            d = ws[0].shape[0]
            out[tk] = np.concatenate([w.reshape(d, d).T for w in ws], axis=0)
        elif kind == "qkv_b":
            out[tk] = np.concatenate([
                get(coll, path + (n, "bias")).reshape(-1)
                for n in ("query", "key", "value")
            ])
        elif kind == "outproj_w":
            w = get(coll, path)  # [H, hd, D]
            d = w.shape[-1]
            out[tk] = w.reshape(d, d).T
    return out


def torch_state_dict_to_flax(state_dict: Dict[str, np.ndarray], arch: str) -> dict:
    """Convert a flat torch state dict to Flax variables
    ``{"params": ..., "batch_stats": ...}``. Raises on unmapped weights so
    silent drops (and the accuracy loss they cause) are impossible.
    """
    if arch in ("googlenet", "inception_v3"):
        # torchvision's *pretrained* loaders force transform_input=True;
        # a converted released checkpoint reproduces torch logits only if
        # the Flax model is built with transform_input=True too.
        warnings.warn(
            f"torchvision pretrained {arch} checkpoints are trained with "
            "transform_input=True; build the Flax model with "
            "transform_input=True (e.g. models.googlenet(..., "
            "transform_input=True)) or its logits will differ.",
            stacklevel=2)
    if arch in _ARCH_SPECS:
        return _spec_state_dict_to_flax(
            state_dict, _ARCH_SPECS[arch](), heads=_vit_heads(arch)
        )
    mapper = _ARCH_MAPPERS.get(arch, _resnet_key_to_path)
    state_dict = coerce_state_dict(state_dict)
    variables: dict = {"params": {}, "batch_stats": {}}
    unmapped = []
    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        value = np.asarray(value)
        resolved = mapper(key)
        if resolved == "skip":  # e.g. train-only aux heads not built in Flax
            continue
        if resolved is None:
            unmapped.append(key)
            continue
        coll, path, kind = resolved
        if kind == "conv":
            _set(variables[coll], path + ("kernel",), _conv_kernel(value))
        elif kind == "linear-weight":
            _set(variables[coll], path + ("kernel",), value.T)
        elif kind == "linear-bias":
            _set(variables[coll], path + ("bias",), value)
        elif kind == "bias":  # conv bias (SqueezeNet)
            _set(variables[coll], path + ("bias",), value)
        elif kind.startswith("bn-"):
            _set(variables[coll], path + (kind[3:],), value)
        else:  # pragma: no cover
            raise AssertionError(kind)
    assert not unmapped, f"Unmapped checkpoint keys for arch {arch}: {unmapped}"
    if not variables["batch_stats"]:  # BN-free archs (AlexNet, plain VGG)
        variables.pop("batch_stats")
    return variables


def flax_to_torch_state_dict(variables: dict, arch: str) -> Dict[str, np.ndarray]:
    """Inverse conversion (for exporting checkpoints the reference can load).

    Round-trips through the same rule tables by enumerating known torch keys
    from the Flax tree structure.
    """
    if arch in _ARCH_SPECS:
        return _spec_flax_to_state_dict(
            variables, _ARCH_SPECS[arch](), heads=_vit_heads(arch)
        )
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}

    def emit(torch_key: str, coll: str, path: Tuple[str, ...], kind: str) -> None:
        tree = params if coll == "params" else stats
        node = tree
        for p in path:
            node = node[p]
        if kind == "conv":
            out[torch_key] = np.transpose(node["kernel"], (3, 2, 0, 1))
        elif kind == "linear-weight":
            out[torch_key] = np.asarray(node["kernel"]).T
        elif kind in ("linear-bias", "bias"):
            out[torch_key] = np.asarray(node["bias"])
        elif kind.startswith("bn-"):
            out[torch_key] = np.asarray(node[kind[3:]])

    mapper = _ARCH_MAPPERS.get(arch, _resnet_key_to_path)
    for torch_key in _enumerate_torch_keys(params, stats, arch):
        resolved = mapper(torch_key)
        if resolved and resolved != "skip":
            emit(torch_key, *resolved)
    return out


def _enumerate_torch_keys(params, stats, arch):
    """Generate candidate torch keys from the Flax module names."""
    keys = []
    bn4 = ("weight", "bias", "running_mean", "running_var")
    if arch.startswith("squeezenet"):
        for name in params:
            if name == "classifier":
                keys += ["classifier.1.weight", "classifier.1.bias"]
            elif name.startswith("f"):
                idx = name[1:]
                if "squeeze" in params[name]:
                    for s in ("squeeze", "expand1x1", "expand3x3"):
                        keys += [f"features.{idx}.{s}.weight",
                                 f"features.{idx}.{s}.bias"]
                else:
                    keys += [f"features.{idx}.weight",
                             f"features.{idx}.bias"]
        return keys
    if arch.startswith("shufflenet"):
        for name in params:
            if name == "fc":
                keys += ["fc.weight", "fc.bias"]
            elif name in ("conv1_0", "conv5_0"):
                keys.append(f"{name.split('_')[0]}.0.weight")
            elif name in ("conv1_1", "conv5_1"):
                keys += [f"{name.split('_')[0]}.1.{p}" for p in bn4]
            elif name.startswith("stage"):
                s, u = name.replace("stage", "").split("_")
                for sub in params[name]:
                    b, i = int(sub[1]), int(sub[3:])
                    base = f"stage{s}.{u}.branch{b}.{i}"
                    if i in _SHUFFLE_CONV_IDX[b]:
                        keys.append(f"{base}.weight")
                    else:
                        keys += [f"{base}.{p}" for p in bn4]
        return keys
    if arch.startswith("densenet"):
        for name in params:
            if name == "stem":
                keys.append("features.conv0.weight")
            elif name == "stem_bn":
                keys += [f"features.norm0.{p}" for p in bn4]
            elif name == "final_bn":
                keys += [f"features.norm5.{p}" for p in bn4]
            elif name == "classifier":
                keys += ["classifier.weight", "classifier.bias"]
            elif name.startswith("block"):
                b, l = name.replace("block", "").split("_layer")
                base = f"features.denseblock{int(b) + 1}.denselayer{int(l) + 1}"
                for sub in params[name]:
                    if sub.startswith("conv"):
                        keys.append(f"{base}.{sub}.weight")
                for sub in ("norm1", "norm2"):
                    keys += [f"{base}.{sub}.{p}" for p in bn4]
            elif name.startswith("trans") and name.endswith("_conv"):
                t = int(name[5:-5]) + 1
                keys.append(f"features.transition{t}.conv.weight")
            elif name.startswith("trans") and name.endswith("_bn"):
                t = int(name[5:-3]) + 1
                keys += [f"features.transition{t}.norm.{p}" for p in bn4]
        return keys
    if arch.startswith("mobilenet"):
        for name in params:
            if name == "stem":
                keys.append("features.0.0.weight")
            elif name == "stem_bn":
                keys += [f"features.0.1.{p}" for p in bn4]
            elif name == "head_conv":
                keys.append("features.18.0.weight")
            elif name == "head_bn":
                keys += [f"features.18.1.{p}" for p in bn4]
            elif name == "classifier":
                keys += ["classifier.1.weight", "classifier.1.bias"]
            elif name.startswith("block"):
                t = int(name.replace("block", "")) + 1
                base = f"features.{t}.conv"
                has_expand = "expand" in params[name]
                if has_expand:
                    keys.append(f"{base}.0.0.weight")
                    keys += [f"{base}.0.1.{p}" for p in bn4]
                    keys.append(f"{base}.1.0.weight")
                    keys += [f"{base}.1.1.{p}" for p in bn4]
                    keys.append(f"{base}.2.weight")
                    keys += [f"{base}.3.{p}" for p in bn4]
                else:
                    keys.append(f"{base}.0.0.weight")
                    keys += [f"{base}.0.1.{p}" for p in bn4]
                    keys.append(f"{base}.1.weight")
                    keys += [f"{base}.2.{p}" for p in bn4]
        return keys
    if arch == "alexnet":
        for name in params:
            if name[0] == "f" and name[1:].isdigit():
                keys += [f"features.{name[1:]}.weight",
                         f"features.{name[1:]}.bias"]
        keys += [f"classifier.{i}.{p}" for i in (1, 4, 6)
                 for p in ("weight", "bias")]
        return keys
    if arch.startswith("vgg"):
        if "fc1" not in params:
            raise ValueError(
                f"{arch}: only classic_head=True VGG models have a "
                "torchvision checkpoint form (the default collapsed head "
                "is a documented deviation, docs/ZOO.md)")
        bn = arch.endswith("_bn")
        conv_at, bn_at = _vgg_layout(int(arch.replace("_bn", "")[3:]), bn)
        conv_seq = {v: k for k, v in conv_at.items()}
        bn_seq = {v: k for k, v in bn_at.items()}
        for name in params:
            if name.startswith("conv"):
                i = conv_seq[int(name[4:])]
                # torchvision VGG convs carry biases in both variants
                keys += [f"features.{i}.weight", f"features.{i}.bias"]
            elif name.startswith("bn"):
                keys += [f"features.{bn_seq[int(name[2:])]}.{p}" for p in bn4]
        keys += [f"classifier.{i}.{p}" for i in (0, 3, 6)
                 for p in ("weight", "bias")]
        return keys
    if arch in ("googlenet", "inception_v3"):
        # GoogLeNet branches are torch Sequentials (branch2.0) that Flax
        # names branch2_0; Inception v3 branch names carry no indices.
        def tk(name):
            if arch == "googlenet" and name.startswith("branch"):
                m = re.fullmatch(r"(branch\d)_(\d)", name)
                if m:
                    return f"{m.group(1)}.{m.group(2)}"
            return name

        for name, sub in params.items():
            if name == "fc":
                keys += ["fc.weight", "fc.bias"]
            elif "conv" in sub:  # top-level BasicConv2d (conv1, Conv2d_*a..)
                keys.append(f"{name}.conv.weight")
                keys += [f"{name}.bn.{p}" for p in bn4]
            else:  # inception block of BasicConv2d branches
                for b in sub:
                    keys.append(f"{name}.{tk(b)}.conv.weight")
                    keys += [f"{name}.{tk(b)}.bn.{p}" for p in bn4]
        return keys
    if arch.startswith("mnasnet"):
        for name, sub in params.items():
            if name == "classifier":
                keys += ["classifier.1.weight", "classifier.1.bias"]
            elif "_" in name:  # l{i}_{r} inverted residual
                i, r = name[1:].split("_")
                for c in sub:
                    base = f"layers.{i}.{r}.layers.{c[-1]}"
                    if c.startswith("conv"):
                        keys.append(f"{base}.weight")
                    else:
                        keys += [f"{base}.{p}" for p in bn4]
            else:  # stem/head l{i}
                i = int(name[1:])
                if i in _MNAS_STEM_CONV:
                    keys.append(f"layers.{i}.weight")
                else:
                    keys += [f"layers.{i}.{p}" for p in bn4]
        return keys
    if arch.startswith("wrn"):
        for name in params:
            if name == "init_conv":
                keys.append("features.init_block.conv.weight")
            elif name == "output":
                keys += ["output.weight", "output.bias"]
            elif name.startswith("stage"):
                stage, unit = name.replace("stage", "").split("_unit")
                base = f"features.stage{stage}.unit{unit}"
                for sub in params[name]:
                    if sub.startswith("conv"):
                        keys.append(f"{base}.body.{sub}.conv.weight")
                    elif sub == "identity_conv":
                        keys.append(f"{base}.identity_conv.conv.weight")
                    elif sub.startswith("bn"):
                        for part in ("weight", "bias", "running_mean", "running_var"):
                            keys.append(f"{base}.body.conv{sub[-1]}.bn.{part}")
            elif name == "post_bn":
                for part in ("weight", "bias", "running_mean", "running_var"):
                    keys.append(f"features.post_activ.bn.{part}")
    else:
        # ResNet family. The mapper accepts BOTH key grammars, but exports
        # must emit the grammar the target framework loads: the reference's
        # CIFAR ResNets (capitalized archs) use linear./shortcut.N., while
        # torchvision's lowercase resnet/resnext/wide use fc./downsample.N.
        tv = arch[:1].islower()
        head = "fc" if tv else "linear"
        short = "downsample" if tv else "shortcut"
        for name in params:
            if name == "conv1":
                keys.append("conv1.weight")
            elif name == "bn1":
                for part in ("weight", "bias", "running_mean", "running_var"):
                    keys.append(f"bn1.{part}")
            elif name == "linear":
                keys += [f"{head}.weight", f"{head}.bias"]
            elif name.startswith("layer"):
                stage, idx = name.replace("layer", "").split("_")
                base = f"layer{stage}.{idx}"
                for sub in params[name]:
                    if sub.startswith("conv"):
                        keys.append(f"{base}.{sub}.weight")
                    elif sub == "shortcut_conv":
                        keys.append(f"{base}.{short}.0.weight")
                    elif sub == "shortcut_bn":
                        for part in ("weight", "bias", "running_mean", "running_var"):
                            keys.append(f"{base}.{short}.1.{part}")
                    elif sub.startswith("bn"):
                        for part in ("weight", "bias", "running_mean", "running_var"):
                            keys.append(f"{base}.{sub}.{part}")
    return keys


def main(argv=None):
    """Checkpoint conversion CLI.

    torch -> flax:  python -m nbdt_tpu.models.convert ckpt.pth \
                        --arch ResNet18 --out ckpt.msgpack
    flax -> torch:  python -m nbdt_tpu.models.convert ckpt.msgpack \
                        --arch ResNet18 --out ckpt.pth

    The direction follows the output extension. Flax checkpoints are the
    trainer's msgpack payloads ({"params", "batch_stats"}); torch
    checkpoints are reference-style ({"net": state_dict} or a bare dict).
    """
    import argparse

    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument("input")
    parser.add_argument("--arch", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    if args.out.endswith(".msgpack"):
        from .utils import load_torch_checkpoint

        variables = torch_state_dict_to_flax(
            load_torch_checkpoint(args.input), arch=args.arch
        )
        import flax.serialization

        with open(args.out, "wb") as f:
            f.write(flax.serialization.to_bytes(variables))
    elif args.out.endswith(".pth"):
        import flax.serialization
        import torch

        with open(args.input, "rb") as f:
            variables = flax.serialization.msgpack_restore(f.read())
        sd = flax_to_torch_state_dict(variables, arch=args.arch)
        torch.save({"net": {k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()}}, args.out)
    else:
        parser.error("--out must end in .msgpack (torch->flax) or .pth "
                     "(flax->torch)")
    print(f"==> Wrote {args.out}")


if __name__ == "__main__":
    main()
