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
    m = re.fullmatch(r"layer(\d+)\.(\d+)\.shortcut\.0\.weight", key)
    if m:
        block = f"layer{m.group(1)}_{m.group(2)}"
        return ("params", (block, "shortcut_conv"), "conv")
    m = re.fullmatch(r"layer(\d+)\.(\d+)\.shortcut\.1\.(\w+)", key)
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


_ARCH_MAPPERS = {
    "ResNet10": _resnet_key_to_path,
    "ResNet18": _resnet_key_to_path,
    "ResNet34": _resnet_key_to_path,
    "ResNet50": _resnet_key_to_path,
    "ResNet101": _resnet_key_to_path,
    "ResNet152": _resnet_key_to_path,
    "wrn28_10": _wrn_key_to_path,
    "wrn28_10_cifar10": _wrn_key_to_path,
    "wrn28_10_cifar100": _wrn_key_to_path,
}


def torch_state_dict_to_flax(state_dict: Dict[str, np.ndarray], arch: str) -> dict:
    """Convert a flat torch state dict to Flax variables
    ``{"params": ..., "batch_stats": ...}``. Raises on unmapped weights so
    silent drops (and the accuracy loss they cause) are impossible.
    """
    mapper = _ARCH_MAPPERS.get(arch, _resnet_key_to_path)
    state_dict = coerce_state_dict(state_dict)
    variables: dict = {"params": {}, "batch_stats": {}}
    unmapped = []
    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        value = np.asarray(value)
        resolved = mapper(key)
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
        elif kind.startswith("bn-"):
            _set(variables[coll], path + (kind[3:],), value)
        else:  # pragma: no cover
            raise AssertionError(kind)
    assert not unmapped, f"Unmapped checkpoint keys for arch {arch}: {unmapped}"
    return variables


def flax_to_torch_state_dict(variables: dict, arch: str) -> Dict[str, np.ndarray]:
    """Inverse conversion (for exporting checkpoints the reference can load).

    Round-trips through the same rule tables by enumerating known torch keys
    from the Flax tree structure.
    """
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
        elif kind == "linear-bias":
            out[torch_key] = np.asarray(node["bias"])
        elif kind.startswith("bn-"):
            out[torch_key] = np.asarray(node[kind[3:]])

    mapper = _ARCH_MAPPERS.get(arch, _resnet_key_to_path)
    for torch_key in _enumerate_torch_keys(params, stats, arch):
        resolved = mapper(torch_key)
        if resolved:
            emit(torch_key, *resolved)
    return out


def _enumerate_torch_keys(params, stats, arch):
    """Generate candidate torch keys from the Flax module names."""
    keys = []
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
        for name in params:
            if name == "conv1":
                keys.append("conv1.weight")
            elif name == "bn1":
                for part in ("weight", "bias", "running_mean", "running_var"):
                    keys.append(f"bn1.{part}")
            elif name == "linear":
                keys += ["linear.weight", "linear.bias"]
            elif name.startswith("layer"):
                stage, idx = name.replace("layer", "").split("_")
                base = f"layer{stage}.{idx}"
                for sub in params[name]:
                    if sub.startswith("conv"):
                        keys.append(f"{base}.{sub}.weight")
                    elif sub == "shortcut_conv":
                        keys.append(f"{base}.shortcut.0.weight")
                    elif sub == "shortcut_bn":
                        for part in ("weight", "bias", "running_mean", "running_var"):
                            keys.append(f"{base}.shortcut.1.{part}")
                    elif sub.startswith("bn"):
                        for part in ("weight", "bias", "running_mean", "running_var"):
                            keys.append(f"{base}.{sub}.{part}")
    return keys
