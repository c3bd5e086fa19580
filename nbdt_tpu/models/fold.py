"""Inference-time BatchNorm folding (serving optimization, no reference
counterpart — the reference serves train-mode torch models as-is).

At inference BatchNorm is a per-channel affine ``y = x*s + t`` with
``s = gamma/sqrt(var+eps)``, ``t = beta - mean*s``. Folding multiplies ``s``
into the preceding conv's kernel and turns ``t`` into a conv bias, so the
serving graph is pure conv+bias+ReLU: one fewer VPU op per conv, and — for
bfloat16 backbones — activations stay bf16 end-to-end instead of
round-tripping through the f32 BatchNorm (the norm layers compute in f32).

Works on the ResNet family (``folded=True`` module variant); pre-activation
topologies (WRN) put BN before the conv of the *next* unit across a branch
point and are not folded here.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

# Matches the ResNet norm epsilon (resnet.py: BatchNorm epsilon=1e-5,
# torch BatchNorm2d default).
_EPS = 1e-5


def _bn_name_for(conv_name: str) -> str:
    if conv_name == "shortcut_conv":
        return "shortcut_bn"
    if conv_name.startswith("conv"):
        return "bn" + conv_name[len("conv"):]
    raise KeyError(conv_name)


def _fold_level(params: Dict[str, Any], stats: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for name, value in params.items():
        if name.startswith("bn") or name.endswith("_bn"):
            continue  # consumed by its conv below
        is_conv = name.startswith("conv") or name.endswith("_conv")
        if is_conv:
            bn = params.get(_bn_name_for(name))
            if bn is None:
                raise KeyError(
                    f"conv {name!r} has no sibling BatchNorm to fold "
                    f"(found: {sorted(params)})"
                )
            st = stats.get(_bn_name_for(name))
            if st is None:
                raise ValueError(
                    f"no batch_stats for {_bn_name_for(name)!r}: folding "
                    "needs the running mean/var — pass the full variables "
                    "dict {'params': ..., 'batch_stats': ...}, not bare "
                    "params"
                )
            scale = np.asarray(bn["scale"], np.float64)
            beta = np.asarray(bn["bias"], np.float64)
            mean = np.asarray(st["mean"], np.float64)
            var = np.asarray(st["var"], np.float64)
            s = scale / np.sqrt(var + _EPS)
            kernel = np.asarray(value["kernel"], np.float64) * s  # [...,Cout]*[Cout]
            bias = beta - mean * s
            out[name] = {
                "kernel": kernel.astype(np.float32),
                "bias": bias.astype(np.float32),
            }
        elif isinstance(value, dict):
            out[name] = _fold_level(value, stats.get(name, {}))
        else:
            out[name] = value
    return out


def fold_batchnorm(module, variables) -> Tuple[Any, Dict[str, Any]]:
    """Return ``(folded_module, folded_variables)`` computing the same
    inference function as ``module.apply(variables, x, train=False)``.

    ``module`` must support the ``folded`` attribute (the ResNet family).
    The returned variables contain only ``params`` (no ``batch_stats``).
    """
    if not hasattr(module, "folded"):
        raise TypeError(
            f"{type(module).__name__} has no folded-inference variant; "
            "BN folding supports the ResNet family"
        )
    import flax
    import jax
    import jax.numpy as jnp

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables.get("batch_stats", {}))
    folded = _fold_level(params, stats)
    # Device-resident leaves: the fold math runs in host numpy (f64); left
    # as numpy, every apply() would re-upload the params — through the axon
    # tunnel that is ~45 MB/call and dominates the runtime.
    folded = jax.tree_util.tree_map(jnp.asarray, folded)
    return module.clone(folded=True), {"params": folded}
