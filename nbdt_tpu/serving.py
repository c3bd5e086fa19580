"""Serving export: ahead-of-time compiled, self-contained NBDT artifacts.

The reference has no deployment story beyond a Flask demo that rebuilds the
model on every request (reference examples/app/api.py:30-35). This module
gives the TPU build a production path:

- :func:`make_serving_fn` — the canonical serving forward (bf16 backbone on
  the MXU, f32 node decisions, weights + tree constants closed over) as a
  single jittable function.
- :func:`export_serving` / :func:`load_serving` — serialize that forward to
  a self-contained StableHLO artifact via ``jax.export`` with a SYMBOLIC
  batch dimension, so one artifact serves any batch size on any listed
  platform (default: cpu + tpu). The artifact embeds the weights and tree
  constants; loading it needs no model code, no checkpoint, and no
  hierarchy JSON — exactly what a serving fleet wants to ship.
- :func:`aot_compile` — same function, compiled ahead of time for a fixed
  batch size on the local backend (first-request latency leaves the
  serving path).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = (
    "make_serving_fn",
    "export_serving",
    "load_serving",
    "aot_compile",
    "shard_serving",
)


def make_serving_fn(
    module,
    variables,
    tree,
    bf16: bool = True,
    fold_bn: bool = False,
    uint8_input: bool = False,
    normalize=None,
) -> Callable:
    """Build the canonical serving forward: x [B,H,W,3] f32 -> leaf
    probability distribution [B, C] — the raw product of path
    probabilities, exactly what the reference's soft rules return
    (unnormalized; argmax is the NBDT prediction).

    ``bf16`` runs the conv backbone in bfloat16 (the MXU fast path, ~2x
    f32); the NBDT node decisions always compute in f32 (argmax parity —
    see CLAUDE.md invariant). Weights and tree constants are closed over,
    so the returned function is a pure function of ``x`` and can be
    jitted, AOT-compiled, or exported as-is.

    ``fold_bn`` folds BatchNorm into the conv weights first
    (models.fold.fold_batchnorm — ResNet family only): the serving graph
    becomes pure conv+bias+ReLU and bf16 activations stay bf16 end-to-end
    instead of round-tripping through the f32 norm layers.

    ``uint8_input`` accepts raw uint8 NHWC batches and normalizes ON DEVICE
    — 4x fewer host->device bytes, which is the real serving bottleneck on
    PCIe/tunnel transports. ``normalize`` is ``(mean, std)`` in [0,1] units
    (e.g. ``data.transforms.CIFAR_MEAN/STD``); defaults to the CIFAR
    constants the flagship config uses.
    """
    from .rules import soft_forward, to_device_tree

    jt = to_device_tree(tree.arrays)
    # Accept a bare params dict, like NBDT._as_callable does.
    if "params" not in variables:
        variables = {"params": variables}

    serving_module = module
    if fold_bn:
        from .models.fold import fold_batchnorm

        serving_module, variables = fold_batchnorm(serving_module, variables)
    if bf16 and hasattr(serving_module, "dtype"):
        serving_module = serving_module.clone(dtype=jnp.bfloat16)

    # The closure must hold DEVICE arrays before aot_compile/shard_serving
    # jit this fn live: checkpoint restores hand over host numpy, and a
    # host-numpy closure lowers as inline HLO constants — the 150 MB-literal
    # compile stall CLAUDE.md records — and re-uploads weights per call
    # (measured 14x slower on the folded path, docs/PERFORMANCE.md). A
    # device-resident closure is the measured-fast headline configuration.
    # (export_serving serializes the same constants deliberately.)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    if uint8_input:
        if normalize is None:
            from .data.transforms import CIFAR_MEAN, CIFAR_STD

            normalize = (CIFAR_MEAN, CIFAR_STD)
        mean = jnp.asarray(np.asarray(normalize[0], np.float32) * 255.0)
        # Scale folded into one multiplier: (x/255 - m)/s == x*inv - m*255*inv
        inv = jnp.asarray(1.0 / (np.asarray(normalize[1], np.float32) * 255.0))

    def fn(x):
        if uint8_input:
            # f32 affine, THEN the bf16 cast — same rounding as the host
            # normalize + cast path (bf16-normalizing 0..255 inputs first
            # would quantize differently).
            x = (x.astype(jnp.float32) - mean) * inv
        if bf16:
            x = x.astype(jnp.bfloat16)
        logits = serving_module.apply(variables, x, train=False)
        return soft_forward(logits.astype(jnp.float32), jt)

    return fn


def export_serving(
    module,
    variables,
    tree,
    path: str,
    image_size: int,
    bf16: bool = True,
    platforms=("cpu", "tpu"),
    batch_symbol: str = "b",
    fold_bn: bool = False,
    uint8_input: bool = False,
    normalize=None,
) -> str:
    """Export the serving forward to a self-contained StableHLO artifact.

    The batch dimension is symbolic: the one artifact serves any batch
    size. Returns ``path``. Load with :func:`load_serving` — no model
    code, checkpoint, or hierarchy JSON needed at load time.
    ``uint8_input`` bakes on-device normalization in and makes the artifact
    take raw uint8 NHWC (4x smaller request payloads).
    """
    from jax import export as jexport

    fn = make_serving_fn(module, variables, tree, bf16=bf16, fold_bn=fold_bn,
                         uint8_input=uint8_input, normalize=normalize)
    (b,) = jexport.symbolic_shape(batch_symbol)
    spec = jax.ShapeDtypeStruct(
        (b, image_size, image_size, 3),
        jnp.uint8 if uint8_input else jnp.float32,
    )
    exported = jexport.export(jax.jit(fn), platforms=tuple(platforms))(spec)
    data = exported.serialize()
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_serving(path: str) -> Callable:
    """Load a :func:`export_serving` artifact into a callable x -> leaf
    probability distribution (raw path-probability product; see
    :func:`make_serving_fn`). Self-contained: weights + tree baked in."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return jax.jit(exported.call)


def aot_compile(fn: Callable, batch: int, image_size: int,
                dtype=jnp.float32):
    """Ahead-of-time compile a serving fn for a fixed batch size on the
    local backend; returns the compiled executable (callable)."""
    spec = jax.ShapeDtypeStruct((batch, image_size, image_size, 3), dtype)
    return jax.jit(fn).lower(spec).compile()


def shard_serving(fn: Callable, mesh) -> Callable:
    """Data-parallel serving over a device mesh: the batch shards over the
    mesh's ``dp`` axis, the closed-over weights/tree constants replicate,
    and XLA keeps the whole forward collective-free (inference has no
    gradient all-reduce). Batch size must be divisible by the dp extent.

    This is the inference side of SURVEY §2.4's data-parallel story — the
    reference's equivalent is DataParallel's scatter/gather
    (main.py:160-161), here it is just a sharding annotation.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("dp"))
    return jax.jit(fn, in_shardings=sh, out_shardings=sh)
