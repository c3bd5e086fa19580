"""Mesh construction and sharding helpers.

Data parallelism is the parity target (SURVEY §2.4): batch sharded over a
1-D ``dp`` mesh axis, params replicated; XLA emits psum all-reduces for
gradients over ICI. A second ``tp`` axis is plumbed through so the final
classifier (and the NBDT traversal matmuls, which contract over classes)
can be tensor-sharded for wide-class models (ImageNet-1k) — unused axes
cost nothing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, tp) mesh over the first ``n_devices`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if dp is None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put(a, sharding: NamedSharding):
    """Placement that also works on multi-host meshes.

    Raw ``jax.device_put`` requires every device of the sharding to be
    addressable from this process; on a mesh spanning hosts it raises. The
    multi-host path goes through ``distributed.host_array`` (callback
    placement — each host materializes its addressable portions from the
    host-global array), same as the ZeRO placements in parallel/zero.py.
    """
    if jax.process_count() == 1:
        return jax.device_put(a, sharding)
    from .distributed import host_array

    return host_array(a, sharding)


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host arrays with batch sharded over dp.

    Multi-host: pass the HOST-GLOBAL batch on every process (each host
    materializes its own slice); per-host slices go through
    ``distributed.process_local_batch`` instead.
    """
    sharding = batch_sharding(mesh)
    out = tuple(_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def shard_params(mesh: Mesh, params, tp_shard_classifier: bool = False):
    """Replicate params (optionally tensor-shard classifier kernels on tp).

    Classifier kernels are [D, C]; sharding C over ``tp`` splits both the
    logits matmul and the downstream NBDT membership matmul contraction.
    """
    repl = replicate(mesh)

    def place(path, leaf):
        if tp_shard_classifier and path and path[-2:] == ("linear", "kernel"):
            return _put(leaf, NamedSharding(mesh, P(None, "tp")))
        return _put(leaf, repl)

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def key_names(path):
        names = []
        for k in path:
            name = getattr(k, "key", None)
            names.append(str(name if name is not None else k))
        return tuple(names)

    placed = [place(key_names(path), leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, placed)
