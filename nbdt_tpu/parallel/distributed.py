"""Multi-host bootstrap + cross-process array placement.

TPU-native replacement for the reference's multi-node story (ClassyVision
DDP launched with torch.distributed.launch over NCCL, reference
examples/imagenet/classy_train.py:93-106): one SPMD program per host,
``jax.distributed.initialize`` to form the global device set, the same
pjit-sharded train step over a mesh spanning every chip. XLA emits the
gradient all-reduces over ICI/DCN; no explicit collective code.

Host-side contract: every process runs the identical program; each loads
its own slice of the batch (``process_local_batch``) and params are
materialized replicated on all hosts (``host_array``).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join (or form) the multi-host process group; returns process_count.

    Arguments fall back to ``NBDT_COORDINATOR`` / ``NBDT_NUM_PROCESSES`` /
    ``NBDT_PROCESS_ID`` env vars, and finally to jax's own auto-detection
    (TPU pod metadata). Idempotent: a second call is a no-op.

    Must run before the first jax backend use on real TPU pods.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("NBDT_COORDINATOR")
    if num_processes is None and os.environ.get("NBDT_NUM_PROCESSES"):
        num_processes = int(os.environ["NBDT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("NBDT_PROCESS_ID"):
        process_id = int(os.environ["NBDT_PROCESS_ID"])

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized -> idempotent
        msg = str(e).lower()
        # jax phrases this "distributed.initialize should only be called
        # once"; older versions said "already initialized".
        if "already initialized" not in msg and "only be called once" not in msg:
            raise
    return jax.process_count()


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def host_array(a, sharding):
    """Place a host array with ``sharding``, valid on any process count.

    Single-process: plain device_put. Multi-process: every host holds the
    same full array (replicated params, tree constants), so each host
    materializes its addressable shards from its own copy.
    """
    import jax

    if jax.process_count() == 1:
        return jax.device_put(a, sharding)
    a = np.asarray(a)
    return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])


def local_data(arr) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in order.

    The inverse of :func:`process_local_batch` for step outputs (eval
    logits): multi-host hosts score their own slice and accumulate metrics
    locally. Single-process, it's just np.asarray.
    """
    import jax

    if jax.process_count() == 1:
        return np.asarray(arr)
    # One shard per DISTINCT row slice: on a mesh with a replicated second
    # axis (tp>1), addressable_shards yields each dp row-slice once per tp
    # device — concatenating them all would duplicate every local row.
    by_start = {}
    for s in arr.addressable_shards:
        by_start.setdefault(s.index[0].start or 0, s)
    return np.concatenate(
        [np.asarray(by_start[k].data) for k in sorted(by_start)]
    )


def process_local_batch(local, sharding):
    """Assemble the global batch from this process's local slice.

    Each host's loader yields batch_size/process_count samples; the global
    array's leading axis is the concatenation over hosts in process order
    (the multi-host analogue of DataLoader worker sharding).
    """
    import jax

    local = np.asarray(local)
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)
