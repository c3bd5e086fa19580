"""Device-mesh parallelism for NBDT training and inference.

The reference's parallelism is single-node ``torch.nn.DataParallel``
(reference main.py:160-161) plus an NCCL-DDP example. TPU-native, both
collapse into sharding annotations: build a Mesh, shard the batch over the
``dp`` axis (and optionally the classifier over ``tp``), and XLA inserts
the gradient all-reduces over ICI. Multi-host just means a bigger mesh
(``jax.distributed.initialize`` + the same program).
"""

from .mesh import (
    make_mesh,
    batch_sharding,
    replicate,
    shard_batch,
    shard_params,
)
from .distributed import (
    host_array,
    initialize_multihost,
    is_multiprocess,
    local_data,
    process_local_batch,
)
from .zero import shard_opt_state, zero_sharding
