"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest


def test_eight_devices():
    import jax

    assert len(jax.devices()) == 8, jax.devices()


def test_mesh_construction():
    from nbdt_tpu.parallel import make_mesh

    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    mesh = make_mesh(tp=2)
    assert mesh.devices.shape == (4, 2)
    mesh = make_mesh(n_devices=4)
    assert mesh.devices.shape == (4, 1)


def test_sharded_rules_forward(synthetic_tree, rng):
    """Soft rules under jit with the batch sharded over dp: results match
    the single-device path exactly."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nbdt_tpu.parallel import make_mesh
    from nbdt_tpu.rules import soft_forward, to_device_tree

    jt = to_device_tree(synthetic_tree.arrays)
    mesh = make_mesh()
    x = rng.randn(16, 7).astype(np.float32)

    ref = np.asarray(soft_forward(jnp.asarray(x), jt))

    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    with mesh:
        out = jax.jit(lambda t: soft_forward(t, jt))(xs)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip contract: full train step on an 8-device
    (dp4, tp2) mesh."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_entry_compiles():
    import sys
    from pathlib import Path

    import jax

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 10)
    assert bool(jax.numpy.isfinite(out).all())
