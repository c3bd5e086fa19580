"""Fused Pallas head vs the jnp rules path (interpret mode on CPU)."""

import numpy as np
import pytest


def test_fused_head_matches_rules(synthetic_tree, rng):
    import jax.numpy as jnp

    from nbdt_tpu.ops.soft_traversal import fused_soft_head, prepare_head_constants
    from nbdt_tpu.rules import soft_outputs, to_device_tree

    tree = synthetic_tree
    ta = tree.arrays
    C = ta.num_classes
    D = 16
    W = rng.randn(D, C).astype(np.float32)
    b = rng.randn(C).astype(np.float32)
    feats = rng.randn(12, D).astype(np.float32)

    hc = prepare_head_constants(ta, W, b)
    leaf, logits, logp = fused_soft_head(jnp.asarray(feats), hc, block_b=8)

    # reference: plain jnp rules over the same logits
    ref_logits = feats @ W + b
    jt = to_device_tree(ta)
    ref = soft_outputs(jnp.asarray(ref_logits), jt)

    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(leaf), np.asarray(ref["leaf_log_probs"]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(leaf).argmax(1), np.asarray(ref["preds"])
    )
    # per-slot log-probs match on valid slots
    N, K, _ = ta.membership.shape
    ref_logp = np.asarray(ref["node_log_probs"]).reshape(12, N * K)
    got = np.asarray(logp)[:, : N * K]
    valid = ta.child_mask.reshape(-1)
    np.testing.assert_allclose(
        got[:, valid], ref_logp[:, valid], rtol=1e-4, atol=1e-4
    )


def test_fused_head_cifar10(cifar10_reference_tree, rng):
    import jax.numpy as jnp

    from nbdt_tpu.ops.soft_traversal import fused_soft_head, prepare_head_constants
    from nbdt_tpu.rules import SoftEmbeddedDecisionRules

    tree = cifar10_reference_tree
    ta = tree.arrays
    W = rng.randn(512, 10).astype(np.float32)
    feats = rng.randn(32, 512).astype(np.float32)
    hc = prepare_head_constants(ta, W)
    leaf, logits, _ = fused_soft_head(jnp.asarray(feats), hc, block_b=32)

    rules = SoftEmbeddedDecisionRules(tree=tree)
    ref_probs = np.asarray(rules(feats @ W))
    np.testing.assert_allclose(
        np.exp(np.asarray(leaf)), ref_probs, rtol=1e-3, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(leaf).argmax(1), ref_probs.argmax(1)
    )


def test_fused_head_vmem_guard():
    """Trees too wide for VMEM-resident constants raise with a pointer to
    the jnp path instead of failing inside Mosaic."""
    import numpy as np
    import pytest

    from nbdt_tpu.assets import dataset_to_dummy_wnids
    from nbdt_tpu.hierarchy.build import build_induced_graph
    from nbdt_tpu.ops.soft_traversal import (
        VMEM_CONSTANT_BUDGET,
        head_constants_bytes,
        prepare_head_constants,
    )
    from nbdt_tpu.tree import Tree

    C, D = 1000, 64
    wnids = [f"f{i:08d}" for i in range(C)]
    centers = np.random.RandomState(0).randn(C, D).astype(np.float32)
    tree = Tree.from_graph(build_induced_graph(wnids, centers), wnids,
                           classes=[f"c{i}" for i in range(C)])
    hc = prepare_head_constants(
        tree.arrays, np.zeros((D, C), np.float32), np.zeros(C, np.float32)
    )
    assert head_constants_bytes(hc) > VMEM_CONSTANT_BUDGET
