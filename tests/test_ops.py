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


def test_fused_head_wide_tree_chunked():
    """Imagenet1000-scale tree: constants exceed any VMEM budget, so the
    kernel streams node chunks through a (batch, chunk) grid with the leaf
    tile accumulating in place — results must still match the jnp rules."""
    import jax.numpy as jnp
    import numpy as np

    from nbdt_tpu.hierarchy.build import build_induced_graph
    from nbdt_tpu.ops.soft_traversal import (
        _pick_chunk,
        fused_soft_head,
        prepare_head_constants,
    )
    from nbdt_tpu.rules import soft_forward, to_device_tree
    from nbdt_tpu.tree import Tree

    C, D = 1000, 32
    rng = np.random.RandomState(0)
    wnids = [f"f{i:08d}" for i in range(C)]
    centers = rng.randn(C, D).astype(np.float32)
    tree = Tree.from_graph(build_induced_graph(wnids, centers), wnids,
                           classes=[f"c{i}" for i in range(C)])
    ta = tree.arrays
    W = rng.randn(D, C).astype(np.float32)
    feats = rng.randn(8, D).astype(np.float32)

    hc = prepare_head_constants(ta, W)
    K, Np = hc.mask.shape
    assert _pick_chunk(Np, K, hc.W.shape[1]) < Np  # actually chunked

    (leaf,) = fused_soft_head(jnp.asarray(feats), hc, block_b=8,
                              want_aux=False)
    ref = soft_forward(jnp.asarray(feats @ W), to_device_tree(ta))
    np.testing.assert_allclose(np.exp(np.asarray(leaf)), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(leaf).argmax(1), np.asarray(ref).argmax(1)
    )


def test_fused_head_bf16_classifier(synthetic_tree, rng):
    """bf16 feats/W (serving backbone dtype): the classifier matmul takes
    the bf16 fast path with f32 accumulation, node decisions stay f32 —
    argmax must match the jnp bf16 serving path."""
    import jax.numpy as jnp

    from nbdt_tpu.ops.soft_traversal import fused_soft_head, prepare_head_constants
    from nbdt_tpu.rules import soft_forward, to_device_tree

    ta = synthetic_tree.arrays
    C, D = ta.num_classes, 16
    W = rng.randn(D, C).astype(np.float32)
    feats = rng.randn(12, D).astype(np.float32)

    hc = prepare_head_constants(ta, W, dtype=jnp.bfloat16)
    (leaf,) = fused_soft_head(
        jnp.asarray(feats, jnp.bfloat16), hc, block_b=8, want_aux=False
    )
    assert leaf.dtype == jnp.float32
    # reference: same bf16 classifier, f32 rules (the jnp serving config)
    logits = jnp.dot(jnp.asarray(feats, jnp.bfloat16),
                     jnp.asarray(W, jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    ref = soft_forward(logits, to_device_tree(ta))
    np.testing.assert_allclose(np.exp(np.asarray(leaf)), np.asarray(ref),
                               rtol=1e-2, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(leaf).argmax(1), np.asarray(ref).argmax(1)
    )


def test_fused_head_wide_k_tree_fits_vmem(cifar10_reference_tree=None):
    """Wide-K trees (TinyImagenet200 wordnet has nodes with 13 children)
    must size the batch tile down so the kernel's scoped-VMEM estimate stays
    under budget, and still match the jnp rules."""
    import jax.numpy as jnp

    from nbdt_tpu.ops.soft_traversal import (
        VMEM_TOTAL_BUDGET,
        _pick_chunk,
        _vmem_bytes,
        fused_soft_head,
        prepare_head_constants,
    )
    from nbdt_tpu.rules import soft_forward, to_device_tree
    from nbdt_tpu.tree import Tree
    from nbdt_tpu.utils import hierarchy_to_path_graph
    import os

    path = hierarchy_to_path_graph("TinyImagenet200", "wordnet")
    assert os.path.exists(path)
    tree = Tree("TinyImagenet200", path_graph=path)
    ta = tree.arrays
    K = ta.membership.shape[1]
    assert K >= 8  # genuinely wide

    D = 64
    rng = np.random.RandomState(0)
    W = rng.randn(D, ta.num_classes).astype(np.float32)
    feats = rng.randn(8, D).astype(np.float32)
    hc = prepare_head_constants(ta, W)
    Kp, Np = hc.mask.shape
    cn = _pick_chunk(Np, Kp, hc.W.shape[1])
    # some batch tile in [8, 512] must fit the scoped-VMEM budget
    tb = 512
    while tb > 8 and _vmem_bytes(tb, D, hc.W.shape[1], Kp, cn, True) \
            > VMEM_TOTAL_BUDGET:
        tb //= 2
    assert _vmem_bytes(tb, D, hc.W.shape[1], Kp, cn, True) <= VMEM_TOTAL_BUDGET

    leaf, logits, logp = fused_soft_head(jnp.asarray(feats), hc, block_b=512)
    ref = soft_forward(jnp.asarray(feats @ W), to_device_tree(ta))
    np.testing.assert_allclose(np.exp(np.asarray(leaf)), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)
