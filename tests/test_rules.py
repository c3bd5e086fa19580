"""Decision-rule parity tests against the numpy oracle (reference
model.py:84-242 semantics transcribed in tests/oracle.py)."""

import numpy as np
import pytest

from oracle import (
    oracle_all_node_outputs,
    oracle_hard_traverse,
    oracle_soft_traverse,
)


def _logits(rng, tree, batch=16, scale=3.0):
    return (rng.randn(batch, len(tree.classes)) * scale).astype(np.float32)


@pytest.fixture(params=["synthetic", "cifar10"])
def any_tree(request, synthetic_tree, reference_available):
    if request.param == "synthetic":
        return synthetic_tree
    if not reference_available:
        pytest.skip("reference repo not mounted")
    return request.getfixturevalue("cifar10_reference_tree")


def test_node_outputs_match_oracle(any_tree, rng):
    from nbdt_tpu.rules import SoftEmbeddedDecisionRules

    tree = any_tree
    rules = SoftEmbeddedDecisionRules(tree=tree)
    x = _logits(rng, tree)
    ours = rules.forward_nodes(x)
    ref = oracle_all_node_outputs(x.astype(np.float64), tree)
    assert set(ours) == set(ref)
    for wnid in ref:
        np.testing.assert_allclose(
            ours[wnid]["logits"], ref[wnid]["logits"], rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            ours[wnid]["probs"], ref[wnid]["probs"], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            ours[wnid]["entropy"], ref[wnid]["entropy"], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_array_equal(ours[wnid]["preds"], ref[wnid]["preds"])


def test_soft_forward_matches_oracle(any_tree, rng):
    from nbdt_tpu.rules import SoftEmbeddedDecisionRules

    tree = any_tree
    rules = SoftEmbeddedDecisionRules(tree=tree)
    x = _logits(rng, tree, batch=32)
    ours = np.asarray(rules(x))
    ref = oracle_soft_traverse(x.astype(np.float64), tree)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(ours.argmax(1), ref.argmax(1))


def test_hard_forward_matches_oracle(any_tree, rng):
    from nbdt_tpu.rules import HardEmbeddedDecisionRules

    tree = any_tree
    rules = HardEmbeddedDecisionRules(tree=tree)
    x = _logits(rng, tree, batch=32)
    ours = np.asarray(rules(x))
    ref_preds = oracle_hard_traverse(x.astype(np.float64), tree)
    assert ours.shape == (32, len(tree.classes))
    np.testing.assert_array_equal(ours.argmax(1), ref_preds)
    # one-hot
    assert set(np.unique(ours)) == {0.0, 1.0}
    assert np.all(ours.sum(1) == 1.0)


def test_soft_decisions(any_tree, rng):
    from nbdt_tpu.rules import SoftEmbeddedDecisionRules

    tree = any_tree
    rules = SoftEmbeddedDecisionRules(tree=tree)
    x = _logits(rng, tree, batch=4)
    outs, decisions = rules.forward_with_decisions(x)
    preds = np.asarray(outs).argmax(1)
    assert len(decisions) == 4
    for b, decision in enumerate(decisions):
        # path starts at root, ends at the predicted leaf
        assert decision[0]["node"].is_root()
        assert decision[-1]["node"].wnid == tree.wnids_leaves[preds[b]]
        assert decision[0]["prob"] == 1.0
        for step in decision[1:]:
            assert 0.0 <= step["prob"] <= 1.0
        # per-sample probs (reference quirk model.py:259 fixed): product of
        # step probs equals the leaf's class prob
        prod = np.prod([s["prob"] for s in decision])
        np.testing.assert_allclose(prod, np.asarray(outs)[b, preds[b]], rtol=1e-4)


def test_hard_decisions(any_tree, rng):
    from nbdt_tpu.rules import HardEmbeddedDecisionRules

    tree = any_tree
    rules = HardEmbeddedDecisionRules(tree=tree)
    x = _logits(rng, tree, batch=4)
    outs, decisions = rules.forward_with_decisions(x)
    preds = np.asarray(outs).argmax(1)
    for b, decision in enumerate(decisions):
        assert decision[-1]["node"].wnid == tree.wnids_leaves[preds[b]]
        assert decision[0]["name"] == "root"


def test_soft_log_space_safety(synthetic_tree, rng):
    """Raw prob products underflow for deep trees; log-space accumulation
    must stay finite and rank-correct."""
    from nbdt_tpu.rules import SoftEmbeddedDecisionRules, soft_outputs

    tree = synthetic_tree
    rules = SoftEmbeddedDecisionRules(tree=tree)
    x = (rng.randn(8, 7) * 50).astype(np.float32)  # extreme logits
    outs = rules._outputs(x)
    leaf_logp = np.asarray(outs["leaf_log_probs"])
    assert np.all(np.isfinite(leaf_logp))
    probs = np.asarray(outs["class_probs"])
    assert np.all(probs >= 0)


def test_seg_rules(synthetic_tree, rng):
    """Per-pixel rules via coerce/uncoerce (reference model.py:376-387)."""
    from nbdt_tpu.rules import SoftEmbeddedDecisionRules
    from nbdt_tpu.utils import coerce_tensor, uncoerce_tensor

    tree = synthetic_tree
    rules = SoftEmbeddedDecisionRules(tree=tree)
    x = rng.randn(2, 4, 4, 7).astype(np.float32)
    flat = coerce_tensor(x)
    out = np.asarray(rules(flat))
    restored = uncoerce_tensor(out, (2, 4, 4, 7))
    assert restored.shape == (2, 4, 4, 7)
    ref = oracle_soft_traverse(flat.astype(np.float64), tree)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)


def test_hard_traverse_closed_form_equals_scan(synthetic_tree, rng):
    """The closed-form (matmul) hard walk equals the sequential scan walk
    on random node predictions for every sample."""
    import jax.numpy as jnp

    from nbdt_tpu.rules import (
        get_all_node_outputs,
        hard_traverse,
        hard_traverse_scan,
        to_device_tree,
    )

    jt = to_device_tree(synthetic_tree.arrays)
    logits = jnp.asarray(rng.randn(64, jt.num_classes).astype(np.float32))
    preds = get_all_node_outputs(logits, jt).preds
    np.testing.assert_array_equal(
        np.asarray(hard_traverse(preds, jt)),
        np.asarray(hard_traverse_scan(preds, jt)),
    )


def test_hard_traverse_closed_form_wide_tree(rng):
    """Same cross-check on a deep 1000-leaf induced tree."""
    import jax.numpy as jnp

    from nbdt_tpu.hierarchy.build import build_induced_graph
    from nbdt_tpu.rules import (
        get_all_node_outputs,
        hard_traverse,
        hard_traverse_scan,
        to_device_tree,
    )
    from nbdt_tpu.tree import Tree

    C = 200
    wnids = [f"f{i:08d}" for i in range(C)]
    centers = rng.randn(C, 16).astype(np.float32)
    tree = Tree.from_graph(build_induced_graph(wnids, centers), wnids,
                           classes=[f"c{i}" for i in range(C)])
    jt = to_device_tree(tree.arrays)
    logits = jnp.asarray(rng.randn(32, C).astype(np.float32))
    preds = get_all_node_outputs(logits, jt).preds
    np.testing.assert_array_equal(
        np.asarray(hard_traverse(preds, jt)),
        np.asarray(hard_traverse_scan(preds, jt)),
    )
