"""Topology fuzz: random tree shapes (skewed, deep, wide, mixed branching)
must match the numpy oracle (reference model.py:84-242 / loss.py:213-266
semantics) for soft/hard traversal and both tree losses.

The fixed parity suites cover the synthetic 7-leaf tree and the shipped
CIFAR10 graphs; this sweeps the topology space those fixtures can't —
degenerate chains, fat stars, unbalanced merges — with seeded generation so
failures replay.
"""

import random

import numpy as np
import pytest

from oracle import (
    oracle_hard_traverse,
    oracle_hard_tree_sup_loss,
    oracle_soft_traverse,
    oracle_soft_tree_sup_loss,
)


def random_tree(seed: int, num_leaves: int):
    """Random single-rooted tree over ``num_leaves`` classes: repeatedly
    merge 2-4 random pool nodes under a fresh parent (insertion order =
    child order, the load-bearing contract)."""
    from nbdt_tpu.hierarchy.digraph import Digraph
    from nbdt_tpu.tree import Tree

    rnd = random.Random(seed)
    G = Digraph()
    leaves = [f"f{i:08d}" for i in range(num_leaves)]
    for i, wnid in enumerate(leaves):
        G.add_node(wnid, label=f"leaf{i}")
    pool = list(leaves)
    next_id = num_leaves
    while len(pool) > 1:
        k = min(len(pool), rnd.randint(2, 4))
        children = [pool.pop(rnd.randrange(len(pool))) for _ in range(k)]
        parent = f"f{next_id:08d}"
        next_id += 1
        G.add_node(parent, label=f"inner{next_id}")
        for c in children:
            G.add_edge(parent, c)
        pool.append(parent)
    return Tree.from_graph(G, leaves,
                           classes=[f"c{i}" for i in range(num_leaves)])


@pytest.mark.parametrize("seed,num_leaves", [
    (0, 2),       # minimal: one decision
    (1, 3),       # one ternary or chain-of-binary
    (2, 10),
    (3, 17),      # prime -> unbalanced merges
    (4, 40),      # deeper/wider mix
])
def test_fuzzed_topology_matches_oracle(seed, num_leaves):
    from nbdt_tpu.rules import (
        HardEmbeddedDecisionRules,
        SoftEmbeddedDecisionRules,
    )

    tree = random_tree(seed, num_leaves)
    rng = np.random.RandomState(seed)
    x = (rng.randn(16, num_leaves) * 3.0).astype(np.float32)

    soft = np.asarray(SoftEmbeddedDecisionRules(tree=tree)(x))
    ref_soft = oracle_soft_traverse(x.astype(np.float64), tree)
    np.testing.assert_allclose(soft, ref_soft, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(soft.argmax(1), ref_soft.argmax(1))

    hard = np.asarray(HardEmbeddedDecisionRules(tree=tree)(x))
    ref_hard = oracle_hard_traverse(x.astype(np.float64), tree)
    np.testing.assert_array_equal(hard.argmax(1), np.asarray(ref_hard))


@pytest.mark.parametrize("seed,num_leaves", [(5, 9), (6, 23)])
def test_fuzzed_topology_losses_match_oracle(seed, num_leaves):
    import jax.numpy as jnp

    from nbdt_tpu.losses import hard_tree_sup_loss, soft_tree_sup_loss
    from nbdt_tpu.rules import to_device_tree

    tree = random_tree(seed, num_leaves)
    jt = to_device_tree(tree.arrays)
    rng = np.random.RandomState(seed)
    x = (rng.randn(16, num_leaves) * 3.0).astype(np.float32)
    y = rng.randint(0, num_leaves, 16).astype(np.int32)

    ours_soft = float(soft_tree_sup_loss(jnp.asarray(x), jnp.asarray(y), jt))
    ref_soft = oracle_soft_tree_sup_loss(x.astype(np.float64), y, tree)
    np.testing.assert_allclose(ours_soft, ref_soft, rtol=1e-4)

    ours_hard = float(hard_tree_sup_loss(jnp.asarray(x), jnp.asarray(y), jt))
    ref_hard = oracle_hard_tree_sup_loss(x.astype(np.float64), y, tree)
    np.testing.assert_allclose(ours_hard, ref_hard, rtol=1e-4)


@pytest.mark.parametrize("seed,num_leaves", [(7, 5), (8, 13)])
def test_fuzzed_topology_decision_paths(seed, num_leaves):
    """Decision paths on arbitrary topologies are structurally sound: a
    root->leaf chain along real graph edges, ending at the predicted class,
    probs in (0,1], and — for hard rules — each step's child chosen by that
    node's argmax (reference model.py:146-186 semantics)."""
    from nbdt_tpu.rules import (
        HardEmbeddedDecisionRules,
        SoftEmbeddedDecisionRules,
    )

    tree = random_tree(seed, num_leaves)
    succ = {n.wnid: list(n.succ) for n in tree.inodes}
    rng = np.random.RandomState(seed)
    x = (rng.randn(8, num_leaves) * 3.0).astype(np.float32)

    for Rules in (SoftEmbeddedDecisionRules, HardEmbeddedDecisionRules):
        rules = Rules(tree=tree)
        out, decisions = rules.forward_with_decisions(x)
        preds = np.argmax(np.asarray(out), axis=1)
        assert len(decisions) == 8
        for b, steps in enumerate(decisions):
            chain = [s["node"].wnid if hasattr(s.get("node"), "wnid")
                     else s["name"] for s in steps]
            # terminal step is the predicted leaf
            leaf_wnid = tree.wnids_leaves[int(preds[b])]
            last = steps[-1]
            last_wnid = getattr(last.get("node"), "wnid", None)
            if last_wnid is not None:
                assert last_wnid == leaf_wnid, (b, chain)
            # consecutive steps follow real edges
            wnids = [getattr(s.get("node"), "wnid", None) for s in steps]
            if all(w is not None for w in wnids):
                assert wnids[0] == tree.root.wnid
                for a, c in zip(wnids, wnids[1:]):
                    assert c in succ.get(a, ()), (a, c)
            for s in steps:
                assert 0.0 <= float(s["prob"]) <= 1.0 + 1e-6


def random_dag(seed: int, num_leaves: int, extra_edges: int):
    """Random multi-path hierarchy: a random tree plus ``extra_edges``
    additional parent->node edges (creating multi-parent nodes), kept
    acyclic by only linking from nodes closer to the root."""
    from nbdt_tpu.hierarchy.digraph import Digraph
    from nbdt_tpu.tree import Tree

    rnd = random.Random(seed)
    G = Digraph()
    leaves = [f"f{i:08d}" for i in range(num_leaves)]
    for i, wnid in enumerate(leaves):
        G.add_node(wnid, label=f"leaf{i}")
    pool = list(leaves)
    parents = []
    next_id = num_leaves
    while len(pool) > 1:
        k = min(len(pool), rnd.randint(2, 3))
        children = [pool.pop(rnd.randrange(len(pool))) for _ in range(k)]
        parent = f"f{next_id:08d}"
        next_id += 1
        G.add_node(parent, label=f"inner{next_id}")
        for c in children:
            G.add_edge(parent, c)
        pool.append(parent)
        parents.append(parent)
    # extra edges: from a LATER-created parent (nearer the root) to any
    # node created before it — acyclic by construction
    candidates = leaves + parents
    for _ in range(extra_edges):
        pi = rnd.randrange(1, len(parents))
        parent = parents[pi]
        target = candidates[rnd.randrange(num_leaves + pi)]
        if target != parent and target not in G.succ(parent):
            G.add_edge(parent, target)
    tree = Tree.from_graph(G, leaves,
                           classes=[f"c{i}" for i in range(num_leaves)])
    return tree


@pytest.mark.parametrize("seed,num_leaves,extra", [
    (10, 5, 2),
    (11, 12, 4),
    (12, 25, 8),
])
def test_fuzzed_dag_matches_oracle(seed, num_leaves, extra):
    """Multi-path (DAG) hierarchies: soft traversal matches the oracle's
    every-slot product (the documented duplicate-slot decision), the hard
    walk matches the oracle's greedy descent (the closed form dispatches
    to the scan walk on DAGs), and both tree losses agree."""
    import jax.numpy as jnp

    from nbdt_tpu.losses import hard_tree_sup_loss, soft_tree_sup_loss
    from nbdt_tpu.rules import (
        HardEmbeddedDecisionRules,
        SoftEmbeddedDecisionRules,
        to_device_tree,
    )

    tree = random_dag(seed, num_leaves, extra)
    assert tree.arrays.is_multipath  # the generator must actually make DAGs
    rng = np.random.RandomState(seed)
    x = (rng.randn(16, num_leaves) * 3.0).astype(np.float32)
    y = rng.randint(0, num_leaves, 16).astype(np.int32)

    soft = np.asarray(SoftEmbeddedDecisionRules(tree=tree)(x))
    ref_soft = oracle_soft_traverse(x.astype(np.float64), tree)
    np.testing.assert_allclose(soft, ref_soft, rtol=1e-4, atol=1e-6)

    hard = np.asarray(HardEmbeddedDecisionRules(tree=tree)(x))
    ref_hard = oracle_hard_traverse(x.astype(np.float64), tree)
    np.testing.assert_array_equal(hard.argmax(1), np.asarray(ref_hard))

    jt = to_device_tree(tree.arrays)
    ours_soft = float(soft_tree_sup_loss(jnp.asarray(x), jnp.asarray(y), jt))
    ref_sloss = oracle_soft_tree_sup_loss(x.astype(np.float64), y, tree)
    np.testing.assert_allclose(ours_soft, ref_sloss, rtol=1e-4)

    ours_hard = float(hard_tree_sup_loss(jnp.asarray(x), jnp.asarray(y), jt))
    ref_hloss = oracle_hard_tree_sup_loss(x.astype(np.float64), y, tree)
    np.testing.assert_allclose(ours_hard, ref_hloss, rtol=1e-4)
