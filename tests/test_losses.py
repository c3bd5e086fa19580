"""Loss parity + gradient tests (reference loss.py semantics via oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oracle import (
    oracle_cross_entropy,
    oracle_hard_tree_sup_loss,
    oracle_soft_tree_sup_loss,
)


@pytest.fixture(params=["synthetic", "cifar10"])
def any_tree(request, synthetic_tree, reference_available):
    if request.param == "synthetic":
        return synthetic_tree
    if not reference_available:
        pytest.skip("reference repo not mounted")
    return request.getfixturevalue("cifar10_reference_tree")


def _batch(rng, tree, batch=16):
    C = len(tree.classes)
    x = (rng.randn(batch, C) * 2).astype(np.float32)
    y = rng.randint(0, C, size=batch).astype(np.int32)
    return x, y


def test_cross_entropy_matches(any_tree, rng):
    from nbdt_tpu.losses import cross_entropy

    x, y = _batch(rng, any_tree)
    ours = float(cross_entropy(jnp.asarray(x), jnp.asarray(y)))
    ref = oracle_cross_entropy(x.astype(np.float64), y)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_soft_loss_matches_oracle(any_tree, rng):
    from nbdt_tpu.losses import SoftTreeSupLoss, cross_entropy

    tree = any_tree
    x, y = _batch(rng, tree)
    criterion = SoftTreeSupLoss(tree=tree, criterion=cross_entropy)
    ours = float(criterion.forward_tree(jnp.asarray(x), jnp.asarray(y)))
    ref = oracle_soft_tree_sup_loss(x.astype(np.float64), y, tree)
    np.testing.assert_allclose(ours, ref, rtol=5e-4)

    # full combined loss = xent + tree term (weights 1, progress 1)
    total = float(criterion(jnp.asarray(x), jnp.asarray(y)))
    ref_total = oracle_cross_entropy(x.astype(np.float64), y) + ref
    np.testing.assert_allclose(total, ref_total, rtol=5e-4)


def test_hard_loss_matches_oracle(any_tree, rng):
    from nbdt_tpu.losses import HardTreeSupLoss, cross_entropy

    tree = any_tree
    for tsw in (1.0, 10.0):
        x, y = _batch(rng, tree, batch=24)
        criterion = HardTreeSupLoss(
            tree=tree, criterion=cross_entropy, tree_supervision_weight=tsw
        )
        ours = float(criterion.forward_tree(jnp.asarray(x), jnp.asarray(y)))
        ref = oracle_hard_tree_sup_loss(
            x.astype(np.float64), y, tree, tree_supervision_weight=tsw
        )
        np.testing.assert_allclose(ours, ref, rtol=5e-4)


def test_soft_loss_grads_flow(any_tree, rng):
    from nbdt_tpu.losses import soft_tree_sup_loss
    from nbdt_tpu.rules import to_device_tree

    tree = any_tree
    jt = to_device_tree(tree.arrays)
    x, y = _batch(rng, tree)

    grad = jax.grad(lambda logits: soft_tree_sup_loss(logits, jnp.asarray(y), jt))(
        jnp.asarray(x)
    )
    g = np.asarray(grad)
    assert g.shape == x.shape
    assert np.all(np.isfinite(g))
    assert np.abs(g).sum() > 0


def test_hard_loss_grads_flow(any_tree, rng):
    from nbdt_tpu.losses import hard_tree_sup_loss
    from nbdt_tpu.rules import to_device_tree

    tree = any_tree
    jt = to_device_tree(tree.arrays)
    x, y = _batch(rng, tree)
    grad = jax.grad(lambda logits: hard_tree_sup_loss(logits, jnp.asarray(y), jt))(
        jnp.asarray(x)
    )
    g = np.asarray(grad)
    assert np.all(np.isfinite(g))
    assert np.abs(g).sum() > 0


def test_weight_schedule():
    from nbdt_tpu.losses import SoftTreeSupLoss, cross_entropy

    # tsw schedules linearly from 1 to 3 across epochs (loss.py:187-209)
    import numpy as np

    from nbdt_tpu.hierarchy.digraph import Digraph
    from nbdt_tpu.tree import Tree

    G = Digraph()
    for i in range(2):
        G.add_node(f"f{i:08d}")
    G.add_node("root")
    G.add_edge("root", "f00000000")
    G.add_edge("root", "f00000001")
    tree = Tree.from_graph(G, ["f00000000", "f00000001"], ["a", "b"])

    criterion = SoftTreeSupLoss(
        tree=tree,
        criterion=cross_entropy,
        tree_supervision_weight=1.0,
        tree_supervision_weight_end=3.0,
    )
    criterion.set_epoch(0, 10)
    assert criterion.get_weight(1.0, 3.0) == 1.0
    criterion.set_epoch(5, 10)
    assert criterion.get_weight(1.0, 3.0) == 2.0
    criterion.set_epoch(10, 10)
    assert criterion.get_weight(1.0, 3.0) == 3.0


def test_assert_output_not_nbdt(synthetic_tree, rng):
    from nbdt_tpu.losses import SoftTreeSupLoss, assert_output_not_nbdt, cross_entropy
    from nbdt_tpu.model import TaggedOutput

    x = rng.randn(2, 7).astype(np.float32)
    assert_output_not_nbdt(x)  # plain arrays pass
    tagged = TaggedOutput(x)
    with pytest.raises(AssertionError):
        assert_output_not_nbdt(tagged)
    criterion = SoftTreeSupLoss(tree=synthetic_tree, criterion=cross_entropy)
    with pytest.raises(AssertionError):
        criterion(tagged, np.zeros(2, dtype=np.int32))


def test_seg_loss(synthetic_tree, rng):
    from nbdt_tpu.losses import SoftSegTreeSupLoss, cross_entropy

    criterion = SoftSegTreeSupLoss(tree=synthetic_tree, criterion=cross_entropy)
    x = rng.randn(2, 4, 4, 7).astype(np.float32)
    y = rng.randint(0, 7, size=(2, 4, 4)).astype(np.int32)
    loss = float(criterion(x, y))
    assert np.isfinite(loss) and loss > 0
