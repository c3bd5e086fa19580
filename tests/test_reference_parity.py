"""Direct parity against the reference's OWN torch implementation.

Strongest-possible check: load /root/reference's nbdt library (with import
shims for its absent heavy deps), run its Soft/HardEmbeddedDecisionRules on
the shipped CIFAR10 induced graph, and compare against this repo's rules on
identical logits — leaf distributions, hard predictions, and decision-path
wnid sequences.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"

CLASSES = ["airplane", "automobile", "bird", "cat", "deer", "dog", "frog",
           "horse", "ship", "truck"]


@pytest.fixture(scope="module")
def reference_rules():
    import os

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not mounted")
    import ref_stubs  # installs import shims + sys.path  # noqa: F401

    try:
        from nbdt.model import (
            HardEmbeddedDecisionRules,
            SoftEmbeddedDecisionRules,
        )
        from nbdt.tree import Tree as RefTree
    except Exception as e:
        pytest.skip(f"reference library not importable: {e}")

    tree = RefTree(
        "CIFAR10",
        path_graph=f"{REFERENCE}/nbdt/hierarchies/CIFAR10/graph-induced.json",
        path_wnids=f"{REFERENCE}/nbdt/wnids/CIFAR10.txt",
        classes=CLASSES,
    )
    return (SoftEmbeddedDecisionRules(tree=tree),
            HardEmbeddedDecisionRules(tree=tree))


@pytest.fixture(scope="module")
def our_rules():
    from nbdt_tpu.rules import (
        HardEmbeddedDecisionRules,
        SoftEmbeddedDecisionRules,
    )
    from nbdt_tpu.tree import Tree

    tree = Tree(
        "CIFAR10",
        path_graph=f"{REFERENCE}/nbdt/hierarchies/CIFAR10/graph-induced.json",
        path_wnids=f"{REFERENCE}/nbdt/wnids/CIFAR10.txt",
        classes=CLASSES,
    )
    return SoftEmbeddedDecisionRules(tree=tree), HardEmbeddedDecisionRules(tree=tree)


@pytest.fixture(scope="module")
def logits():
    return (np.random.RandomState(0).randn(32, 10) * 3).astype(np.float32)


def test_soft_distribution_parity(reference_rules, our_rules, logits):
    ref_soft, _ = reference_rules
    our_soft, _ = our_rules
    with torch.no_grad():
        theirs = ref_soft(torch.from_numpy(logits)).numpy()
    ours = np.asarray(our_soft.forward(logits))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


def test_hard_prediction_parity(reference_rules, our_rules, logits):
    _, ref_hard = reference_rules
    _, our_hard = our_rules
    with torch.no_grad():
        theirs = ref_hard(torch.from_numpy(logits)).numpy().argmax(1)
    ours = np.asarray(our_hard.forward(logits)).argmax(1)
    np.testing.assert_array_equal(ours, theirs)


def test_decision_path_parity(reference_rules, our_rules, logits):
    """Per-sample root->leaf wnid sequences match the reference's hard walk."""
    _, ref_hard = reference_rules
    _, our_hard = our_rules
    with torch.no_grad():
        _, ref_decisions = ref_hard.forward_with_decisions(
            torch.from_numpy(logits)
        )
    _, our_decisions = our_hard.forward_with_decisions(logits)
    assert len(ref_decisions) == len(our_decisions)
    for ref_path, our_path in zip(ref_decisions, our_decisions):
        ref_wnids = [d["node"].wnid for d in ref_path if d.get("node")]
        our_wnids = [d["node"].wnid for d in our_path if d.get("node")]
        assert ref_wnids == our_wnids


def test_soft_decision_probs_parity(reference_rules, our_rules, logits):
    """Soft decision-path probabilities: ours are per-sample; the reference
    reads sample 0's probabilities for every sample (model.py:259 quirk) —
    so compare on sample 0 where both agree."""
    ref_soft, _ = reference_rules
    our_soft, _ = our_rules
    with torch.no_grad():
        _, ref_decisions = ref_soft.forward_with_decisions(
            torch.from_numpy(logits)
        )
    _, our_decisions = our_soft.forward_with_decisions(logits)
    ref0 = [round(float(d["prob"]), 5) for d in ref_decisions[0]]
    our0 = [round(float(d["prob"]), 5) for d in our_decisions[0]]
    assert ref0 == pytest.approx(our0, abs=1e-4)


@pytest.fixture(scope="module")
def targets():
    return np.random.RandomState(1).randint(0, 10, 32).astype(np.int64)


def test_soft_loss_parity(reference_rules, our_rules, logits, targets):
    """SoftTreeSupLoss total matches the reference's (xent + tsw * tree CE)."""
    import ref_stubs  # noqa: F401
    from nbdt.loss import SoftTreeSupLoss as RefSoftLoss

    from nbdt_tpu.losses import SoftTreeSupLoss

    ref_soft, _ = reference_rules
    our_soft, _ = our_rules
    tsw = 2.5
    ref_loss = RefSoftLoss(
        "CIFAR10", torch.nn.CrossEntropyLoss(), tree=ref_soft.tree,
        tree_supervision_weight=tsw,
    )
    our_loss = SoftTreeSupLoss(tree=our_soft.tree, tree_supervision_weight=tsw)
    with torch.no_grad():
        theirs = float(ref_loss(torch.from_numpy(logits),
                                torch.from_numpy(targets)))
    ours = float(our_loss(logits, targets.astype(np.int32)))
    assert ours == pytest.approx(theirs, rel=1e-4)


def test_hard_loss_parity(reference_rules, our_rules, logits, targets):
    """HardTreeSupLoss: our all-node masked gather equals the reference's
    per-node bucketed CE (incl. the n_sub/(B*N/2) weighting and the tsw
    factor inside forward_tree)."""
    import ref_stubs  # noqa: F401
    from nbdt.loss import HardTreeSupLoss as RefHardLoss

    from nbdt_tpu.losses import HardTreeSupLoss

    _, ref_hard = reference_rules
    _, our_hard = our_rules
    tsw = 3.0
    ref_loss = RefHardLoss(
        "CIFAR10", torch.nn.CrossEntropyLoss(), tree=ref_hard.tree,
        tree_supervision_weight=tsw,
    )
    our_loss = HardTreeSupLoss(tree=our_hard.tree, tree_supervision_weight=tsw)
    with torch.no_grad():
        theirs = float(ref_loss(torch.from_numpy(logits),
                                torch.from_numpy(targets)))
    ours = float(our_loss(logits, targets.astype(np.int32)))
    assert ours == pytest.approx(theirs, rel=1e-4)


def test_induced_graph_parity():
    """Hierarchy induction from identical centers produces the identical
    graph as the reference's sklearn-based builder (reference
    graph.py:400-464): same node set, same edges, same labels."""
    pytest.importorskip("sklearn")
    import ref_stubs  # noqa: F401
    from nbdt.graph import build_induced_graph as ref_build

    from nbdt_tpu.assets import CIFAR10_WNIDS
    from nbdt_tpu.hierarchy.build import build_induced_graph

    centers = np.random.RandomState(7).randn(10, 64).astype(np.float32)

    G_ref = ref_build(
        CIFAR10_WNIDS, None,
        state_dict={"linear.weight": torch.from_numpy(centers)},
    )
    G_ours = build_induced_graph(CIFAR10_WNIDS, centers)

    ref_nodes = set(G_ref.nodes)
    our_nodes = set(G_ours.nodes)
    assert ref_nodes == our_nodes
    assert set(G_ref.edges) == {
        (u, v) for u in G_ours.nodes for v in G_ours.succ(u)
    }


def test_seg_per_pixel_parity(reference_rules, our_rules):
    """Per-pixel seg path (coerce -> rules -> uncoerce, reference
    model.py:376-387 + utils.py:338-347): identical per-pixel leaf
    distributions, ours NHWC vs the reference's NCHW."""
    import ref_stubs  # noqa: F401
    from nbdt.utils import coerce_tensor as ref_coerce
    from nbdt.utils import uncoerce_tensor as ref_uncoerce

    from nbdt_tpu.utils import coerce_tensor, uncoerce_tensor

    ref_soft, _ = reference_rules
    our_soft, _ = our_rules

    maps_nhwc = (np.random.RandomState(3).randn(2, 4, 4, 10) * 3).astype(
        np.float32
    )
    # ours: NHWC -> flat -> rules -> NHWC
    flat = coerce_tensor(maps_nhwc)
    ours = uncoerce_tensor(np.asarray(our_soft.forward(flat)),
                           maps_nhwc.shape)
    # reference: NCHW -> flat -> rules -> NCHW
    maps_nchw = torch.from_numpy(maps_nhwc.transpose(0, 3, 1, 2))
    with torch.no_grad():
        rflat = ref_coerce(maps_nchw)
        theirs = ref_uncoerce(ref_soft(rflat), maps_nchw.shape).numpy()
    np.testing.assert_allclose(
        ours, theirs.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-6
    )
