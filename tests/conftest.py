"""Test fixtures. Platform forcing lives in the repo-root conftest.py
(CPU backend + 8 virtual devices for sharding tests, SURVEY §4)."""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

REFERENCE = Path("/root/reference")


@pytest.fixture()
def rng():
    # Function-scoped on purpose: a session-scoped shared RandomState made
    # every test's inputs depend on which tests ran before it, so a
    # full-suite failure could not be reproduced by running the one test.
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def reference_available():
    return REFERENCE.exists()


def reference_graph_path(dataset: str, hierarchy: str) -> Path:
    return REFERENCE / "nbdt" / "hierarchies" / dataset / f"graph-{hierarchy}.json"


def reference_wnids_path(dataset: str) -> Path:
    return REFERENCE / "nbdt" / "wnids" / f"{dataset}.txt"


@pytest.fixture(scope="session")
def synthetic_tree():
    """A small irregular tree over 7 classes, built in-memory.

    Structure: root -> (A, B, leaf6); A -> (leaf0, leaf1, leaf2);
    B -> (C, leaf5); C -> (leaf3, leaf4). Mixed fanout exercises padding.
    """
    from nbdt_tpu.hierarchy.digraph import Digraph
    from nbdt_tpu.tree import Tree

    G = Digraph()
    wnids = [f"f{i:08d}" for i in range(7)]
    for w in wnids:
        G.add_node(w, label=f"leaf{int(w[1:])}")
    for inner, label in [("i0", "root"), ("i1", "A"), ("i2", "B"), ("i3", "C")]:
        G.add_node(inner, label=label)
    G.add_edge("i0", "i1")
    G.add_edge("i0", "i2")
    G.add_edge("i0", wnids[6])
    G.add_edge("i1", wnids[0])
    G.add_edge("i1", wnids[1])
    G.add_edge("i1", wnids[2])
    G.add_edge("i2", "i3")
    G.add_edge("i2", wnids[5])
    G.add_edge("i3", wnids[3])
    G.add_edge("i3", wnids[4])
    classes = [f"class{i}" for i in range(7)]
    return Tree.from_graph(G, wnids, classes)


@pytest.fixture(scope="session")
def cifar10_reference_tree(reference_available):
    """Tree loaded from the reference's shipped CIFAR10 induced graph —
    the golden parity fixture (skipped when the reference isn't mounted)."""
    if not reference_available:
        pytest.skip("reference repo not mounted")
    from nbdt_tpu.tree import Tree
    from nbdt_tpu.utils import DATASET_TO_CLASSES

    return Tree(
        "CIFAR10",
        path_graph=str(reference_graph_path("CIFAR10", "induced")),
        path_wnids=str(reference_wnids_path("CIFAR10")),
        classes=DATASET_TO_CLASSES["CIFAR10"],
    )
