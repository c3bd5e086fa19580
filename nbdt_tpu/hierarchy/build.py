"""Hierarchy graph builders: induced, random, and WordNet.

TPU-native rebuild of reference ``nbdt/graph.py``. The induced builder
(reference graph.py:400-464) clusters the rows of the network's final FC
layer ("class centers") with ward agglomerative clustering, then creates one
parent node per merge, named by the deepest unused common WordNet hypernym of
its children (graph.py:610-644) or a FakeSynset when WordNet is unavailable.

Centers come in as a plain numpy array — the caller (``generate.py``)
extracts them from Flax param pytrees, torch ``.pth`` checkpoints, or raw
state dicts (reference graph.py:467-511 semantics).
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence

import numpy as np

from .cluster import ward_children
from .digraph import Digraph, get_leaves, get_root, get_roots
from .wnid import (
    FakeSynset,
    synset_to_name,
    synset_to_wnid,
    wnid_to_synset,
    wordnet_available,
)


def set_node_label(G: Digraph, synset) -> None:
    G.set_label(synset_to_wnid(synset), synset_to_name(synset))


def set_random_node_label(G: Digraph, node: str) -> None:
    G.set_label(node, "")


# ---------------------------------------------------------------------------
# Induced graph (reference graph.py:400-464)
# ---------------------------------------------------------------------------


def build_induced_graph(
    wnids: Sequence[str],
    centers: np.ndarray,
    branching_factor: int = 2,
    dataset: str = "CIFAR10",
) -> Digraph:
    """Hierarchy induced from FC-layer class centers via ward clustering.

    ``centers`` is [num_classes, dim]; row order must equal ``wnids`` order
    (= dataset class order). One parent is created per ward merge; with the
    full merge list this always yields a single root.
    """
    num_classes = len(wnids)
    centers = np.asarray(centers)
    assert centers.ndim == 2 and centers.shape[0] == num_classes, (
        f"centers {centers.shape} does not match {num_classes} classes for "
        f"dataset {dataset}"
    )

    G = Digraph()
    for wnid in wnids:
        G.add_node(wnid)
        set_node_label(G, wnid_to_synset(wnid))

    children = ward_children(centers)
    index_to_wnid = {}
    for index, pair in enumerate(map(tuple, children)):
        child_wnids, child_synsets = [], []
        for child in pair:
            if child < num_classes:
                child_wnid = wnids[child]
            else:
                child_wnid = index_to_wnid[child - num_classes]
            child_wnids.append(child_wnid)
            child_synsets.append(wnid_to_synset(child_wnid))

        parent = get_wordnet_meaning(G, child_synsets)
        parent_wnid = synset_to_wnid(parent)
        G.add_node(parent_wnid)
        set_node_label(G, parent)
        index_to_wnid[index] = parent_wnid
        for child_wnid in child_wnids:
            G.add_edge(parent_wnid, child_wnid)

    roots = list(get_roots(G))
    assert len(roots) == 1, f"Expected single root, got {roots}"
    return G


# ---------------------------------------------------------------------------
# Random graph (reference graph.py:330-378)
# ---------------------------------------------------------------------------


def build_random_graph(
    wnids: Sequence[str], seed: int = 0, branching_factor: int = 2
) -> Digraph:
    wnids = list(wnids)
    random.seed(seed)

    G = Digraph()
    if seed >= 0:
        random.shuffle(wnids)

    # Group leaves bottom-up by branching factor.
    remaining: list = wnids
    while len(remaining) > 1:
        current, remaining = remaining, []
        while current:
            nodes, current = current[:branching_factor], current[branching_factor:]
            remaining.append(nodes)

    # Emit the graph root-down, numbering generated nodes.
    G.add_node("0")
    set_random_node_label(G, "0")
    queue = [(remaining[0], "0")]
    i = 1
    while queue:
        group, parent = queue.pop(0)
        if len(group) == 1:
            if isinstance(group[0], str):
                G.add_node(group[0])
                set_node_label(G, wnid_to_synset(group[0]))
                G.add_edge(parent, group[0])
            else:
                queue.append((group[0], parent))
            continue
        for candidate in group:
            is_leaf = not isinstance(candidate, list)
            wnid = candidate if is_leaf else str(i)
            G.add_node(wnid)
            if is_leaf:
                set_node_label(G, wnid_to_synset(wnid))
            else:
                set_random_node_label(G, wnid)
            G.add_edge(parent, wnid)
            i += 1
            if not is_leaf:
                queue.append((candidate, wnid))
    return G


# ---------------------------------------------------------------------------
# WordNet graph (reference graph.py:289-322) — requires the corpus.
# ---------------------------------------------------------------------------


def build_minimal_wordnet_graph(wnids: Sequence[str], multi_path: bool = False) -> Digraph:
    assert wordnet_available(), (
        "Building a WordNet hierarchy requires the NLTK WordNet corpus. "
        "Run nbdt_tpu.hierarchy.wnid.maybe_install_wordnet() with network "
        "access, or use method='induced'/'random'."
    )
    G = Digraph()
    for wnid in wnids:
        G.add_node(wnid)
        synset = wnid_to_synset(wnid)
        set_node_label(G, synset)

        if wnid == "n10129825":  # 'girl': re-parent away from 'woman'
            if not multi_path:
                G.add_edge("n09624168", "n10129825")  # child of 'male'
            else:
                G.add_edge("n09619168", "n10129825")
            G.add_edge("n09619168", "n10129825")  # child of 'female'
            continue

        hypernyms = [synset]
        while hypernyms:
            current = hypernyms.pop(0)
            set_node_label(G, current)
            for hypernym in current.hypernyms():
                G.add_edge(synset_to_wnid(hypernym), synset_to_wnid(current))
                hypernyms.append(hypernym)
                if not multi_path:
                    break

        children = G.succ(wnid)
        assert len(children) == 0, (
            f"Node {wnid} ({synset.name()}) is not a leaf. Children: {children}"
        )
    return G


# ---------------------------------------------------------------------------
# Post-processing (reference graph.py:519-549, 597-602)
# ---------------------------------------------------------------------------


def prune_single_successor_nodes(G: Digraph) -> Digraph:
    for node in G.nodes:
        if node in G and len(G.succ(node)) == 1:
            succ = G.succ(node)[0]
            G = G.contracted(succ, node)
    return G


def augment_graph(
    G: Digraph,
    extra: float,
    allow_imaginary: bool = False,
    seed: int = 0,
    max_retries: int = 10000,
):
    """Add ``extra``% more (random) intermediate nodes under the root."""
    n = len(G.nodes)
    n_extra = int(extra / 100.0 * n)
    random.seed(seed)

    n_imaginary = 0
    for i in range(n_extra):
        candidate, is_imaginary_synset, children = get_new_node(G)
        if not is_imaginary_synset or allow_imaginary:
            add_node_to_graph(G, candidate, children)
            n_imaginary += is_imaginary_synset
            continue
        if n_imaginary > 0:
            return G, i, n_imaginary
        retries, is_imaginary_synset = 0, True
        while is_imaginary_synset:
            candidate, is_imaginary_synset, children = get_new_node(G)
            retries += 1
            if retries > max_retries:
                print(f"Exceeded max retries ({max_retries})")
                return G, i, n_imaginary
        add_node_to_graph(G, candidate, children)
    return G, n_extra, n_imaginary


def get_new_node(G: Digraph):
    root = get_root(G)
    nodes = [n for n in G.nodes if n is not root and not n.startswith("f")]
    children = get_new_adjacency(G, nodes)
    synsets = [wnid_to_synset(wnid) for wnid in children]
    candidate = get_wordnet_meaning(G, synsets)
    return candidate, candidate.pos() == "f", children


def add_node_to_graph(G: Digraph, candidate, children) -> None:
    root = get_root(G)
    wnid = synset_to_wnid(candidate)
    G.add_node(wnid)
    set_node_label(G, candidate)
    for child in children:
        G.add_edge(wnid, child)
    G.add_edge(root, wnid)


def get_new_adjacency(G: Digraph, nodes: List[str]):
    adjacency = set(tuple(G.succ(n)) for n in G.nodes)
    children = next(iter(adjacency))
    while children in adjacency:
        k = random.randint(2, 4)
        children = tuple(random.sample(nodes, k=k))
    return children


# ---------------------------------------------------------------------------
# WordNet naming of generated parents (reference graph.py:610-644)
# ---------------------------------------------------------------------------


def get_wordnet_meaning(G: Digraph, synsets):
    hypernyms = get_common_hypernyms(synsets)
    candidate = pick_unseen_hypernym(G, hypernyms) if hypernyms else None
    if candidate is None:
        return FakeSynset.create_from_offset(len(G.nodes))
    return candidate


def deepest_synset(synsets):
    return max(synsets, key=lambda synset: synset.max_depth())


def get_common_hypernyms(synsets):
    if not wordnet_available():
        return set()
    if any(isinstance(s, FakeSynset) or s.pos() == "f" for s in synsets):
        return set()
    common = set(synsets[0].common_hypernyms(synsets[1]))
    for synset in synsets[2:]:
        common &= set(synsets[0].common_hypernyms(synset))
    return common


def pick_unseen_hypernym(G: Digraph, common_hypernyms):
    assert len(common_hypernyms) > 0
    candidate = deepest_synset(common_hypernyms)
    wnid = synset_to_wnid(candidate)
    while common_hypernyms and wnid in G:
        common_hypernyms -= {candidate}
        if not common_hypernyms:
            return None
        candidate = deepest_synset(common_hypernyms)
        wnid = synset_to_wnid(candidate)
    return candidate
