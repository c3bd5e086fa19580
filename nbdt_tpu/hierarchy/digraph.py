"""A minimal insertion-ordered directed graph with node-link JSON IO.

Replaces the reference's networkx dependency (reference ``nbdt/thirdparty/
nx.py``). Only the handful of operations NBDT actually uses are provided:
successor/predecessor maps, leaf/root detection, depth, BFS leaf->path, and
node-link JSON read/write compatible with the reference's 23 shipped
hierarchy files (nx.py:63-75 format: ``{directed, multigraph, graph,
nodes: [{label, id}], links: [{source, target}]}``).

Insertion order is load-bearing: the reference's per-node child order is
networkx's ``G.succ`` dict insertion order (tree.py:111), which in turn is
the JSON ``links`` array order. Decision-path parity depends on preserving
it, so ``succ``/``pred`` are plain ordered dicts keyed by edge insertion.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional, Tuple

from ..utils import makeparentdirs


class Digraph:
    def __init__(self):
        # node -> attr dict; insertion ordered
        self._nodes: Dict[str, dict] = {}
        # node -> {child: None} / {parent: None}; insertion ordered sets
        self._succ: Dict[str, Dict[str, None]] = {}
        self._pred: Dict[str, Dict[str, None]] = {}

    # -- construction -------------------------------------------------------

    def add_node(self, node: str, **attrs) -> None:
        if node not in self._nodes:
            self._nodes[node] = {}
            self._succ[node] = {}
            self._pred[node] = {}
        self._nodes[node].update(attrs)

    def add_edge(self, parent: str, child: str) -> None:
        self.add_node(parent)
        self.add_node(child)
        self._succ[parent][child] = None
        self._pred[child][parent] = None

    def remove_node(self, node: str) -> None:
        for child in list(self._succ[node]):
            del self._pred[child][node]
        for parent in list(self._pred[node]):
            del self._succ[parent][node]
        del self._nodes[node]
        del self._succ[node]
        del self._pred[node]

    def set_label(self, node: str, label: str) -> None:
        self.add_node(node, label=label)

    # -- queries ------------------------------------------------------------

    @property
    def nodes(self) -> List[str]:
        return list(self._nodes)

    def __contains__(self, node: str) -> bool:
        return node in self._nodes

    def __iter__(self) -> Iterator[str]:
        return iter(self._nodes)

    def __len__(self) -> int:
        return len(self._nodes)

    def attrs(self, node: str) -> dict:
        return self._nodes[node]

    def label(self, node: str) -> str:
        return self._nodes[node].get("label", "")

    def succ(self, node: str) -> List[str]:
        return list(self._succ[node])

    def pred(self, node: str) -> List[str]:
        return list(self._pred[node])

    def edges(self) -> List[Tuple[str, str]]:
        return [(u, v) for u in self._nodes for v in self._succ[u]]

    def is_leaf(self, node: str) -> bool:
        return len(self._succ[node]) == 0

    def descendants(self, node: str) -> List[str]:
        """All nodes reachable from ``node`` (exclusive), DFS preorder."""
        seen, order, stack = set(), [], list(reversed(self.succ(node)))
        while stack:
            cur = stack.pop()
            if cur in seen:
                continue
            seen.add(cur)
            order.append(cur)
            stack.extend(reversed(self.succ(cur)))
        return order

    def contracted(self, keep: str, remove: str) -> "Digraph":
        """Return a copy with ``remove`` merged into ``keep``.

        Mirrors ``networkx.contracted_nodes(G, keep, remove,
        self_loops=False)`` as used by prune_single_successor_nodes
        (reference graph.py:597-602): edges of ``remove`` are re-attached to
        ``keep``; ``keep``'s attrs win; ``remove``'s attrs are recorded in
        ``keep``'s ``contraction`` dict (accumulating nearest-first across
        repeated contractions — the shipped wordnet graphs carry exactly
        this structure, and mini_corpus_from_graph_json inverts it).
        """
        H = Digraph()
        for node, attrs in self._nodes.items():
            if node == remove:
                continue
            H.add_node(node, **attrs)
        contraction = dict(self._nodes[keep].get("contraction") or {})
        contraction[remove] = {
            k: v for k, v in self._nodes[remove].items() if k != "contraction"
        }
        # nested contractions (remove was itself a contraction target) keep
        # networkx's nesting behavior
        if "contraction" in self._nodes[remove]:
            contraction[remove]["contraction"] = self._nodes[remove]["contraction"]
        H.add_node(keep, contraction=contraction)
        # networkx order semantics (H = G.copy(); H.remove_node(remove);
        # H.add_edges_from(remapped)): surviving edges keep their original
        # adjacency order, and the contracted node's remapped edges are
        # APPENDED after them — in-edges first, then out-edges. Emitting
        # the remapped edges at the removed node's iteration position
        # instead reorders per-parent successor lists whenever a pruned
        # chain precedes its siblings, and per-node child order IS decision
        # -path parity (CLAUDE.md invariant; tree.py builds membership in
        # link order).
        for u in self._nodes:
            if u == remove:
                continue
            for v in self._succ[u]:
                if v != remove:
                    H.add_edge(u, v)
        for u in self._pred[remove]:
            if u != keep:
                H.add_edge(u, keep)
        for v in self._succ[remove]:
            if v != keep:
                H.add_edge(keep, v)
        return H


# ---------------------------------------------------------------------------
# Graph algorithms (reference nx.py:17-60)
# ---------------------------------------------------------------------------


def get_leaves(G: Digraph, root: Optional[str] = None) -> Iterator[str]:
    if root is None:
        nodes = G.nodes
    else:
        nodes = G.descendants(root) + [root]
    for node in nodes:
        if G.is_leaf(node):
            yield node


def get_roots(G: Digraph) -> Iterator[str]:
    for node in G.nodes:
        if len(G.pred(node)) == 0:
            yield node


def get_root(G: Digraph) -> str:
    roots = list(get_roots(G))
    assert len(roots) == 1, f"Multiple ({len(roots)}) roots found"
    return roots[0]


def get_depth(G: Digraph) -> int:
    def _depth(node: str) -> int:
        children = G.succ(node)
        if not children:
            return 1
        return max(_depth(child) for child in children) + 1

    return max(_depth(root) for root in get_roots(G))


def get_leaf_to_path(G: Digraph) -> Dict[str, List[Tuple[int, str]]]:
    """BFS from each root; per-leaf list of (child_index, node) pairs.

    child_index is the node's index *within its parent's children*; the
    root's index is 0. Matches reference nx.py:49-60.
    """
    leaf_to_path: Dict[str, List[Tuple[int, str]]] = {}
    for root in get_roots(G):
        frontier: List[Tuple[str, int, list]] = [(root, 0, [])]
        while frontier:
            node, child_index, path = frontier.pop(0)
            path = path + [(child_index, node)]
            if G.is_leaf(node):
                leaf_to_path[node] = path
                continue
            frontier.extend((child, i, path) for i, child in enumerate(G.succ(node)))
    return leaf_to_path


# ---------------------------------------------------------------------------
# Node-link JSON IO (reference nx.py:63-75)
# ---------------------------------------------------------------------------


def node_link_data(G: Digraph) -> dict:
    return {
        "directed": True,
        "multigraph": False,
        "graph": {},
        "nodes": [
            {**G.attrs(node), "id": node} for node in G.nodes
        ],
        "links": [{"source": u, "target": v} for (u, v) in G.edges()],
    }


def node_link_graph(data: dict) -> Digraph:
    G = Digraph()
    for entry in data.get("nodes", []):
        attrs = {k: v for k, v in entry.items() if k != "id"}
        G.add_node(entry["id"], **attrs)
    for link in data.get("links", []):
        G.add_edge(link["source"], link["target"])
    return G


def write_graph(G: Digraph, path) -> None:
    makeparentdirs(path)
    with open(str(path), "w") as f:
        json.dump(node_link_data(G), f)


def read_graph(path) -> Digraph:
    path = str(path)
    if not os.path.exists(path):
        from ..utils import fwd

        fallback = fwd().parent / path
        if os.path.exists(str(fallback)):
            path = str(fallback)
    with open(path) as f:
        return node_link_graph(json.load(f))
