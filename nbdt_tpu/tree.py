"""Tree runtime: host-side hierarchy + compilation to static device arrays.

Rebuild of reference ``nbdt/tree.py`` with one structural change that defines
the whole TPU design: the reference's decision rules walk a dict-of-Nodes in
Python per batch (reference model.py:101-123, 228-241); here the Tree is
*compiled once* on the host into a :class:`TreeArrays` bundle of static
numpy/jnp constants — per-node child membership matrices, padded child
tables, per-leaf path tables — that jitted decision rules close over. All
per-batch tree math then becomes two matmuls and a masked softmax (MXU work),
with zero host<->device traffic.

Semantics preserved exactly (verified by oracle tests):
  * per-node child order = graph successor insertion order = JSON link order
    (reference tree.py:111 via networkx dict order);
  * inode order = sorted-by-wnid over non-leaf nodes (reference tree.py:172-173);
  * node child logits = mean of backbone logits over the child's descendant
    leaves (reference model.py:94-99);
  * leaf distribution = product over the root->leaf path of child softmax
    probabilities (reference model.py:226-241).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from .assets import get_dataset_wnids
from .hierarchy.digraph import (
    Digraph,
    get_leaf_to_path,
    get_leaves,
    read_graph,
)
from .hierarchy.wnid import wnid_to_name
from .utils import (
    DATASET_TO_NUM_CLASSES,
    dataset_to_default_path_graph,
    dataset_to_default_path_wnids,
    hierarchy_to_path_graph,
)


def dataset_to_dummy_classes(dataset: str) -> List[str]:
    """Placeholder class names (reference tree.py:20-23)."""
    num_classes = DATASET_TO_NUM_CLASSES[dataset]
    return ["f{:08d}".format(i) for i in range(num_classes)]


class Node:
    """A hierarchy node with cached class<->child mappings.

    Mirrors reference tree.py:38-142. ``class_index_to_child_index`` maps a
    global class index to the list of child slots it falls under (singleton
    for trees); ``child_index_to_class_index`` maps a child slot to the
    global class indices of its descendant leaves.
    """

    def __init__(self, tree: "Tree", wnid: str, other_class: bool = False):
        self.tree = tree
        self.wnid = wnid
        self.name = tree.wnid_to_label.get(wnid) or wnid_to_name(wnid)

        self.original_classes = tree.classes
        self.num_original_classes = len(tree.wnids_leaves)

        self.has_other = other_class and not (self.is_root() or self.is_leaf())
        self.num_children = len(self.succ)
        self.num_classes = self.num_children + int(self.has_other)

        (
            self.class_index_to_child_index,
            self.child_index_to_class_index,
        ) = self.build_class_mappings()
        self.classes = self.build_classes()

        self.leaves = list(get_leaves(tree.G, self.wnid))
        self.num_leaves = len(self.leaves)

    @property
    def succ(self) -> List[str]:
        return self.tree.G.succ(self.wnid)

    @property
    def pred(self) -> List[str]:
        return self.tree.G.pred(self.wnid)

    @property
    def children(self) -> List["Node"]:
        return [self.tree.wnid_to_node[wnid] for wnid in self.succ]

    @property
    def parents(self) -> List["Node"]:
        return [self.tree.wnid_to_node[wnid] for wnid in self.pred]

    @property
    def parent(self) -> Optional["Node"]:
        parents = self.parents
        return parents[0] if parents else None

    def is_leaf(self) -> bool:
        return len(self.succ) == 0

    def is_root(self) -> bool:
        return len(self.pred) == 0

    def wnid_to_class_index(self, wnid: str) -> int:
        return self.tree.wnids_leaves.index(wnid)

    def wnid_to_child_index(self, wnid: str) -> int:
        return [child.wnid for child in self.children].index(wnid)

    def build_class_mappings(self):
        if self.is_leaf():
            return {}, {}
        old_to_new: Dict[int, List[int]] = {}
        new_to_old: Dict[int, List[int]] = {}
        for new_index, child in enumerate(self.succ):
            new_to_old.setdefault(new_index, [])
            for leaf in get_leaves(self.tree.G, child):
                old_index = self.tree.wnid_to_class_index.get(leaf)
                if old_index is None:
                    continue
                old_to_new.setdefault(old_index, []).append(new_index)
                new_to_old[new_index].append(old_index)
        if not self.has_other:
            return old_to_new, new_to_old
        new_index = self.num_children
        new_to_old.setdefault(new_index, [])
        for old in range(self.num_original_classes):
            if old not in old_to_new:
                old_to_new.setdefault(old, []).append(new_index)
                new_to_old[new_index].append(old)
        return old_to_new, new_to_old

    def build_classes(self) -> List[str]:
        return [
            ",".join(
                self.original_classes[old]
                for old in old_indices
                if old < len(self.original_classes)
            )
            for _, old_indices in sorted(
                self.child_index_to_class_index.items(), key=lambda t: t[0]
            )
        ]

    @property
    def class_counts(self) -> List[int]:
        return [
            len(v)
            for _, v in sorted(
                self.child_index_to_class_index.items(), key=lambda t: t[0]
            )
        ]

    @staticmethod
    def dim(nodes: Sequence["Node"]) -> int:
        return sum(node.num_classes for node in nodes)

    def __repr__(self):
        return f"Node({self.wnid}, name={self.name!r}, children={self.num_children})"


class Tree:
    """In-memory hierarchy (reference tree.py:145-241) + array compiler."""

    def __init__(
        self,
        dataset: Optional[str],
        path_graph: Optional[str] = None,
        path_wnids: Optional[str] = None,
        classes: Optional[Sequence[str]] = None,
        hierarchy: Optional[str] = None,
        graph: Optional[Digraph] = None,
        wnids_leaves: Optional[Sequence[str]] = None,
    ):
        if dataset and hierarchy and not path_graph:
            path_graph = hierarchy_to_path_graph(dataset, hierarchy)
        if dataset and not path_graph and graph is None:
            path_graph = dataset_to_default_path_graph(dataset)
        if dataset and not path_wnids and wnids_leaves is None:
            path_wnids = dataset_to_default_path_wnids(dataset)
        if dataset and not classes:
            classes = dataset_to_dummy_classes(dataset)

        self._arrays: Optional["TreeArrays"] = None
        self.load_hierarchy(
            dataset, path_graph, path_wnids, classes, graph=graph,
            wnids_leaves=wnids_leaves,
        )

    @classmethod
    def from_graph(
        cls,
        graph: Digraph,
        wnids_leaves: Sequence[str],
        classes: Optional[Sequence[str]] = None,
        dataset: Optional[str] = None,
    ) -> "Tree":
        """Build directly from an in-memory graph (no files)."""
        classes = list(classes) if classes else list(wnids_leaves)
        return cls(
            dataset, classes=classes, graph=graph, wnids_leaves=wnids_leaves
        )

    def load_hierarchy(
        self, dataset, path_graph, path_wnids, classes, graph=None, wnids_leaves=None
    ) -> None:
        self.dataset = dataset
        self.path_graph = path_graph
        self.path_wnids = path_wnids
        self.classes = list(classes)
        self.G = graph if graph is not None else read_graph(path_graph)
        if wnids_leaves is not None:
            self.wnids_leaves = list(wnids_leaves)
        elif dataset is not None and (
            path_wnids is None or not _exists(path_wnids)
        ):
            self.wnids_leaves = get_dataset_wnids(dataset, path_wnids)
        else:
            from .hierarchy.wnid import get_wnids

            self.wnids_leaves = get_wnids(path_wnids)
        self.wnid_to_label = {n: self.G.label(n) for n in self.G.nodes}
        self.wnid_to_class = dict(zip(self.wnids_leaves, self.classes))
        self.wnid_to_class_index = {w: i for i, w in enumerate(self.wnids_leaves)}
        self.wnid_to_node = {wnid: Node(self, wnid) for wnid in self.G}
        self.nodes = [self.wnid_to_node[w] for w in sorted(self.wnid_to_node)]
        self.inodes = [n for n in self.nodes if not n.is_leaf()]
        self.leaves = [self.wnid_to_node[w] for w in self.wnids_leaves]
        self._arrays = None  # invalidate compiled arrays

    @classmethod
    def create_from_args(cls, args, classes=None) -> "Tree":
        return cls(
            args.dataset,
            args.path_graph,
            args.path_wnids,
            classes=classes,
            hierarchy=args.hierarchy,
        )

    @property
    def root(self) -> Node:
        for node in self.inodes:
            if node.is_root():
                return node
        raise RuntimeError("Tree should always have a root")

    def get_leaf_to_steps(self) -> Dict[str, List[dict]]:
        """Per-leaf root->leaf step dicts (reference tree.py:215-229)."""
        leaf_to_path = get_leaf_to_path(self.G)
        leaf_to_steps = {}
        for leaf in self.wnids_leaves:
            next_indices = [index for index, _ in leaf_to_path[leaf][1:]] + [-1]
            leaf_to_steps[leaf] = [
                {
                    "node": self.wnid_to_node[wnid],
                    "name": self.wnid_to_node[wnid].name,
                    "next_index": next_index,
                }
                for next_index, (_, wnid) in zip(next_indices, leaf_to_path[leaf])
            ]
        return leaf_to_steps

    def update_from_model(
        self, params, arch, dataset, classes=None, path_wnids=None,
        path_graph=None, force: bool = True,
    ) -> None:
        """Regenerate the induced hierarchy from live model params
        (reference tree.py:176-190, used by SoftTreeLoss).

        ``force`` defaults to True: regeneration IS this method's contract
        (the reference overwrites unconditionally), so the vendored-fixture
        guard that protects the packaged parity graphs from *accidental*
        CLI writes must not apply here. Pass ``force=False`` to opt into
        the guard when ``path_graph`` resolves into the package dir."""
        from .hierarchy.generate import generate_hierarchy

        path_graph = generate_hierarchy(
            dataset=dataset,
            method="induced",
            arch=arch,
            params=params,
            path=path_graph,
            wnids=self.wnids_leaves,
            force=force,
        )
        self.load_hierarchy(
            dataset=dataset,
            path_graph=path_graph,
            path_wnids=path_wnids or self.path_wnids,
            classes=classes or self.classes,
            wnids_leaves=self.wnids_leaves,
        )

    def visualize(self, path_html: str, dataset: Optional[str] = None, **kwargs):
        from .hierarchy.vis import generate_hierarchy_vis_from

        return generate_hierarchy_vis_from(
            self.G, dataset=dataset or self.dataset, path_html=path_html, **kwargs
        )

    # -- array compilation ---------------------------------------------------

    @property
    def arrays(self) -> "TreeArrays":
        if self._arrays is None:
            self._arrays = TreeArrays.compile(self)
        return self._arrays


@dataclass(frozen=True)
class TreeArrays:
    """Static tensor encoding of a Tree, the jit-time constant bundle.

    Shapes: C = num classes (leaves), N = num inner nodes (in ``tree.inodes``
    order, i.e. sorted by wnid), K = max children of any inner node, D = max
    root->leaf path length in inner-node steps.
    """

    num_classes: int
    num_inodes: int
    max_children: int
    max_depth: int

    # membership[n, k, c] = 1/|leaves(child k of node n)| if class c is a
    # descendant leaf of that child else 0. Node child logits are then
    # logits @ membership[n].T — the reference's stack-of-means
    # (model.py:94-99) as one matmul.
    membership: np.ndarray  # float32 [N, K, C]
    # under[n, k, c] = 1 if class c is under child k of node n.
    under: np.ndarray  # float32 [N, K, C]
    child_mask: np.ndarray  # bool [N, K]
    num_children: np.ndarray  # int32 [N]
    # target_child[n, c] = child slot of class c at node n, -1 if c is not
    # under node n. (reference tree.py:105-125 class_index_to_child_index)
    target_child: np.ndarray  # int32 [N, C]
    # child_next[n, k]: inode index of child k if it is an inner node, else
    # N + class_index if it is a leaf; -1 for padding. Drives the hard
    # traversal without data-dependent Python.
    child_next: np.ndarray  # int32 [N, K]
    root_inode: int
    # Per-leaf root->leaf path through inner nodes: inode index and chosen
    # child slot at each step, -1 padded. leaf_depth[c] = #steps.
    leaf_path_nodes: np.ndarray  # int32 [C, D]
    leaf_path_children: np.ndarray  # int32 [C, D]
    leaf_depth: np.ndarray  # int32 [C]

    wnids_inodes: tuple = field(default=())  # wnid per inode row
    wnids_leaves: tuple = field(default=())
    # True when any graph node has multiple parents (--multi-path wordnet
    # DAGs): hard_traverse's closed form assumes each leaf has a UNIQUE
    # root path and must fall back to the literal greedy walk.
    is_multipath: bool = field(default=False)

    @staticmethod
    def compile(tree: Tree) -> "TreeArrays":
        C = len(tree.wnids_leaves)
        inodes = tree.inodes
        N = len(inodes)
        assert N > 0, "Tree has no inner nodes"
        K = max(n.num_classes for n in inodes)
        wnid_to_inode = {n.wnid: i for i, n in enumerate(inodes)}

        membership = np.zeros((N, K, C), dtype=np.float32)
        under = np.zeros((N, K, C), dtype=np.float32)
        child_mask = np.zeros((N, K), dtype=bool)
        num_children = np.zeros((N,), dtype=np.int32)
        target_child = np.full((N, C), -1, dtype=np.int32)
        child_next = np.full((N, K), -1, dtype=np.int32)

        for i, node in enumerate(inodes):
            num_children[i] = node.num_classes
            for k in range(node.num_classes):
                child_mask[i, k] = True
                old = node.child_index_to_class_index.get(k, [])
                if old:
                    membership[i, k, old] = 1.0 / len(old)
                    under[i, k, old] = 1.0
                    # First child wins when a class sits under multiple
                    # children (multi-path graphs): the reference's hard
                    # loss targets class_index_to_child_index[t][0]
                    # (model.py:134-136), so later slots must not overwrite.
                    old_arr = np.asarray(old)
                    unset = target_child[i, old_arr] < 0
                    target_child[i, old_arr[unset]] = k
                if k < node.num_children:
                    child_wnid = node.succ[k]
                    if child_wnid in wnid_to_inode:
                        child_next[i, k] = wnid_to_inode[child_wnid]
                    else:
                        ci = tree.wnid_to_class_index.get(child_wnid)
                        if ci is None:
                            raise ValueError(
                                f"Graph leaf {child_wnid!r} is not in the "
                                f"class wnid list ({C} classes). Host-side "
                                "Tree tooling tolerates extra graph leaves "
                                "(Node.build_class_mappings skips them), "
                                "but the device arrays cannot represent a "
                                "leaf with no class — regenerate the "
                                "hierarchy for this class list or pass "
                                "matching wnids."
                            )
                        child_next[i, k] = N + ci

        # Per-leaf paths. leaf_to_path includes the root and the leaf; the
        # inner-node steps are all entries except the final leaf.
        leaf_to_path = get_leaf_to_path(tree.G)
        D = max(len(leaf_to_path[w]) - 1 for w in tree.wnids_leaves)
        D = max(D, 1)
        leaf_path_nodes = np.full((C, D), -1, dtype=np.int32)
        leaf_path_children = np.full((C, D), -1, dtype=np.int32)
        leaf_depth = np.zeros((C,), dtype=np.int32)
        for c, wnid in enumerate(tree.wnids_leaves):
            path = leaf_to_path[wnid]
            steps = path[:-1]  # inner nodes
            leaf_depth[c] = len(steps)
            for d, (_, node_wnid) in enumerate(steps):
                leaf_path_nodes[c, d] = wnid_to_inode[node_wnid]
                # child index chosen at this step = next entry's child_index
                leaf_path_children[c, d] = path[d + 1][0]

        root_inode = wnid_to_inode[tree.root.wnid]
        return TreeArrays(
            num_classes=C,
            num_inodes=N,
            max_children=K,
            max_depth=D,
            membership=membership,
            under=under,
            child_mask=child_mask,
            num_children=num_children,
            target_child=target_child,
            child_next=child_next,
            root_inode=root_inode,
            leaf_path_nodes=leaf_path_nodes,
            leaf_path_children=leaf_path_children,
            leaf_depth=leaf_depth,
            wnids_inodes=tuple(n.wnid for n in inodes),
            wnids_leaves=tuple(tree.wnids_leaves),
            is_multipath=any(
                len(tree.G.pred(n)) > 1 for n in tree.G.nodes
            ),
        )


def _exists(path) -> bool:
    import os

    return path is not None and os.path.exists(str(path))
