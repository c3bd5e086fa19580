"""Tree runtime + array compilation tests."""

import numpy as np
import pytest


def test_synthetic_tree_structure(synthetic_tree):
    tree = synthetic_tree
    assert len(tree.wnids_leaves) == 7
    assert len(tree.inodes) == 4
    root = tree.root
    assert root.wnid == "i0"
    assert root.num_children == 3
    # child order = edge insertion order
    assert [c.wnid for c in root.children] == ["i1", "i2", "f00000006"]
    # class mappings: root child 0 covers classes 0-2, child 1 covers 3-5
    assert root.child_index_to_class_index[0] == [0, 1, 2]
    assert root.child_index_to_class_index[1] == [3, 4, 5]
    assert root.child_index_to_class_index[2] == [6]
    a = tree.wnid_to_node["i1"]
    assert a.class_index_to_child_index[1] == [1]


def test_tree_arrays_compile(synthetic_tree):
    ta = synthetic_tree.arrays
    assert ta.num_classes == 7
    assert ta.num_inodes == 4
    assert ta.max_children == 3
    # membership rows sum to 1 over valid children
    sums = ta.membership.sum(-1)
    assert np.allclose(sums[ta.child_mask], 1.0)
    assert np.allclose(sums[~ta.child_mask], 0.0)
    # every class is under exactly one child per covering node
    for n in range(ta.num_inodes):
        covered = ta.under[n].sum(0)  # [C]
        assert set(np.unique(covered)).issubset({0.0, 1.0})
    # target_child consistent with under
    for n in range(ta.num_inodes):
        for c in range(ta.num_classes):
            k = ta.target_child[n, c]
            if k >= 0:
                assert ta.under[n, k, c] == 1.0
            else:
                assert ta.under[n, :, c].sum() == 0.0


def test_tree_arrays_paths(synthetic_tree):
    ta = synthetic_tree.arrays
    tree = synthetic_tree
    # walk each leaf's path through the arrays and confirm it ends at the leaf
    for c, wnid in enumerate(tree.wnids_leaves):
        depth = ta.leaf_depth[c]
        assert depth >= 1
        cur = ta.root_inode
        for d in range(depth):
            n = ta.leaf_path_nodes[c, d]
            assert n == cur if d == 0 else True
            k = ta.leaf_path_children[c, d]
            nxt = ta.child_next[n, k]
            cur = nxt
        assert cur == ta.num_inodes + c  # leaf sentinel


def test_leaf_to_steps(synthetic_tree):
    steps = synthetic_tree.get_leaf_to_steps()
    s = steps["f00000003"]  # leaf3: root -> B -> C -> leaf3
    assert [x["node"].wnid for x in s] == ["i0", "i2", "i3", "f00000003"]
    assert [x["next_index"] for x in s] == [1, 0, 0, -1]


def test_reference_cifar10_tree(cifar10_reference_tree):
    tree = cifar10_reference_tree
    ta = tree.arrays
    assert ta.num_classes == 10
    assert ta.num_inodes == 9
    assert ta.max_children == 2  # CIFAR10 induced tree is binary
    assert tree.root.name == "whole"
    # membership means: root splits into animal-side and vehicle-side
    sums = ta.membership.sum(-1)
    assert np.allclose(sums[ta.child_mask], 1.0)


def test_checkpoint_fname_codec():
    from nbdt_tpu.utils import generate_checkpoint_fname

    # flagship release checkpoint name (reference model.py:31)
    fname = generate_checkpoint_fname(
        dataset="CIFAR10",
        arch="ResNet18",
        path_graph="nbdt/hierarchies/CIFAR10/graph-induced-ResNet18.json",
        loss=["SoftTreeSupLoss"],
    )
    assert fname == "ckpt-CIFAR10-ResNet18-induced-ResNet18-SoftTreeSupLoss"
    fname = generate_checkpoint_fname(
        dataset="TinyImagenet200",
        arch="ResNet18",
        path_graph="nbdt/hierarchies/TinyImagenet200/graph-induced-ResNet18.json",
        loss=["SoftTreeSupLoss"],
        tree_supervision_weight=10.0,
    )
    assert fname == "ckpt-TinyImagenet200-ResNet18-induced-ResNet18-SoftTreeSupLoss-tsw10.0"
