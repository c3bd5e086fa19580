"""Pure-numpy oracle transcribing the reference NBDT semantics exactly.

Each function mirrors the corresponding reference code path
(nbdt/model.py:84-242, nbdt/loss.py:213-266) including iteration order,
per-node Python loops, and the raw probability product — so the TPU-native
vectorized implementations can be checked against it bit-for-bit (up to
float tolerance).
"""

from __future__ import annotations

import numpy as np


def softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def oracle_node_logits(outputs: np.ndarray, node) -> np.ndarray:
    """reference model.py:84-99: stack of per-child means over descendant
    leaf class logits."""
    cols = []
    for child_index in range(node.num_classes):
        old = node.child_index_to_class_index[child_index]
        cols.append(outputs[:, old].mean(axis=1))
    return np.stack(cols, axis=1)


def oracle_all_node_outputs(outputs: np.ndarray, tree) -> dict:
    """reference model.py:101-123."""
    wnid_to_outputs = {}
    for node in tree.inodes:
        nl = oracle_node_logits(outputs, node)
        probs = softmax(nl, axis=1)
        ent = -np.where(probs > 0, probs * np.log(probs), 0.0).sum(axis=1)
        wnid_to_outputs[node.wnid] = {
            "logits": nl,
            "preds": nl.argmax(axis=1),
            "probs": probs,
            "entropy": ent,
        }
    return wnid_to_outputs


def oracle_soft_traverse(outputs: np.ndarray, tree) -> np.ndarray:
    """reference model.py:208-242: product of child probs down each path.

    Multi-path note: on a DAG a class may sit under several children of
    ONE node, giving duplicate ``old_indices`` — the reference REJECTS
    such inputs outright (explicit AssertionError, model.py:237-240). The
    rebuild EXTENDS the domain with the well-defined every-slot product
    (rules.soft_leaf_log_probs), which this oracle mirrors via
    np.multiply.at (unbuffered). Identical on trees and on DAGs whose
    within-node memberships stay disjoint (the reference-legal set)."""
    wnid_to_outputs = oracle_all_node_outputs(outputs, tree)
    num_samples = outputs.shape[0]
    num_classes = len(tree.classes)
    class_probs = np.ones((num_samples, num_classes), dtype=np.float64)
    for node in tree.inodes:
        out = wnid_to_outputs[node.wnid]
        old_indices, new_indices = [], []
        for index_child in range(len(node.children)):
            old = node.child_index_to_class_index[index_child]
            old_indices.extend(old)
            new_indices.extend([index_child] * len(old))
        np.multiply.at(
            class_probs, (slice(None), old_indices),
            out["probs"][:, new_indices],
        )
    return class_probs


def oracle_hard_traverse(outputs: np.ndarray, tree):
    """reference model.py:146-186: per-sample argmax walk root->leaf."""
    wnid_to_outputs = oracle_all_node_outputs(outputs, tree)
    n_samples = outputs.shape[0]
    preds = []
    for index in range(n_samples):
        node = tree.root
        while not node.is_leaf():
            out = wnid_to_outputs[node.wnid]
            index_child = int(out["preds"][index])
            node = node.children[index_child]
        preds.append(tree.wnid_to_class_index[node.wnid])
    return np.array(preds, dtype=np.int64)


def oracle_cross_entropy(logits: np.ndarray, targets: np.ndarray) -> float:
    """torch nn.CrossEntropyLoss (mean)."""
    logp = logits - logits.max(axis=1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(axis=1, keepdims=True))
    return float(-logp[np.arange(len(targets)), targets].mean())


def oracle_soft_tree_sup_loss(outputs: np.ndarray, targets: np.ndarray, tree) -> float:
    """reference loss.py:264-266: CE over the leaf distribution as logits."""
    class_probs = oracle_soft_traverse(outputs, tree)
    return oracle_cross_entropy(class_probs, targets)


def oracle_hard_tree_sup_loss(
    outputs: np.ndarray, targets: np.ndarray, tree, tree_supervision_weight=1.0,
    criterion=None,
) -> float:
    """reference loss.py:213-257: bucketed per-node filtered CE, transcribed
    with the exact bucketing + weighting. ``criterion(logits, targets) ->
    float`` routes a custom base criterion into every bucket exactly as the
    reference's ``self.criterion`` is (loss.py:247-251)."""
    from collections import defaultdict

    criterion = criterion or oracle_cross_entropy
    loss = 0.0
    num_losses = outputs.shape[0] * len(tree.inodes) / 2.0
    outputs_subs = defaultdict(list)
    targets_subs = defaultdict(list)
    targets_ints = [int(t) for t in targets]
    for node in tree.inodes:
        classes = [node.class_index_to_child_index.get(t, []) for t in targets_ints]
        selector = [bool(cls) for cls in classes]
        targets_sub = [cls[0] for cls in classes if cls]
        outputs_filtered = outputs[selector]
        if outputs_filtered.shape[0] == 0:
            continue
        outputs_sub = oracle_node_logits(outputs_filtered, node)
        key = node.num_classes
        outputs_subs[key].append(outputs_sub)
        targets_subs[key].extend(targets_sub)

    for key in outputs_subs:
        outputs_sub = np.concatenate(outputs_subs[key], axis=0)
        targets_sub = np.array(targets_subs[key], dtype=np.int64)
        if not outputs_sub.shape[0]:
            continue
        fraction = outputs_sub.shape[0] / num_losses * tree_supervision_weight
        loss += float(criterion(outputs_sub, targets_sub)) * fraction
    return float(loss)
