"""Embedded decision rules — the NBDT inference core, TPU-native.

Rebuild of reference ``nbdt/model.py:65-273``. The reference iterates over
tree nodes in Python per batch (model.py:101-123) and walks samples one at a
time for hard inference (model.py:164-185). Here both rules are closed-form
tensor programs over the static :class:`~nbdt_tpu.tree.TreeArrays` constants:

  soft:  node_logits = logits @ M.T          (one [B,C]x[C,N*K] matmul, MXU)
         log-softmax per node (masked, VPU)
         leaf_logp = logp @ U                (one [B,N*K]x[N*K,C] matmul, MXU)
         class_probs = exp(leaf_logp)        (== reference's raw prob product)

  hard:  per-node argmax, then a D-step vectorized index walk over the
         padded child table (lax.scan; no per-sample Python).

Both return per-node probabilities/entropies so decision paths and the
analyzer family come for free. Numerical note: the reference multiplies raw
probabilities (model.py:241) which underflows for deep trees; we accumulate
in log space and exponentiate, which is bitwise-close for shallow trees and
strictly safer for deep ones (SURVEY §7 "quirks" item, fixed deliberately).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .tree import Tree, TreeArrays

NEG_INF = -1e30  # large-finite, avoids inf-inf NaNs in masked softmax


class JTreeArrays(NamedTuple):
    """Device-resident tree constants (see TreeArrays for shapes)."""

    membership: jnp.ndarray  # [N, K, C] f32
    under: jnp.ndarray  # [N, K, C] f32
    child_mask: jnp.ndarray  # [N, K] bool
    target_child: jnp.ndarray  # [N, C] i32
    child_next: jnp.ndarray  # [N, K] i32
    leaf_path_nodes: jnp.ndarray  # [C, D] i32
    leaf_path_children: jnp.ndarray  # [C, D] i32
    root_inode: int  # static
    num_inodes: int  # static
    num_classes: int  # static
    max_children: int  # static
    max_depth: int  # static
    is_multipath: bool = False  # static; DAG graphs use the scan walk


def to_device_tree(ta: TreeArrays) -> JTreeArrays:
    return JTreeArrays(
        membership=jnp.asarray(ta.membership),
        under=jnp.asarray(ta.under),
        child_mask=jnp.asarray(ta.child_mask),
        target_child=jnp.asarray(ta.target_child),
        child_next=jnp.asarray(ta.child_next),
        leaf_path_nodes=jnp.asarray(ta.leaf_path_nodes),
        leaf_path_children=jnp.asarray(ta.leaf_path_children),
        root_inode=int(ta.root_inode),
        num_inodes=int(ta.num_inodes),
        num_classes=int(ta.num_classes),
        max_children=int(ta.max_children),
        max_depth=int(ta.max_depth),
        is_multipath=bool(getattr(ta, "is_multipath", False)),
    )


# ---------------------------------------------------------------------------
# Node-level outputs (reference model.py:84-123)
# ---------------------------------------------------------------------------


def get_node_logits(logits: jnp.ndarray, jt: JTreeArrays) -> jnp.ndarray:
    """Per-node child logits [B, N, K]: mean of class logits over each
    child's descendant leaves, as a single matmul against the membership
    matrix (replaces reference model.py:94-99 stack-of-means)."""
    B = logits.shape[0]
    N, K, C = jt.membership.shape
    m2 = jt.membership.reshape(N * K, C)  # [N*K, C]
    # HIGHEST precision: TPU default truncates f32 matmul inputs to bf16,
    # which perturbs node logits enough to flip argmax on close decisions —
    # decision-path parity with the reference requires full f32.
    nl = jnp.dot(
        logits.astype(jnp.float32), m2.T, precision=jax.lax.Precision.HIGHEST
    )
    return nl.reshape(B, N, K)


def masked_log_softmax(node_logits: jnp.ndarray, child_mask: jnp.ndarray):
    """Log-softmax over the child axis, padding slots excluded.

    Returns (log_probs, probs); padded slots get log_prob=NEG_INF, prob=0.
    """
    masked = jnp.where(child_mask[None], node_logits, NEG_INF)
    lse = jax.nn.logsumexp(masked, axis=-1, keepdims=True)
    log_probs = jnp.where(child_mask[None], masked - lse, NEG_INF)
    probs = jnp.where(child_mask[None], jnp.exp(log_probs), 0.0)
    return log_probs, probs


def node_entropy(probs: jnp.ndarray, child_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-node categorical entropy in nats [B, N] (reference uses
    torch.distributions.Categorical.entropy, model.py:115-117)."""
    p = jnp.where(child_mask[None], probs, 0.0)
    plogp = jnp.where(p > 0, p * jnp.log(p), 0.0)
    return -plogp.sum(-1)


class NodeOutputs(NamedTuple):
    logits: jnp.ndarray  # [B, N, K]
    log_probs: jnp.ndarray  # [B, N, K]
    probs: jnp.ndarray  # [B, N, K]
    preds: jnp.ndarray  # [B, N] argmax child per node
    entropy: jnp.ndarray  # [B, N]


def get_all_node_outputs(logits: jnp.ndarray, jt: JTreeArrays) -> NodeOutputs:
    """All per-node outputs in one pass (reference model.py:101-123)."""
    nl = get_node_logits(logits, jt)
    log_probs, probs = masked_log_softmax(nl, jt.child_mask)
    masked_logits = jnp.where(jt.child_mask[None], nl, NEG_INF)
    preds = jnp.argmax(masked_logits, axis=-1)
    ent = node_entropy(probs, jt.child_mask)
    return NodeOutputs(nl, log_probs, probs, preds, ent)


# ---------------------------------------------------------------------------
# Soft traversal (reference model.py:206-242)
# ---------------------------------------------------------------------------


def soft_leaf_log_probs(log_probs: jnp.ndarray, jt: JTreeArrays) -> jnp.ndarray:
    """leaf_logp[b, c] = sum of chosen-child log-probs down c's path.

    Equals log of the reference's product of probabilities: every (node,
    child) pair with class c under the child contributes exactly once.

    Multi-path (DAG) quirk decision: when a class sits under TWO children
    of the SAME node, every containing slot contributes a factor here. The
    reference REJECTS such inputs outright (its traverse asserts unique
    indices before the fancy ``*=``, model.py:237-240), so this is a
    strict domain EXTENSION, not a divergence — pinned by tests/oracle.py
    and the DAG fuzzer. Trees, and DAGs whose within-node memberships stay
    disjoint (everything the reference accepts), are bit-identical.
    """
    B = log_probs.shape[0]
    N, K, C = jt.under.shape
    safe = jnp.where(jt.child_mask[None], log_probs, 0.0)  # kill -inf pads
    u2 = jt.under.reshape(N * K, C)
    return jnp.dot(
        safe.reshape(B, N * K), u2, precision=jax.lax.Precision.HIGHEST
    )  # [B, C]


def soft_forward(logits: jnp.ndarray, jt: JTreeArrays) -> jnp.ndarray:
    """Leaf distribution [B, C] — raw product of path probabilities
    (NOT normalized), matching reference SoftEmbeddedDecisionRules.forward."""
    outs = get_all_node_outputs(logits, jt)
    return jnp.exp(soft_leaf_log_probs(outs.log_probs, jt))


def soft_outputs(logits: jnp.ndarray, jt: JTreeArrays):
    """Everything the soft rule produces, for decisions/analyzers/losses."""
    outs = get_all_node_outputs(logits, jt)
    leaf_logp = soft_leaf_log_probs(outs.log_probs, jt)
    class_probs = jnp.exp(leaf_logp)
    preds = jnp.argmax(leaf_logp, axis=-1)
    return {
        "node_logits": outs.logits,
        "node_log_probs": outs.log_probs,
        "node_probs": outs.probs,
        "node_preds": outs.preds,
        "node_entropy": outs.entropy,
        "leaf_log_probs": leaf_logp,
        "class_probs": class_probs,
        "preds": preds,
    }


# ---------------------------------------------------------------------------
# Hard traversal (reference model.py:146-199)
# ---------------------------------------------------------------------------


def hard_traverse(node_preds: jnp.ndarray, jt: JTreeArrays) -> jnp.ndarray:
    """Closed-form root->leaf argmax walk. Returns predicted class [B].

    A leaf c is the hard prediction iff EVERY inner node on c's root path
    argmaxes onto c's path child — and for a tree, "(node n, child k) lies
    on c's path" is exactly "c descends from slot (n, k)", i.e. the `under`
    matrix. So one MXU matmul counts, per leaf, how many of its path steps
    the per-node argmax agrees with:

        count[b, c] = one_hot(node_preds)[b].flat @ under.flat[:, c]

    and exactly one leaf reaches its full path length (the walk's target),
    so argmax(count - path_len) is the prediction: 0 for the walked leaf,
    <= -1 elsewhere. Replaces the depth-sequential scan version (kept below
    for parity testing) — no serialized gather chain, pure matmul.

    One-hot values survive bf16 truncation exactly and the accumulation is
    f32, so this is exact at default MXU precision.

    The closed form requires each leaf's root path to be UNIQUE: on a
    multi-path (DAG) graph a multi-parent leaf's `under` slots count
    across ALL its parents, so count - path_len ties wrong leaves at -1
    and argmax can pick a leaf the greedy walk never reaches — those
    graphs dispatch to the literal walk (trace-time branch; jt is a
    closed-over constant).
    """
    if getattr(jt, "is_multipath", False):
        return hard_traverse_scan(node_preds, jt)
    B = node_preds.shape[0]
    N, K, C = jt.under.shape
    u = (jt.under.reshape(N * K, C) > 0).astype(jnp.float32)
    path_len = u.sum(axis=0)  # [C] depth of each leaf
    chosen = jax.nn.one_hot(node_preds, K, dtype=jnp.float32)  # [B, N, K]
    count = jnp.dot(chosen.reshape(B, N * K), u,
                    preferred_element_type=jnp.float32)
    return jnp.argmax(count - path_len[None], axis=-1).astype(jnp.int32)


def hard_traverse_scan(node_preds: jnp.ndarray, jt: JTreeArrays) -> jnp.ndarray:
    """Sequential reference formulation of the same walk (D gather steps via
    lax.scan; the literal transcription of reference model.py:164-185).
    Used to cross-check the closed form.

    State per sample is a cursor in [0, N + C): values < N are inner-node
    indices, values >= N encode leaf class (cursor - N).
    """
    B = node_preds.shape[0]
    N, K = jt.child_next.shape
    child_next_flat = jt.child_next.reshape(-1)  # [N*K]

    def step(cur, _):
        is_inner = cur < N
        n = jnp.clip(cur, 0, N - 1)
        k = jnp.take_along_axis(node_preds, n[:, None], axis=1)[:, 0]
        nxt = child_next_flat[n * K + k]
        return jnp.where(is_inner, nxt, cur), None

    cur0 = jnp.full((B,), jt.root_inode, dtype=jnp.int32)
    cur, _ = jax.lax.scan(step, cur0, None, length=jt.max_depth)
    return (cur - N).astype(jnp.int32)


def hard_forward(logits: jnp.ndarray, jt: JTreeArrays) -> jnp.ndarray:
    """One-hot logits of the hard prediction [B, C] (reference
    model.py:188-199: identity-row lookup)."""
    outs = get_all_node_outputs(logits, jt)
    preds = hard_traverse(outs.preds, jt)
    return jax.nn.one_hot(preds, jt.num_classes, dtype=jnp.float32)


def hard_outputs(logits: jnp.ndarray, jt: JTreeArrays):
    outs = get_all_node_outputs(logits, jt)
    preds = hard_traverse(outs.preds, jt)
    return {
        "node_logits": outs.logits,
        "node_log_probs": outs.log_probs,
        "node_probs": outs.probs,
        "node_preds": outs.preds,
        "node_entropy": outs.entropy,
        "preds": preds,
        "logits": jax.nn.one_hot(preds, jt.num_classes, dtype=jnp.float32),
    }


# ---------------------------------------------------------------------------
# Stateful wrappers with the reference's class API
# ---------------------------------------------------------------------------


class EmbeddedDecisionRules:
    """Reference-parity wrapper: construct from a Tree (or dataset paths),
    call on backbone logits. Jitted tensor core, host-side decision dicts."""

    def __init__(
        self,
        dataset: Optional[str] = None,
        path_graph: Optional[str] = None,
        path_wnids: Optional[str] = None,
        classes=(),
        hierarchy: Optional[str] = None,
        tree: Optional[Tree] = None,
    ):
        if tree is None:
            tree = Tree(
                dataset, path_graph, path_wnids, list(classes) or None,
                hierarchy=hierarchy,
            )
        self.tree = tree
        self.jt = to_device_tree(tree.arrays)

    # -- reference-API node outputs, keyed by wnid --------------------------

    def forward_nodes(self, outputs) -> Dict[str, dict]:
        """Per-inode output dicts keyed by wnid (reference model.py:122-123).

        Host-friendly: returns numpy arrays trimmed to each node's true
        child count.
        """
        outs = get_all_node_outputs(jnp.asarray(outputs), self.jt)
        logits = np.asarray(outs.logits)
        probs = np.asarray(outs.probs)
        preds = np.asarray(outs.preds)
        ent = np.asarray(outs.entropy)
        result = {}
        for i, node in enumerate(self.tree.inodes):
            k = node.num_classes
            result[node.wnid] = {
                "logits": logits[:, i, :k],
                "preds": preds[:, i],
                "probs": probs[:, i, :k],
                "entropy": ent[:, i],
            }
        return result

    def __call__(self, outputs):
        return self.forward(outputs)


class SoftEmbeddedDecisionRules(EmbeddedDecisionRules):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._forward = jax.jit(partial(soft_forward, jt=self.jt))
        self._outputs = jax.jit(partial(soft_outputs, jt=self.jt))

    def forward(self, outputs):
        """Leaf distribution [B, C] (raw path-probability product), tagged
        ``_nbdt_output_flag`` like the reference rules (model.py:272) so
        feeding it back into a tree loss raises — the stateful class API is
        the host layer; jitted pipelines use the pure ``soft_forward``."""
        from .model import TaggedOutput

        return TaggedOutput(np.asarray(self._forward(jnp.asarray(outputs))))

    def forward_with_decisions(self, outputs):
        """Returns (class_probs, decisions). Each decision is the list of
        steps down the argmax leaf's path with per-step prob/entropy.

        Unlike the reference (model.py:259 reads sample 0's probs for every
        sample), probabilities here are per-sample.
        """
        from .model import TaggedOutput

        outs = self._outputs(jnp.asarray(outputs))
        class_probs = TaggedOutput(np.asarray(outs["class_probs"]))
        preds = np.asarray(outs["preds"])
        node_probs = np.asarray(outs["node_probs"])
        node_ent = np.asarray(outs["node_entropy"])
        decisions = self._build_decisions(preds, node_probs, node_ent)
        return class_probs, decisions

    def _build_decisions(self, preds, node_probs, node_ent):
        ta = self.tree.arrays
        wnid_to_inode = {w: i for i, w in enumerate(ta.wnids_inodes)}
        leaf_to_steps = self.tree.get_leaf_to_steps()
        decisions = []
        for b, pred in enumerate(preds):
            leaf = self.tree.wnids_leaves[int(pred)]
            steps = [dict(s) for s in leaf_to_steps[leaf]]
            probs = [1.0]
            entropies = [0.0]
            for step in steps[:-1]:
                i = wnid_to_inode[step["node"].wnid]
                probs.append(float(node_probs[b, i, step["next_index"]]))
                entropies.append(float(node_ent[b, i]))
            for step, prob, entropy in zip(steps, probs, entropies):
                step["prob"] = prob
                step["entropy"] = entropy
            decisions.append(steps)
        return decisions


class HardEmbeddedDecisionRules(EmbeddedDecisionRules):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._forward = jax.jit(partial(hard_forward, jt=self.jt))
        self._outputs = jax.jit(partial(hard_outputs, jt=self.jt))

    def forward(self, outputs):
        """One-hot logits [B, C] of the greedy root->leaf walk, tagged
        ``_nbdt_output_flag`` (reference model.py:198)."""
        from .model import TaggedOutput

        return TaggedOutput(np.asarray(self._forward(jnp.asarray(outputs))))

    def forward_with_decisions(self, outputs):
        outs = self._outputs(jnp.asarray(outputs))
        preds = np.asarray(outs["preds"])
        node_probs = np.asarray(outs["node_probs"])
        node_preds = np.asarray(outs["node_preds"])
        node_ent = np.asarray(outs["node_entropy"])

        wnid_to_inode = {
            w: i for i, w in enumerate(self.tree.arrays.wnids_inodes)
        }
        decisions = []
        for b in range(preds.shape[0]):
            node = self.tree.root
            decision = [{"node": node, "name": "root", "prob": 1.0, "entropy": 0.0}]
            while not node.is_leaf():
                i = wnid_to_inode[node.wnid]
                index_child = int(node_preds[b, i])
                prob_child = float(node_probs[b, i, index_child])
                entropy = float(node_ent[b, i])
                node = node.children[index_child]
                decision.append(
                    {
                        "node": node,
                        "name": node.name,
                        "prob": prob_child,
                        "next_index": index_child,
                        "entropy": entropy,
                    }
                )
            decisions.append(decision)
        from .model import TaggedOutput

        return TaggedOutput(np.asarray(outs["logits"])), decisions
