"""Fused soft-NBDT head: final FC + node logits + per-node softmax +
path-sum traversal in ONE Pallas kernel.

This is the BASELINE.json north-star fusion. The reference computes, per
batch: backbone logits, then a Python loop over ~N inner nodes each doing a
stack-of-means (reference model.py:101-123), then an index-multiply walk
(model.py:226-241). Here the whole head runs in one kernel, per batch tile:

    x    = feats @ W + b                 [TB, Cp]  (backbone classifier, MXU)
    nl   = x @ M2T                       [TB, K*cn] (per-node child logits)
    per-node log-softmax as CHILD-SLAB arithmetic (VPU): slots are laid out
    child-major — slab k holds every node's k-th child — so the softmax over
    a node's children is an elementwise max/exp/sum across K row-slices, no
    segment matmuls and no shared-row-max approximation (exact per node).
    leaf = Σ_chunks logp @ U             [TB, Cp]  (path-sum of log-probs)

``leaf`` is the log of the reference's product-of-probabilities leaf
distribution; argmax(leaf) is the NBDT prediction.

Design notes (round 2; round 1's kernel lost to plain XLA):
  * The classifier matmul runs at DEFAULT precision — exactly what the
    backbone's own Dense layer does in the jnp path. Only the node-decision
    matmuls (nl, leaf) use HIGHEST: the MXU default truncates f32 inputs to
    bf16, which measurably flips argmax on close node decisions (CLAUDE.md
    invariant).
  * Round 1 reduced per-node softmax with one-hot Seg/SegT MXU matmuls and a
    shared per-row max; the slab layout replaces both with VPU ops and is
    exact.
  * Wide trees no longer hit a VMEM wall: the grid is (batch tiles x node
    chunks) — tree constants stream through VMEM chunk by chunk (Pallas
    double-buffers block fetches), the classifier activation persists in a
    VMEM scratch across chunks, and the leaf tile accumulates in place. An
    Imagenet1000 binary tree (~18 MiB of constants) runs in 4 chunks.
  * ``feats``/``W`` may be bf16 (the serving backbone dtype): the classifier
    matmul then takes the bf16 MXU fast path with f32 accumulation, and all
    node decisions stay f32.

The autodiff/training path uses the exact jnp formulation in nbdt_tpu.rules.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tree import TreeArrays

NEG = -1e30

# Per-chunk VMEM footprint target for the streamed tree constants. Pallas
# double-buffers every input block (W included), and the batch tile,
# classifier scratch, leaf tile, and intermediates all share the ~16 MiB of
# scoped VMEM — so the streamed chunks get a 2 MiB slice.
VMEM_CHUNK_BUDGET = 2 * 1024 * 1024


def _pad_to(x: np.ndarray, size: int, axis: int, value=0.0) -> np.ndarray:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=value)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class HeadConstants(NamedTuple):
    """Padded device constants, child-slab (k-major) layout. Cp/Np are the
    padded class/node dims (multiples of 128); K is the true max children."""

    W: jnp.ndarray  # [D, Cp] classifier kernel (zero-padded classes)
    b: jnp.ndarray  # [1, Cp]
    M2T: jnp.ndarray  # [Cp, K, Np]  M2T[c, k, n] = membership[n, k, c]
    U: jnp.ndarray  # [K, Np, Cp]  1.0 where class c descends from slot (n,k)
    mask: jnp.ndarray  # [K, Np] 1.0 on valid child slots
    num_classes: int  # true C
    num_nodes: int  # true N


def prepare_head_constants(
    ta: TreeArrays,
    fc_kernel: np.ndarray,
    fc_bias: Optional[np.ndarray] = None,
    dtype=jnp.float32,
) -> HeadConstants:
    """Build the padded constant bundle from tree arrays + classifier.

    ``dtype`` applies to the classifier (W/b) only — pass bf16 to match a
    bf16 backbone; the tree constants stay f32 (node-decision precision).
    """
    N, K, C = ta.membership.shape
    D = fc_kernel.shape[0]
    assert fc_kernel.shape == (D, C), fc_kernel.shape

    Cp, Np = _round_up(C, 128), _round_up(N, 128)

    m2t = np.zeros((Cp, K, Np), np.float32)
    m2t[:C, :, :N] = ta.membership.transpose(2, 1, 0)
    u = np.zeros((K, Np, Cp), np.float32)
    u[:, :N, :C] = (ta.under.transpose(1, 0, 2) > 0).astype(np.float32)
    mask = np.zeros((K, Np), np.float32)
    mask[:, :N] = ta.child_mask.T.astype(np.float32)

    W = _pad_to(np.asarray(fc_kernel, np.float32), Cp, axis=1)
    b = np.zeros((1, Cp), np.float32)
    if fc_bias is not None:
        b[0, :C] = np.asarray(fc_bias, np.float32)

    return HeadConstants(
        W=jnp.asarray(W, dtype),
        b=jnp.asarray(b),
        M2T=jnp.asarray(m2t),
        U=jnp.asarray(u),
        mask=jnp.asarray(mask),
        num_classes=C,
        num_nodes=N,
    )


def head_constants_bytes(hc: HeadConstants) -> int:
    return sum(
        int(np.prod(a.shape)) * a.dtype.itemsize
        for a in (hc.W, hc.b, hc.M2T, hc.U, hc.mask)
    )


def _pick_chunk(Np: int, K: int, Cp: int) -> int:
    """Largest node-chunk that divides Np, stays a multiple of 128 (lane
    width), and whose streamed constants fit the per-chunk budget:
    M2T chunk [Cp, K, cn] + U chunk [K, cn, Cp], f32. Falls back to the
    minimum 128-node chunk; _vmem_bytes then shrinks the batch tile."""
    for q in range(1, Np // 128 + 1):
        if Np % q:
            continue
        cn = Np // q
        if cn % 128:
            continue
        if 2 * Cp * K * cn * 4 <= VMEM_CHUNK_BUDGET:
            return cn
    return 128


def _vmem_bytes(tb: int, D: int, Cp: int, K: int, cn: int,
                want_aux: bool, w_itemsize: int = 4) -> int:
    """Estimated scoped-VMEM footprint of one kernel invocation: inputs and
    outputs are double-buffered by the Pallas pipeline; the classifier
    scratch and the nl/logp working set are single. feats/W are counted at
    the classifier dtype's width (bf16 halves them — decisive for wide
    feature dims like EfficientNet's 1280); everything else is f32."""
    ins_w = (tb * D + D * Cp) * w_itemsize
    ins_f32 = (Cp + Cp * K * cn + K * cn * Cp + K * cn) * 4
    outs = (tb * Cp + ((tb * Cp + tb * K * cn) if want_aux else 0)) * 4
    scratch = tb * Cp * 4
    work = 3 * tb * K * cn * 4  # nl / masked / logp live simultaneously
    return 2 * (ins_w + ins_f32) + 2 * outs + scratch + work


# Target for the whole kernel's scoped VMEM (the hardware limit is ~16 MiB;
# leave headroom for Mosaic's own temporaries).
VMEM_TOTAL_BUDGET = 13 * 1024 * 1024


def _head_kernel(feats_ref, w_ref, b_ref, m2t_ref, u_ref, mask_ref,
                 leaf_ref, *rest, want_aux: bool):
    if want_aux:
        logits_ref, logp_ref, x_ref = rest
    else:
        x_ref = rest[0]
    j = pl.program_id(1)

    hi = jax.lax.Precision.HIGHEST

    @pl.when(j == 0)
    def _():
        # Classifier at DEFAULT precision — identical to the backbone's own
        # Dense in the jnp path (bf16 inputs take the MXU fast path).
        x = jnp.dot(feats_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        x_ref[:] = x + b_ref[:]
        leaf_ref[:] = jnp.zeros_like(leaf_ref)
        if want_aux:
            logits_ref[:] = x_ref[:]

    x = x_ref[:]  # [TB, Cp] f32, persists across node chunks
    m2t = m2t_ref[:]  # [Cp, K, cn]
    Cp, K, cn = m2t.shape
    tb = x.shape[0]

    # Node-decision matmuls at HIGHEST: bf16 truncation flips close argmax.
    nl = jnp.dot(x, m2t.reshape(Cp, K * cn), precision=hi,
                 preferred_element_type=jnp.float32)
    nl3 = nl.reshape(tb, K, cn)
    mask = mask_ref[:][None] > 0  # [1, K, cn]

    # Exact per-node log-softmax via child-slab arithmetic (VPU only).
    masked = jnp.where(mask, nl3, NEG)
    m = jnp.max(masked, axis=1, keepdims=True)  # [tb, 1, cn]
    m = jnp.where(m > NEG / 2, m, 0.0)  # all-padded node columns
    e = jnp.where(mask, jnp.exp(nl3 - m), 0.0)
    lse = jnp.log(jnp.maximum(e.sum(axis=1, keepdims=True), 1e-30)) + m
    logp = jnp.where(mask, nl3 - lse, 0.0)  # zero pads: inert in the U matmul

    if want_aux:
        logp_ref[:] = jnp.where(mask, logp, NEG)

    u = u_ref[:]  # [K, cn, Cp]
    leaf_ref[:] += jnp.dot(logp.reshape(tb, K * cn), u.reshape(K * cn, Cp),
                           precision=hi, preferred_element_type=jnp.float32)


def fused_soft_head(
    feats: jnp.ndarray,
    hc: HeadConstants,
    block_b: int = 512,
    interpret: Optional[bool] = None,
    want_aux: bool = True,
) -> Tuple[jnp.ndarray, ...]:
    """Run the fused head. feats [B, D] -> (leaf_logp [B, C][, logits [B, C],
    node_logp [B, S]]) with S = N*K in node-major slot order (matching
    rules.get_all_node_outputs). ``want_aux=False`` returns only the leaf
    distribution and skips the logits/log-prob HBM writes (serving path).

    Any tree width: constants stream through VMEM in node chunks, so
    Imagenet1000-scale trees run in the same kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B, D = feats.shape
    Cp = hc.W.shape[1]
    K, Np = hc.mask.shape
    N, C = hc.num_nodes, hc.num_classes

    cn = _pick_chunk(Np, K, Cp)
    # Shrink the batch tile until the whole invocation fits scoped VMEM
    # (wide-C trees stream chunks; wide-K trees inflate the slab working
    # set — both are paid for out of the batch tile).
    w_itemsize = jnp.dtype(hc.W.dtype).itemsize
    while (block_b > 8
           and _vmem_bytes(block_b, D, Cp, K, cn, want_aux, w_itemsize)
           > VMEM_TOTAL_BUDGET):
        block_b //= 2
    if _vmem_bytes(block_b, D, Cp, K, cn, want_aux, w_itemsize) > VMEM_TOTAL_BUDGET:
        raise ValueError(
            f"fused_soft_head cannot fit VMEM even at batch tile {block_b} "
            f"(D={D}, Cp={Cp}, K={K}, cn={cn}); use the jnp rules path "
            "(nbdt_tpu.rules.soft_forward) for this tree."
        )
    # Pad the batch only to the 8-row f32 sublane tile, then pick the batch
    # tile as the LARGEST divisor of Bp that fits the block budget and is
    # itself a sublane multiple. The earlier scheme rounded B up to a
    # multiple of block_b, which nearly doubles the kernel's work for
    # batches just above a tile multiple (B=520, block_b=512 -> 1024 padded
    # rows); it also let halving drive tb below 8 for non-power-of-2 tiles.
    Bp = _round_up(B, 8)
    if Bp != B:
        feats = jnp.pad(feats, ((0, Bp - B), (0, 0)))
    block_b = max(8, block_b)  # sublane floor (caller may pass smaller)
    tb = max(d for d in range(8, block_b + 1, 8) if Bp % d == 0)
    grid = (Bp // tb, Np // cn)

    if feats.dtype != hc.W.dtype:
        feats = feats.astype(hc.W.dtype)

    row = lambda width: pl.BlockSpec((tb, width), lambda i, j: (i, 0))
    out_shapes = [jax.ShapeDtypeStruct((Bp, Cp), jnp.float32)]
    out_specs = [row(Cp)]
    if want_aux:
        out_shapes += [
            jax.ShapeDtypeStruct((Bp, Cp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, K, Np), jnp.float32),
        ]
        out_specs += [
            row(Cp),
            pl.BlockSpec((tb, K, cn), lambda i, j: (i, 0, j)),
        ]

    outs = pl.pallas_call(
        partial(_head_kernel, want_aux=want_aux),
        grid=grid,
        in_specs=[
            row(D),
            pl.BlockSpec((D, Cp), lambda i, j: (0, 0)),
            pl.BlockSpec((1, Cp), lambda i, j: (0, 0)),
            pl.BlockSpec((Cp, K, cn), lambda i, j: (0, 0, j)),
            pl.BlockSpec((K, cn, Cp), lambda i, j: (0, j, 0)),
            pl.BlockSpec((K, cn), lambda i, j: (0, j)),
        ],
        out_specs=tuple(out_specs) if want_aux else out_specs[0],
        out_shape=tuple(out_shapes) if want_aux else out_shapes[0],
        scratch_shapes=[pltpu.VMEM((tb, Cp), jnp.float32)],
        interpret=interpret,
    )(feats, hc.W, hc.b, hc.M2T, hc.U, hc.mask)

    if not want_aux:
        return (outs[:B, :C],)
    leaf, logits, logp = outs
    # [B, K, Np] child-slab -> node-major [B, N*K] (the rules layout).
    logp = logp[:B, :, :N].transpose(0, 2, 1).reshape(B, N * K)
    return leaf[:B, :C], logits[:B, :C], logp


def make_fused_soft_head(ta: TreeArrays, fc_kernel, fc_bias=None,
                         block_b: int = 512):
    """Closure-building helper: returns jitted feats -> (leaf_logp, logits)."""
    hc = prepare_head_constants(ta, np.asarray(fc_kernel), fc_bias)

    @jax.jit
    def head(feats):
        leaf, logits, _ = fused_soft_head(feats, hc, block_b=block_b)
        return leaf, logits

    return head
