"""Fused soft-NBDT head: final FC + node logits + per-node softmax +
path-sum traversal in ONE Pallas kernel.

This is the BASELINE.json north-star fusion. The reference computes, per
batch: backbone logits, then a Python loop over ~N inner nodes each doing a
stack-of-means (reference model.py:101-123), then an index-multiply walk
(model.py:226-241). Here the whole head is five MXU matmuls + VPU softmax
arithmetic over compiler-chosen tiles, entirely VMEM-resident:

    x    = feats @ W + b            [TB, C]   (backbone classifier)
    nl   = x @ M2ᵀ                  [TB, S]   (per-node child logits;
                                               M2[s, c] = mean-membership)
    per-node log-softmax over child segments, via segment-sum matmuls:
    e    = exp(nl - rowmax) ⊙ mask
    ssum = e @ Seg                  [TB, N]   (Seg one-hot: slot -> node)
    lse  = log(ssum) + rowmax
    logp = (nl - lse@Segᵀ) ⊙ mask   [TB, S]
    leaf = logp @ U                 [TB, C]   (U one-hot: slot -> descendant
                                               leaves; path-sum of log-probs)

``leaf`` is the log of the reference's product-of-probabilities leaf
distribution; argmax(leaf) is the NBDT prediction. Matmul dimensions are
padded to 128 lanes (f32 tiling, see pallas_guide "Tiling Constraints").

Numerical note: the shared per-row max (instead of per-node max) keeps the
segment reduction a matmul; a node sitting > ~85 logits below the row max
underflows its segment sum, which is clamped — only affects log-probs of
leaves that are astronomically unlikely, not argmax. The autodiff/training
path uses the exact jnp formulation in nbdt_tpu.rules instead.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..tree import TreeArrays

NEG = -1e30


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
    """Padded device constants for the fused head. Cp/Sp/Np are the padded
    class/slot/node dims (multiples of 128)."""

    W: jnp.ndarray  # [D, Cp] classifier kernel (zero-padded classes)
    b: jnp.ndarray  # [Cp]
    M2T: jnp.ndarray  # [Cp, Sp] membership, transposed for x @ M2T
    Seg: jnp.ndarray  # [Sp, Np] one-hot slot->node
    SegT: jnp.ndarray  # [Np, Sp]
    U: jnp.ndarray  # [Sp, Cp] one-hot slot->descendant-leaf
    mask: jnp.ndarray  # [1, Sp] 1.0 on valid child slots
    num_classes: int  # true C


def prepare_head_constants(
    ta: TreeArrays, fc_kernel: np.ndarray, fc_bias: Optional[np.ndarray] = None
) -> HeadConstants:
    """Build the padded constant bundle from tree arrays + classifier."""
    N, K, C = ta.membership.shape
    S = N * K
    D = fc_kernel.shape[0]
    assert fc_kernel.shape == (D, C), fc_kernel.shape

    Cp, Sp, Np = _round_up(C, 128), _round_up(S, 128), _round_up(N, 128)

    M2 = ta.membership.reshape(S, C)  # [S, C]
    U = (ta.under.reshape(S, C) > 0).astype(np.float32)
    mask = ta.child_mask.reshape(S).astype(np.float32)
    seg = np.zeros((S, N), dtype=np.float32)
    seg[np.arange(S), np.arange(S) // K] = 1.0

    W = _pad_to(np.asarray(fc_kernel, np.float32), Cp, axis=1)
    b = np.zeros(Cp, np.float32)
    if fc_bias is not None:
        b[:C] = np.asarray(fc_bias, np.float32)

    return HeadConstants(
        W=jnp.asarray(W),
        b=jnp.asarray(b),
        M2T=jnp.asarray(_pad_to(_pad_to(M2, Sp, 0), Cp, 1).T.copy()),
        Seg=jnp.asarray(_pad_to(_pad_to(seg, Sp, 0), Np, 1)),
        SegT=jnp.asarray(_pad_to(_pad_to(seg, Sp, 0), Np, 1).T.copy()),
        U=jnp.asarray(_pad_to(_pad_to(U, Sp, 0), Cp, 1)),
        mask=jnp.asarray(_pad_to(mask, Sp, 0)[None]),
        num_classes=C,
    )


def _head_kernel(feats_ref, w_ref, b_ref, m2t_ref, seg_ref, segt_ref, u_ref,
                 mask_ref, leaf_ref, logits_ref, logp_ref):
    # HIGHEST matmul precision throughout: the TPU MXU's default truncates
    # f32 inputs to bf16, which is enough to flip argmax on close node
    # decisions and break decision-path parity (measured ~1.7e-2 drift).
    hi = jax.lax.Precision.HIGHEST
    feats = feats_ref[:]
    x = jnp.dot(feats, w_ref[:], preferred_element_type=jnp.float32, precision=hi)
    x = x + b_ref[:][None, :]
    logits_ref[:] = x

    mask = mask_ref[:]
    nl = jnp.dot(x, m2t_ref[:], preferred_element_type=jnp.float32, precision=hi)
    nl = jnp.where(mask > 0, nl, NEG)

    rowmax = jnp.max(nl, axis=1, keepdims=True)
    e = jnp.exp(nl - rowmax) * mask
    ssum = jnp.dot(e, seg_ref[:], preferred_element_type=jnp.float32, precision=hi)
    lse = jnp.log(jnp.maximum(ssum, 1e-30)) + rowmax
    lse_s = jnp.dot(lse, segt_ref[:], preferred_element_type=jnp.float32,
                    precision=hi)
    logp = (nl - lse_s) * mask
    logp_ref[:] = logp
    leaf_ref[:] = jnp.dot(logp, u_ref[:], preferred_element_type=jnp.float32,
                          precision=hi)


def head_constants_bytes(hc: HeadConstants) -> int:
    """Total bytes of the VMEM-resident constant operands."""
    return sum(
        int(np.prod(a.shape)) * 4
        for a in (hc.W, hc.b, hc.M2T, hc.Seg, hc.SegT, hc.U, hc.mask)
    )


# Constants + one batch tile + intermediates must fit in ~16MB VMEM/core.
VMEM_CONSTANT_BUDGET = 10 * 1024 * 1024


def fused_soft_head(
    feats: jnp.ndarray,
    hc: HeadConstants,
    block_b: int = 256,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the fused head. feats [B, D] -> (leaf_logp [B, C], logits [B, C],
    node_logp [B, S]). B must be a multiple of 8; pads internally otherwise.

    Scale limit: all tree constants live in VMEM, which caps this kernel at
    roughly C<=256-class trees (CIFAR/TinyImagenet). Wider trees (ImageNet's
    C=1000 binary tree needs ~32MB of constants) raise ValueError — use the
    jnp rules path (nbdt_tpu.rules.soft_forward), which XLA tiles through
    HBM with near-identical throughput at that size.
    """
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    const_bytes = head_constants_bytes(hc)
    if not interpret and const_bytes > VMEM_CONSTANT_BUDGET:
        raise ValueError(
            f"fused_soft_head constants ({const_bytes / 2**20:.1f} MiB) exceed "
            f"the VMEM budget ({VMEM_CONSTANT_BUDGET / 2**20:.0f} MiB); use "
            "nbdt_tpu.rules.soft_forward for trees this wide."
        )

    B, D = feats.shape
    Cp = hc.W.shape[1]
    Sp = hc.M2T.shape[1]
    Np = hc.Seg.shape[1]

    Bp = _round_up(B, min(block_b, _round_up(B, 8)))
    Bp = _round_up(Bp, 8)
    if Bp != B:
        feats = jnp.pad(feats, ((0, Bp - B), (0, 0)))
    tb = min(block_b, Bp)
    while Bp % tb:
        tb //= 2
    grid = (Bp // tb,)

    out_shapes = (
        jax.ShapeDtypeStruct((Bp, Cp), jnp.float32),  # leaf
        jax.ShapeDtypeStruct((Bp, Cp), jnp.float32),  # logits
        jax.ShapeDtypeStruct((Bp, Sp), jnp.float32),  # node logp
    )
    row_spec = lambda width: pl.BlockSpec((tb, width), lambda i: (i, 0))
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    leaf, logits, logp = pl.pallas_call(
        _head_kernel,
        grid=grid,
        in_specs=[
            row_spec(D),
            full(hc.W.shape),
            full(hc.b.shape),
            full(hc.M2T.shape),
            full(hc.Seg.shape),
            full(hc.SegT.shape),
            full(hc.U.shape),
            full(hc.mask.shape),
        ],
        out_specs=(row_spec(Cp), row_spec(Cp), row_spec(Sp)),
        out_shape=out_shapes,
        interpret=interpret,
    )(feats, hc.W, hc.b, hc.M2T, hc.Seg, hc.SegT, hc.U, hc.mask)

    C = hc.num_classes
    return leaf[:B, :C], logits[:B, :C], logp[:B]


def make_fused_soft_head(ta: TreeArrays, fc_kernel, fc_bias=None,
                         block_b: int = 256):
    """Closure-building helper: returns jitted feats -> (leaf_logp, logits)."""
    hc = prepare_head_constants(ta, np.asarray(fc_kernel), fc_bias)

    @jax.jit
    def head(feats):
        leaf, logits, _ = fused_soft_head(feats, hc, block_b=block_b)
        return leaf, logits

    return head
