"""Fused LayerNorm Pallas kernel (serving path).

One VMEM-resident pass per row block: mean/variance/normalize/affine in
f32 regardless of the input dtype, output cast back to the input dtype.
Built for the ViT serving ladder (docs/PERFORMANCE.md): the jnp f32
LayerNorm on a bf16 stream costs two dtype round-trips through HBM when
XLA fails to fuse them into the adjacent matmuls; this kernel pins the
whole op to one read + one write.

Forward-only (no custom VJP) — it is a serving optimization; training
keeps the flax LayerNorm. Shapes: x [..., D] with D padded to the lane
width by the caller contract (768/384 for the ViT configs — already
multiples of 128).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, scale_ref, bias_ref, out_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    normed = centered * jax.lax.rsqrt(var + eps)
    out = normed * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(
        jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)


def fused_layernorm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                    eps: float = 1e-6, block_rows: int = 256,
                    interpret: bool = False) -> jnp.ndarray:
    """LayerNorm over the last axis; stats in f32, output in x.dtype."""
    orig_shape = x.shape
    d = orig_shape[-1]
    assert d % 128 == 0, f"feature dim {d} must be lane-aligned (128)"
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    padded = ((rows + block_rows - 1) // block_rows) * block_rows
    if padded != rows:
        x2 = jnp.pad(x2, ((0, padded - rows), (0, 0)))
    grid = (padded // block_rows,)
    out = pl.pallas_call(
        lambda x_ref, s_ref, b_ref, o_ref: _ln_kernel(
            x_ref, s_ref, b_ref, o_ref, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, d), x.dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, d), bias.reshape(1, d))
    return out[:rows].reshape(orig_shape)
