"""ViT-B/16 in Flax — the stretch config (BASELINE.json config #5).

Standard pre-norm ViT: patch embed, learned positions, [CLS] token,
MHSA/MLP blocks, classifier named ``output`` for FC-key probing. 197 tokens
at 224px — no long-context machinery needed (SURVEY §5). bf16-friendly:
attention and MLPs run in ``dtype``; the head stays f32.

Serving knobs (the measured ladder lives in docs/PERFORMANCE.md):

- ``ln_impl``: "f32" (default — flax LayerNorm computing in f32, the
  checkpoint-exact reference path), "bf16" (LayerNorm in the stream dtype;
  cheaper VPU/HBM traffic, must be argmax-parity-checked), or "pallas"
  (ops/layernorm.py fused kernel: stats in f32, one read + one write,
  serving-only — no VJP).
- ``attention_impl``: "flax" (nn.MultiHeadDotProductAttention's einsum
  chain) or "jax" (``jax.nn.dot_product_attention`` through the same
  projection params — XLA's fused SDPA lowering, f32 softmax internally).

All knobs are numerics/layout only — parameter names and shapes are
identical across them, so any checkpoint loads into any variant.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ("ViT", "vit_b16", "vit_s16")


def _jax_sdpa(query, key, value, bias=None, mask=None, **kwargs):
    """flax attention_fn adapter for jax.nn.dot_product_attention.

    flax hands q/k/v as [B, T, H, Dh] (BTNH) — exactly jax.nn's layout.
    Softmax runs in f32 inside regardless of the stream dtype.
    """
    return jax.nn.dot_product_attention(query, key, value, bias=bias,
                                        mask=mask)


class PallasLayerNorm(nn.Module):
    """Param-compatible stand-in for nn.LayerNorm backed by the fused
    Pallas kernel (ops/layernorm.py). Same param names/shapes ("scale",
    "bias", f32), so checkpoints load interchangeably."""

    epsilon: float = 1e-6
    interpret: bool = False

    @nn.compact
    def __call__(self, x):
        from ..ops.layernorm import fused_layernorm

        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return fused_layernorm(x, scale, bias, eps=self.epsilon,
                               interpret=self.interpret)


def _make_ln(ln_impl: str, stream_dtype, interpret: bool = False):
    if ln_impl == "pallas":
        return partial(PallasLayerNorm, interpret=interpret)
    # flax LayerNorm: "f32" computes (and emits) f32 then the next op
    # casts back; "bf16" keeps the stream dtype end-to-end.
    dt = jnp.float32 if ln_impl == "f32" else stream_dtype
    return partial(nn.LayerNorm, dtype=dt, param_dtype=jnp.float32)


class Block(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32
    ln_impl: str = "f32"
    attention_impl: str = "flax"
    ln_interpret: bool = False

    @nn.compact
    def __call__(self, x):
        ln = _make_ln(self.ln_impl, self.dtype, self.ln_interpret)
        attn_kwargs = {}
        if self.attention_impl == "jax":
            attn_kwargs["attention_fn"] = _jax_sdpa
        h = ln(name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn",
            **attn_kwargs,
        )(h, h)
        x = x + h
        h = ln(name="ln2")(x)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class ViT(nn.Module):
    patch: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    num_classes: int = 1000
    dtype: Any = jnp.float32
    ln_impl: str = "f32"
    attention_impl: str = "flax"
    ln_interpret: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        B = x.shape[0]
        x = x.astype(self.dtype)
        h = nn.Conv(
            self.dim, (self.patch, self.patch),
            strides=(self.patch, self.patch), name="patch_embed",
            dtype=self.dtype,
        )(x)
        h = h.reshape(B, -1, self.dim)
        cls = self.param(
            "cls", nn.initializers.zeros, (1, 1, self.dim), jnp.float32
        ).astype(self.dtype)
        h = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), h], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, h.shape[1], self.dim), jnp.float32,
        )
        h = h + pos.astype(self.dtype)
        for i in range(self.depth):
            h = Block(dim=self.dim, heads=self.heads, dtype=self.dtype,
                      ln_impl=self.ln_impl,
                      attention_impl=self.attention_impl,
                      ln_interpret=self.ln_interpret,
                      name=f"block{i}")(h)
        ln = _make_ln(self.ln_impl, self.dtype, self.ln_interpret)
        h = ln(name="ln")(h)
        feats = h[:, 0].astype(jnp.float32)
        if features_only:
            return feats
        return nn.Dense(self.num_classes, name="output", dtype=jnp.float32)(feats)


def vit_b16(num_classes: int = 1000, dtype=jnp.float32, **kwargs) -> ViT:
    return ViT(dim=768, depth=12, heads=12, num_classes=num_classes,
               dtype=dtype, **kwargs)


def vit_s16(num_classes: int = 1000, dtype=jnp.float32, **kwargs) -> ViT:
    return ViT(dim=384, depth=12, heads=6, num_classes=num_classes,
               dtype=dtype, **kwargs)
