"""ViT-B/16 in Flax — the stretch config (BASELINE.json config #5).

Standard pre-norm ViT: patch embed, learned positions, [CLS] token,
MHSA/MLP blocks, classifier named ``output`` for FC-key probing. 197 tokens
at 224px — no long-context machinery needed (SURVEY §5). bf16-friendly:
attention and MLPs run in ``dtype``; layernorms and the head in f32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

__all__ = ("ViT", "vit_b16", "vit_s16")


class Block(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=jnp.float32, name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn"
        )(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x)
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
                      name=f"block{i}")(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln")(h)
        feats = h[:, 0].astype(jnp.float32)
        if features_only:
            return feats
        return nn.Dense(self.num_classes, name="output", dtype=jnp.float32)(feats)


def vit_b16(num_classes: int = 1000, dtype=jnp.float32) -> ViT:
    return ViT(dim=768, depth=12, heads=12, num_classes=num_classes, dtype=dtype)


def vit_s16(num_classes: int = 1000, dtype=jnp.float32) -> ViT:
    return ViT(dim=384, depth=12, heads=6, num_classes=num_classes, dtype=dtype)
