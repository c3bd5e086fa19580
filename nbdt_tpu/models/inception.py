"""Inception v3 in Flax (torchvision topology).

Zoo-parity backbone: the reference star-imports torchvision.models
(reference models/__init__.py:1-12), which includes ``inception_v3``.
Flax module names mirror the torch attribute paths exactly
(``Mixed_5b.branch5x5_1`` etc.) so the converter is a pure string
rewrite. One deliberate deviation (eval-exact): the train-only
``AuxLogits`` head is not built (the converter skips its keys).
``transform_input`` is a real model option (default False, matching the
torchvision constructor); torchvision's *pretrained* loader forces it
True, so pass ``transform_input=True`` for converted reference
checkpoints — the converter warns about this.
Asymmetric 1x7/7x1 convs keep the MXU busy with contiguous lane tiling —
XLA handles them natively, no kernel splitting needed.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .googlenet import BasicConv2d, transform_input_rescale

__all__ = ("InceptionV3", "inception_v3")


def _conv(features, kh, kw, ph, pw, strides=(1, 1), name=None, dtype=jnp.float32):
    return BasicConv2d(features, (kh, kw), strides=strides,
                       padding=((ph, ph), (pw, pw)), name=name, dtype=dtype)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b1 = _conv(64, 1, 1, 0, 0, name="branch1x1", dtype=d)(x, train)
        b5 = _conv(48, 1, 1, 0, 0, name="branch5x5_1", dtype=d)(x, train)
        b5 = _conv(64, 5, 5, 2, 2, name="branch5x5_2", dtype=d)(b5, train)
        b3 = _conv(64, 1, 1, 0, 0, name="branch3x3dbl_1", dtype=d)(x, train)
        b3 = _conv(96, 3, 3, 1, 1, name="branch3x3dbl_2", dtype=d)(b3, train)
        b3 = _conv(96, 3, 3, 1, 1, name="branch3x3dbl_3", dtype=d)(b3, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = _conv(self.pool_features, 1, 1, 0, 0,
                   name="branch_pool", dtype=d)(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b3 = _conv(384, 3, 3, 0, 0, strides=(2, 2),
                   name="branch3x3", dtype=d)(x, train)
        bd = _conv(64, 1, 1, 0, 0, name="branch3x3dbl_1", dtype=d)(x, train)
        bd = _conv(96, 3, 3, 1, 1, name="branch3x3dbl_2", dtype=d)(bd, train)
        bd = _conv(96, 3, 3, 0, 0, strides=(2, 2),
                   name="branch3x3dbl_3", dtype=d)(bd, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))  # floor mode
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, c7 = self.dtype, self.channels_7x7
        b1 = _conv(192, 1, 1, 0, 0, name="branch1x1", dtype=d)(x, train)
        b7 = _conv(c7, 1, 1, 0, 0, name="branch7x7_1", dtype=d)(x, train)
        b7 = _conv(c7, 1, 7, 0, 3, name="branch7x7_2", dtype=d)(b7, train)
        b7 = _conv(192, 7, 1, 3, 0, name="branch7x7_3", dtype=d)(b7, train)
        bd = _conv(c7, 1, 1, 0, 0, name="branch7x7dbl_1", dtype=d)(x, train)
        bd = _conv(c7, 7, 1, 3, 0, name="branch7x7dbl_2", dtype=d)(bd, train)
        bd = _conv(c7, 1, 7, 0, 3, name="branch7x7dbl_3", dtype=d)(bd, train)
        bd = _conv(c7, 7, 1, 3, 0, name="branch7x7dbl_4", dtype=d)(bd, train)
        bd = _conv(192, 1, 7, 0, 3, name="branch7x7dbl_5", dtype=d)(bd, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = _conv(192, 1, 1, 0, 0, name="branch_pool", dtype=d)(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b3 = _conv(192, 1, 1, 0, 0, name="branch3x3_1", dtype=d)(x, train)
        b3 = _conv(320, 3, 3, 0, 0, strides=(2, 2),
                   name="branch3x3_2", dtype=d)(b3, train)
        b7 = _conv(192, 1, 1, 0, 0, name="branch7x7x3_1", dtype=d)(x, train)
        b7 = _conv(192, 1, 7, 0, 3, name="branch7x7x3_2", dtype=d)(b7, train)
        b7 = _conv(192, 7, 1, 3, 0, name="branch7x7x3_3", dtype=d)(b7, train)
        b7 = _conv(192, 3, 3, 0, 0, strides=(2, 2),
                   name="branch7x7x3_4", dtype=d)(b7, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b1 = _conv(320, 1, 1, 0, 0, name="branch1x1", dtype=d)(x, train)
        b3 = _conv(384, 1, 1, 0, 0, name="branch3x3_1", dtype=d)(x, train)
        b3 = jnp.concatenate([
            _conv(384, 1, 3, 0, 1, name="branch3x3_2a", dtype=d)(b3, train),
            _conv(384, 3, 1, 1, 0, name="branch3x3_2b", dtype=d)(b3, train),
        ], axis=-1)
        bd = _conv(448, 1, 1, 0, 0, name="branch3x3dbl_1", dtype=d)(x, train)
        bd = _conv(384, 3, 3, 1, 1, name="branch3x3dbl_2", dtype=d)(bd, train)
        bd = jnp.concatenate([
            _conv(384, 1, 3, 0, 1, name="branch3x3dbl_3a", dtype=d)(bd, train),
            _conv(384, 3, 1, 1, 0, name="branch3x3dbl_3b", dtype=d)(bd, train),
        ], axis=-1)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = _conv(192, 1, 1, 0, 0, name="branch_pool", dtype=d)(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    num_classes: int = 1000
    dtype: Any = jnp.float32
    # torchvision forces this True when pretrained=True; converted
    # reference checkpoints need it to reproduce logits
    transform_input: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        if self.transform_input:
            x = transform_input_rescale(x)
        d = self.dtype
        out = x.astype(d)
        out = _conv(32, 3, 3, 0, 0, strides=(2, 2),
                    name="Conv2d_1a_3x3", dtype=d)(out, train)
        out = _conv(32, 3, 3, 0, 0, name="Conv2d_2a_3x3", dtype=d)(out, train)
        out = _conv(64, 3, 3, 1, 1, name="Conv2d_2b_3x3", dtype=d)(out, train)
        out = nn.max_pool(out, (3, 3), strides=(2, 2))
        out = _conv(80, 1, 1, 0, 0, name="Conv2d_3b_1x1", dtype=d)(out, train)
        out = _conv(192, 3, 3, 0, 0, name="Conv2d_4a_3x3", dtype=d)(out, train)
        out = nn.max_pool(out, (3, 3), strides=(2, 2))
        out = InceptionA(32, name="Mixed_5b", dtype=d)(out, train)
        out = InceptionA(64, name="Mixed_5c", dtype=d)(out, train)
        out = InceptionA(64, name="Mixed_5d", dtype=d)(out, train)
        out = InceptionB(name="Mixed_6a", dtype=d)(out, train)
        out = InceptionC(128, name="Mixed_6b", dtype=d)(out, train)
        out = InceptionC(160, name="Mixed_6c", dtype=d)(out, train)
        out = InceptionC(160, name="Mixed_6d", dtype=d)(out, train)
        out = InceptionC(192, name="Mixed_6e", dtype=d)(out, train)
        out = InceptionD(name="Mixed_7a", dtype=d)(out, train)
        out = InceptionE(name="Mixed_7b", dtype=d)(out, train)
        out = InceptionE(name="Mixed_7c", dtype=d)(out, train)
        out = out.mean(axis=(1, 2)).astype(jnp.float32)  # AdaptiveAvgPool 1x1
        if features_only:
            return out
        # eval-mode Dropout is the identity
        return nn.Dense(self.num_classes, name="fc", dtype=jnp.float32)(out)


def inception_v3(num_classes: int = 1000, dtype=jnp.float32,
                 transform_input: bool = False) -> InceptionV3:
    return InceptionV3(num_classes=num_classes, dtype=dtype,
                       transform_input=transform_input)
