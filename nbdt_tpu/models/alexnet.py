"""AlexNet in Flax (torchvision topology).

The reference's model zoo star-imports all of torchvision.models
(reference models/__init__.py:1-12), so ``--arch alexnet`` is valid there;
this is the native equivalent. Five ReLU convs with interleaved 3x3/2
max-pools, a torch-semantics adaptive average pool to 6x6, and the
three-layer MLP head. Flax names mirror the torchvision Sequential
indices (``features.{i}`` -> ``f{i}``; ``classifier.{1,4}`` -> ``fc1``/
``fc2``; ``classifier.6`` -> ``classifier`` so the hierarchy-induction
probe finds the class-row matrix, reference graph.py:386-397).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ("AlexNet", "alexnet", "adaptive_avg_pool")


def adaptive_avg_pool(x, out_hw: Tuple[int, int]):
    """torch ``AdaptiveAvgPool2d`` semantics on NHWC arrays.

    Per output cell (i, j) the window is rows ``[floor(i*H/oh),
    ceil((i+1)*H/oh))`` x the analogous columns — exactly torch's bin
    edges, including the upsampling case (H < oh repeats values). Shapes
    are static so the Python loops unroll at trace time (oh*ow slices).
    """
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    rows = []
    for i in range(oh):
        h0, h1 = (i * h) // oh, -((-(i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * w) // ow, -((-(j + 1) * w) // ow)
            cols.append(x[:, h0:h1, w0:w1, :].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


class AlexNet(nn.Module):
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        del train  # no BatchNorm anywhere in AlexNet
        out = x.astype(self.dtype)
        out = nn.relu(nn.Conv(64, (11, 11), strides=(4, 4), padding=2,
                              name="f0", dtype=self.dtype)(out))
        out = nn.max_pool(out, (3, 3), strides=(2, 2))
        out = nn.relu(nn.Conv(192, (5, 5), padding=2, name="f3",
                              dtype=self.dtype)(out))
        out = nn.max_pool(out, (3, 3), strides=(2, 2))
        out = nn.relu(nn.Conv(384, (3, 3), padding=1, name="f6",
                              dtype=self.dtype)(out))
        out = nn.relu(nn.Conv(256, (3, 3), padding=1, name="f8",
                              dtype=self.dtype)(out))
        out = nn.relu(nn.Conv(256, (3, 3), padding=1, name="f10",
                              dtype=self.dtype)(out))
        out = nn.max_pool(out, (3, 3), strides=(2, 2))
        out = adaptive_avg_pool(out, (6, 6))
        # torch flattens NCHW (channel-major); transpose before reshape so
        # fc1's converted [9216, 4096] kernel sees the same column order
        n = out.shape[0]
        out = out.transpose(0, 3, 1, 2).reshape(n, -1).astype(jnp.float32)
        out = nn.relu(nn.Dense(4096, name="fc1", dtype=jnp.float32)(out))
        out = nn.relu(nn.Dense(4096, name="fc2", dtype=jnp.float32)(out))
        if features_only:
            return out
        return nn.Dense(self.num_classes, name="classifier",
                        dtype=jnp.float32)(out)


def alexnet(num_classes: int = 1000, dtype=jnp.float32) -> AlexNet:
    return AlexNet(num_classes=num_classes, dtype=dtype)
