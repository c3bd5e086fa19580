"""bf16-backbone serving config: conv compute in bf16, NBDT head in f32.

The bench's fastest path (bench.py forward_bf16) must agree with the f32
reference path on nearly all predictions; node decisions always run in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_bf16_backbone_prediction_agreement(synthetic_tree):
    from nbdt_tpu.models import get_model, init_model
    from nbdt_tpu.rules import soft_forward, to_device_tree

    module, variables = init_model("ResNet10", 7, (16, 16, 3))
    module_bf16 = get_model("ResNet10", 7, dtype=jnp.bfloat16)
    jt = to_device_tree(synthetic_tree.arrays)

    @jax.jit
    def f32_path(x):
        return soft_forward(module.apply(variables, x, train=False), jt)

    @jax.jit
    def bf16_path(x):
        logits = module_bf16.apply(variables, x.astype(jnp.bfloat16),
                                   train=False)
        return soft_forward(logits.astype(jnp.float32), jt)

    x = np.random.RandomState(0).randn(64, 16, 16, 3).astype(np.float32)
    p32 = np.argmax(np.asarray(f32_path(x)), axis=1)
    p16 = np.argmax(np.asarray(bf16_path(x)), axis=1)
    agreement = (p32 == p16).mean()
    # random-weight logits are near-uniform (worst case for bf16 rounding);
    # trained models agree far more. Guard against gross breakage only.
    assert agreement >= 0.75, f"bf16/f32 prediction agreement {agreement:.2f}"
    # distributions stay close in L1
    d32 = np.asarray(f32_path(x))
    d16 = np.asarray(bf16_path(x))
    assert np.abs(d32 - d16).max() < 0.15
