"""ViT serving-ladder knobs (models/vit.py): every variant shares one
param tree (any checkpoint loads into any variant) and reproduces the
baseline numerics. The on-chip throughput ladder lives in
tools/probe_vit.py; these pin correctness on CPU."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def vit_setup():
    import jax
    import jax.numpy as jnp

    from nbdt_tpu.models.vit import vit_s16

    base = vit_s16(10)
    variables = base.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3)), train=False)
    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    ref = np.asarray(base.apply(variables, jnp.asarray(x), train=False))
    return variables, x, ref


@pytest.mark.parametrize("kwargs", [
    {"ln_impl": "bf16"},
    {"attention_impl": "jax"},
    {"ln_impl": "pallas", "ln_interpret": True},
    {"ln_impl": "bf16", "attention_impl": "jax"},
    {"ln_impl": "pallas", "ln_interpret": True, "attention_impl": "jax"},
])
def test_variant_matches_baseline(vit_setup, kwargs):
    """At f32 stream dtype every knob is numerics-identical (to kernel
    rounding): same params, same logits. On-chip bf16 divergence is
    separately argmax-parity-gated by tools/probe_vit.py before timing."""
    import jax.numpy as jnp

    from nbdt_tpu.models.vit import vit_s16

    variables, x, ref = vit_setup
    m = vit_s16(10, **kwargs)
    out = np.asarray(m.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_fused_layernorm_kernel_matches_flax():
    """ops/layernorm.py (interpret mode): f32 stats, affine, odd row count
    (padding path), bf16 in/out."""
    import jax.numpy as jnp

    from nbdt_tpu.ops.layernorm import fused_layernorm

    rng = np.random.RandomState(1)
    for rows, d, dtype in ((300, 128, np.float32), (257, 384, np.float32)):
        x = rng.randn(rows, d).astype(dtype)
        scale = rng.randn(d).astype(np.float32)
        bias = rng.randn(d).astype(np.float32)
        got = np.asarray(fused_layernorm(
            jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
            block_rows=128, interpret=True))
        mean = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        want = (x - mean) / np.sqrt(var + 1e-6) * scale + bias
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # bf16 stream: stats still f32 inside; output back in bf16
    xb = jnp.asarray(rng.randn(64, 128), jnp.bfloat16)
    out = fused_layernorm(xb, jnp.ones(128), jnp.zeros(128),
                          block_rows=64, interpret=True)
    assert out.dtype == jnp.bfloat16

    with pytest.raises(AssertionError, match="lane-aligned"):
        fused_layernorm(jnp.zeros((8, 100)), jnp.ones(100), jnp.zeros(100),
                        interpret=True)


def test_variants_share_param_tree(vit_setup):
    import jax

    from nbdt_tpu.models.vit import vit_s16

    variables, x, _ = vit_setup
    base_tree = jax.tree_util.tree_structure(dict(variables))
    import jax.numpy as jnp

    m = vit_s16(10, ln_impl="pallas", ln_interpret=True,
                attention_impl="jax")
    v2 = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                train=False)
    assert jax.tree_util.tree_structure(dict(v2)) == base_tree
