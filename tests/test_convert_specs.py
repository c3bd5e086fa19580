"""Spec-driven checkpoint converters: EfficientNet (pytorchcv key naming)
and ViT (torchvision key naming) — the archs behind BASELINE configs #4/#5
(reference hierarchy 'induced-efficientnet_b7b' and the ViT stretch).

pytorchcv/torchvision themselves aren't installed in this image, so parity
is proven two ways: (1) the attention projection math is checked against
torch.nn.MultiheadAttention numerically (the only nontrivial transform);
(2) full state dicts round-trip flax -> torch-naming -> flax bit-exactly,
with the spec asserting completeness in both directions.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def test_vit_attention_matches_torch():
    """torch packed in_proj/out_proj -> flax per-head kernels: outputs of
    torch.nn.MultiheadAttention and flax MultiHeadDotProductAttention must
    agree on the same weights."""
    import flax.linen as nn

    from nbdt_tpu.models.convert import _spec_state_dict_to_flax

    E, H, B, T = 32, 4, 3, 5
    torch.manual_seed(0)
    mha = torch.nn.MultiheadAttention(E, H, batch_first=True)
    sd = {f"attn.{k}": v.detach().numpy() for k, v in mha.state_dict().items()}

    spec = [
        ("attn.in_proj_weight", "params", ("attn",), "qkv_w"),
        ("attn.in_proj_bias", "params", ("attn",), "qkv_b"),
        ("attn.out_proj.weight", "params", ("attn", "out", "kernel"), "outproj_w"),
        ("attn.out_proj.bias", "params", ("attn", "out", "bias"), "raw"),
    ]
    converted = _spec_state_dict_to_flax(sd, spec, heads=H)

    x = np.random.RandomState(1).randn(B, T, E).astype(np.float32)
    with torch.no_grad():
        want, _ = mha(torch.from_numpy(x), torch.from_numpy(x),
                      torch.from_numpy(x), need_weights=False)
    module = nn.MultiHeadDotProductAttention(num_heads=H)
    got = module.apply({"params": converted["params"]["attn"]},
                       jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def _roundtrip(arch, num_classes, image):
    from nbdt_tpu.models import init_model
    from nbdt_tpu.models.convert import (
        flax_to_torch_state_dict,
        torch_state_dict_to_flax,
    )

    module, variables = init_model(arch, num_classes, (image, image, 3), seed=3)
    sd = flax_to_torch_state_dict(variables, arch=arch)
    back = torch_state_dict_to_flax(sd, arch=arch)

    flat_a = jax.tree_util.tree_leaves_with_path(
        {k: variables[k] for k in variables if k in ("params", "batch_stats")}
    )
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)  # spec covers every leaf
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]),
            err_msg=jax.tree_util.keystr(path),
        )
    return module, variables, back, sd


def test_efficientnet_b0_roundtrip():
    _, _, _, sd = _roundtrip("efficientnet_b0", 11, 64)
    # pytorchcv naming spot-checks
    assert "features.init_block.conv.conv.weight" in sd
    assert "features.stage1.unit1.dw_conv.conv.weight" in sd  # DwsConvUnit
    assert "features.stage2.unit1.conv1.conv.weight" in sd  # InvResUnit
    assert "features.stage4.unit4.conv1.conv.weight" in sd  # merged stage 4+5
    assert "features.final_block.conv.weight" in sd
    assert "output.fc.weight" in sd


def test_vit_s16_roundtrip():
    _, _, _, sd = _roundtrip("vit_s16", 7, 32)
    assert "class_token" in sd
    assert "encoder.pos_embedding" in sd
    assert "encoder.layers.encoder_layer_0.self_attention.in_proj_weight" in sd
    assert "encoder.layers.encoder_layer_11.mlp.3.weight" in sd
    assert "heads.head.weight" in sd


def test_vit_converted_forward_runs():
    """Converted ViT variables drive a real forward pass identically to the
    originals (structure + dtype sanity beyond leaf equality)."""
    from nbdt_tpu.models import init_model
    from nbdt_tpu.models.convert import (
        flax_to_torch_state_dict,
        torch_state_dict_to_flax,
    )

    module, variables = init_model("vit_s16", 7, (32, 32, 3), seed=5)
    back = torch_state_dict_to_flax(
        flax_to_torch_state_dict(variables, arch="vit_s16"), arch="vit_s16"
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    a = module.apply({"params": variables["params"]}, x, train=False)
    b = module.apply({"params": back["params"]}, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_efficientnet_b7b_is_tf_mode():
    """pytorchcv's 'b' suffix = TF-ported weights; SAME padding on strided
    convs is required for checkpoint parity (asymmetric at stride 2)."""
    from nbdt_tpu.models import efficientnet_b7b, efficientnet_b7

    assert efficientnet_b7b(10).tf_mode is True
    assert efficientnet_b7(10).tf_mode is False


def test_efficientnet_b_alias_family():
    """pytorchcv's efficientnet module (star-imported by the reference)
    exposes the whole b0b..b7b TF-mode family: every alias is registered,
    tf_mode, converter-spec'd, and b0b runs a forward + induction probe."""
    import jax.numpy as jnp
    import numpy as np

    from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
    from nbdt_tpu.models import MODEL_REGISTRY, init_model
    from nbdt_tpu.models.convert import _ARCH_SPECS

    for v in range(8):
        name = f"efficientnet_b{v}b"
        assert name in MODEL_REGISTRY and name in _ARCH_SPECS, name
        assert MODEL_REGISTRY[name](10).tf_mode is True, name
    module, variables = init_model("efficientnet_b0b", 10, (64, 64, 3))
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    out = module.apply(variables, jnp.asarray(x), train=False)
    assert out.shape == (1, 10)
    centers = get_centers_from_flax_params(variables["params"])
    assert centers is not None and centers.shape == (10, 1280)


def test_spec_rejects_incomplete_and_leftover_keys():
    from nbdt_tpu.models import init_model
    from nbdt_tpu.models.convert import (
        flax_to_torch_state_dict,
        torch_state_dict_to_flax,
    )

    _, variables = init_model("vit_s16", 7, (32, 32, 3), seed=0)
    sd = flax_to_torch_state_dict(variables, arch="vit_s16")

    missing = dict(sd)
    missing.pop("heads.head.weight")
    with pytest.raises(AssertionError, match="missing"):
        torch_state_dict_to_flax(missing, arch="vit_s16")

    extra = dict(sd)
    extra["rogue.weight"] = np.zeros(3, np.float32)
    with pytest.raises(AssertionError, match="Unmapped"):
        torch_state_dict_to_flax(extra, arch="vit_s16")


def test_convert_cli_roundtrip(tmp_path):
    """The conversion CLI round-trips torch .pth <-> flax .msgpack."""
    import subprocess
    import sys

    import flax.serialization
    import jax

    from nbdt_tpu.models import init_model
    from nbdt_tpu.models.convert import flax_to_torch_state_dict

    module, variables = init_model("ResNet10", 5, (16, 16, 3), seed=9)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          flax_to_torch_state_dict(variables, arch="ResNet10").items()}
    pth = tmp_path / "in.pth"
    torch.save({"net": sd}, str(pth))

    msgpack = tmp_path / "out.msgpack"
    back_pth = tmp_path / "back.pth"
    import os

    env = dict(os.environ, NBDT_PLATFORM="cpu")
    for args in (
        [str(pth), "--arch", "ResNet10", "--out", str(msgpack)],
        [str(msgpack), "--arch", "ResNet10", "--out", str(back_pth)],
    ):
        r = subprocess.run(
            [sys.executable, "-m", "nbdt_tpu.models.convert", *args],
            capture_output=True, text=True, env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]

    final = torch.load(str(back_pth), map_location="cpu", weights_only=False)
    for k, v in sd.items():
        np.testing.assert_array_equal(v.numpy(), final["net"][k].numpy(), err_msg=k)
