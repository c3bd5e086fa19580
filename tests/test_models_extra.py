"""EfficientNet / ViT backbone smoke tests (ImageNet + stretch configs)."""

import numpy as np
import pytest


def test_efficientnet_b0_shape():
    import jax.numpy as jnp

    from nbdt_tpu.models import init_model

    module, variables = init_model("efficientnet_b0", 10, (64, 64, 3))
    out = module.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 10)
    # classifier named 'output' -> center extraction works
    from nbdt_tpu.hierarchy.generate import resolve_centers

    centers = resolve_centers(params=variables["params"])
    assert centers.shape[0] == 10


def test_vit_s16_shape():
    import jax.numpy as jnp

    from nbdt_tpu.models import init_model

    module, variables = init_model("vit_s16", 10, (32, 32, 3))
    out = module.apply(variables, jnp.zeros((2, 32, 32, 3)), train=False)
    assert out.shape == (2, 10)


def test_vit_nbdt_end_to_end(rng):
    """ViT backbone through SoftNBDT — the zero-shot stretch path."""
    import jax.numpy as jnp

    from nbdt_tpu.hierarchy.build import build_induced_graph
    from nbdt_tpu.model import SoftNBDT
    from nbdt_tpu.models import init_model
    from nbdt_tpu.tree import Tree

    module, variables = init_model("vit_s16", 10, (32, 32, 3))
    from nbdt_tpu.hierarchy.generate import resolve_centers

    centers = resolve_centers(params=variables["params"])
    wnids = [f"f{i:08d}" for i in range(10)]
    G = build_induced_graph(wnids, centers)
    tree = Tree.from_graph(G, wnids)
    model = SoftNBDT(dataset=None, model=module, params=variables, tree=tree)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    out, decisions = model.forward_with_decisions(x)
    assert np.asarray(out).shape == (2, 10)
    assert len(decisions) == 2


import pytest as _pytest


@_pytest.mark.parametrize("arch,size,feat", [
    ("mobilenet_v2", 32, 1280),
    ("densenet121", 32, 1024),
    ("vgg11_bn", 32, 512),
])
def test_zoo_backbones_forward(arch, size, feat):
    """Zoo-parity backbones: logits shape, features_only dim, classifier
    head probe-able for hierarchy induction."""
    import jax.numpy as jnp
    import numpy as np

    from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
    from nbdt_tpu.models import init_model

    module, variables = init_model(arch, 10, (size, size, 3))
    x = np.random.RandomState(0).randn(2, size, size, 3).astype(np.float32)
    out = module.apply(variables, jnp.asarray(x), train=False)
    assert out.shape == (2, 10)
    feats = module.apply(variables, jnp.asarray(x), train=False,
                         features_only=True)
    assert feats.shape == (2, feat)
    centers = get_centers_from_flax_params(variables["params"])
    assert centers is not None and centers.shape == (10, feat)


def test_imagenet_stem_resnet_shapes():
    """Lowercase torchvision-style ResNets: 7x7/2 stem + maxpool halves the
    feature map twice before stage 1 (vs the CIFAR 3x3 stem)."""
    import jax.numpy as jnp

    from nbdt_tpu.models import init_model

    module, variables = init_model("resnet18", 13, (64, 64, 3))
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out = module.apply(variables, x, train=False)
    assert out.shape == (2, 13)
    feats = module.apply(variables, x, train=False, features_only=True)
    assert feats.shape == (2, 512)
    # ImageNet stem: conv1 is 7x7; CIFAR stem stays 3x3
    assert variables["params"]["conv1"]["kernel"].shape[:2] == (7, 7)

    _, cifar_vars = init_model("ResNet18", 13, (64, 64, 3))
    assert cifar_vars["params"]["conv1"]["kernel"].shape[:2] == (3, 3)


def test_torchvision_downsample_keys_convert():
    """torchvision names residual shortcuts `downsample.{0,1}` and the head
    `fc` — the converter maps both onto the Flax modules."""
    import numpy as np

    from nbdt_tpu.models import init_model
    from nbdt_tpu.models.convert import (
        flax_to_torch_state_dict,
        torch_state_dict_to_flax,
    )

    module, variables = init_model("resnet18", 13, (64, 64, 3), seed=2)
    sd = flax_to_torch_state_dict(variables, arch="resnet18")
    # rename to torchvision conventions
    tv = {}
    for k, v in sd.items():
        k = k.replace("shortcut.0", "downsample.0")
        k = k.replace("shortcut.1", "downsample.1")
        k = k.replace("linear.", "fc.")
        tv[k] = v
    back = torch_state_dict_to_flax(tv, arch="resnet18")
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["layer2_0"]["shortcut_conv"]["kernel"]),
        np.asarray(back["params"]["layer2_0"]["shortcut_conv"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["linear"]["kernel"]),
        np.asarray(back["params"]["linear"]["kernel"]),
    )


def test_resnet152_constructible():
    """resnet152 (reference README's torchvision zoo example) is registered
    and produces the Bottleneck feature width."""
    import jax.numpy as jnp

    from nbdt_tpu.models import get_model_choices, init_model

    assert "resnet152" in get_model_choices()
    module, variables = init_model("resnet152", 7, (64, 64, 3))
    feats = module.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False,
                         features_only=True)
    assert feats.shape == (1, 2048)


def test_register_custom_model_end_to_end():
    """A user-registered arch (the reference's --arch=yournet18 flow) works
    through the registry, hierarchy induction, and SoftNBDT."""
    import flax.linen as nn
    import jax.numpy as jnp

    from nbdt_tpu.hierarchy.build import build_induced_graph
    from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
    from nbdt_tpu.model import SoftNBDT
    from nbdt_tpu.models import MODEL_REGISTRY, init_model, register_model
    from nbdt_tpu.tree import Tree

    class YourNet(nn.Module):
        num_classes: int = 10
        dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x, train=False, features_only=False):
            feats = nn.Dense(32, name="stem")(x.reshape(x.shape[0], -1))
            feats = nn.relu(feats)
            if features_only:
                return feats
            return nn.Dense(self.num_classes, name="linear")(feats)

    @register_model("yournet18")
    def yournet18(num_classes=10, dtype=jnp.float32):
        return YourNet(num_classes=num_classes, dtype=dtype)

    try:
        module, variables = init_model("yournet18", 6, (8, 8, 3))
        centers = get_centers_from_flax_params(variables["params"])
        wnids = [f"f{i:08d}" for i in range(6)]
        G = build_induced_graph(wnids, centers)
        tree = Tree.from_graph(G, wnids)
        model = SoftNBDT(dataset=None, model=module, params=variables,
                         tree=tree)
        x = np.random.RandomState(0).randn(2, 8, 8, 3).astype(np.float32)
        out, decisions = model.forward_with_decisions(x)
        assert np.asarray(out).shape == (2, 6)
        assert len(decisions) == 2
    finally:
        MODEL_REGISTRY.pop("yournet18", None)


def test_register_model_collision_guarded():
    """Re-registering an existing arch raises unless override=True."""
    import pytest as pt

    from nbdt_tpu.models import MODEL_REGISTRY, register_model

    with pt.raises(ValueError, match="already registered"):
        register_model("ResNet18", lambda **kw: None)
    # override works and is restored
    orig = MODEL_REGISTRY["ResNet18"]
    try:
        register_model("ResNet18", orig, override=True)
        assert MODEL_REGISTRY["ResNet18"] is orig
    finally:
        MODEL_REGISTRY["ResNet18"] = orig


def test_nbdt_loads_msgpack_checkpoint(tmp_path):
    """SoftNBDT(checkpoint_path=*.msgpack) loads this repo's own checkpoint
    format (Trainer.save / convert CLI payloads), not just torch .pth."""
    import flax.serialization
    import jax.numpy as jnp

    from nbdt_tpu.model import SoftNBDT
    from nbdt_tpu.models import init_model

    module, variables = init_model("ResNet10", 10, (16, 16, 3), seed=3)
    path = str(tmp_path / "ckpt.msgpack")
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}))

    model = SoftNBDT(dataset="CIFAR10", model=module, arch="ResNet10",
                     hierarchy="induced-ResNet10", pretrained=True,
                     checkpoint_path=path)
    x = np.random.RandomState(0).randn(2, 16, 16, 3).astype(np.float32)
    out = np.asarray(model(x))
    assert out.shape == (2, 10)
    assert np.isfinite(out).all()
