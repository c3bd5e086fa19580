"""Backbone tests: shapes, converter round-trip, torch numerical parity."""

import numpy as np
import pytest


def test_resnet18_forward_shape():
    import jax.numpy as jnp

    from nbdt_tpu.models import init_model

    module, variables = init_model("ResNet18", 10, (32, 32, 3))
    out = module.apply(variables, jnp.zeros((2, 32, 32, 3)), train=False)
    assert out.shape == (2, 10)


def test_resnet18_train_mode_updates_stats():
    import jax
    import jax.numpy as jnp

    from nbdt_tpu.models import init_model

    module, variables = init_model("ResNet18", 10, (32, 32, 3))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    out, new_state = module.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert out.shape == (4, 10)
    old = variables["batch_stats"]["bn1"]["mean"]
    new = new_state["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_wrn_forward_shape():
    import jax.numpy as jnp

    from nbdt_tpu.models import init_model

    module, variables = init_model("wrn28_10_cifar10", 10, (32, 32, 3))
    out = module.apply(variables, jnp.zeros((2, 32, 32, 3)), train=False)
    assert out.shape == (2, 10)
    # 64x64 input works too (global pool; reference wideresnet.py:28-40)
    out = module.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 10)


def _torch_resnet18(num_classes=10):
    """The reference's OWN torch ResNet18 (nbdt/models/resnet.py:115-157),
    imported from /root/reference — converter parity is checked against the
    genuine article, not a transcription."""
    import os

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not mounted")
    import ref_stubs  # noqa: F401  (import shims + sys.path)
    from nbdt.models.resnet import ResNet18 as RefResNet18

    return RefResNet18(num_classes=num_classes)


def test_torch_to_flax_parity():
    """The reference's own torch ResNet18 weights produce the same logits in
    Flax after conversion (eval mode)."""
    torch = pytest.importorskip("torch")

    import jax.numpy as jnp

    from nbdt_tpu.models import get_model
    from nbdt_tpu.models.convert import torch_state_dict_to_flax

    tmodel = _torch_resnet18()
    tmodel.eval()
    # randomize BN stats so eval-mode parity actually exercises them
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    state_dict = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = torch_state_dict_to_flax(state_dict, arch="ResNet18")

    module = get_model("ResNet18", 10)
    x = np.random.RandomState(0).randn(4, 32, 32, 3).astype(np.float32)
    ours = np.asarray(module.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_flax_to_torch_roundtrip():
    from nbdt_tpu.models import init_model
    from nbdt_tpu.models.convert import (
        flax_to_torch_state_dict,
        torch_state_dict_to_flax,
    )

    module, variables = init_model("ResNet18", 10, (32, 32, 3))
    sd = flax_to_torch_state_dict(variables, arch="ResNet18")
    assert "linear.weight" in sd and sd["linear.weight"].shape == (10, 512)
    back = torch_state_dict_to_flax(sd, arch="ResNet18")
    np.testing.assert_allclose(
        np.asarray(variables["params"]["linear"]["kernel"]),
        back["params"]["linear"]["kernel"],
    )
    np.testing.assert_allclose(
        np.asarray(variables["params"]["layer4_1"]["conv2"]["kernel"]),
        back["params"]["layer4_1"]["conv2"]["kernel"],
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["layer2_0"]["shortcut_bn"]["var"]),
        back["batch_stats"]["layer2_0"]["shortcut_bn"]["var"],
    )


def test_centers_from_flax_params():
    from nbdt_tpu.hierarchy.generate import resolve_centers
    from nbdt_tpu.models import init_model

    module, variables = init_model("ResNet18", 10, (32, 32, 3))
    centers = resolve_centers(params=variables["params"])
    assert centers.shape == (10, 512)


def _torch_wrn28_10(num_classes=10):
    """pytorchcv-CIFARWRN-topology torch WRN-28-10 with pytorchcv key names,
    for converter + topology parity (reference wideresnet.py re-exports
    pytorchcv's model; graph.py:392 probes its 'output.weight' head)."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    import torch.nn.functional as F

    class PreConvBlock(nn.Module):  # bn -> relu -> conv3x3
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.bn = nn.BatchNorm2d(cin)
            self.conv = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)

        def forward(self, x):
            pre = F.relu(self.bn(x))
            return self.conv(pre), pre

    class Body(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = PreConvBlock(cin, cout, stride)
            self.conv2 = PreConvBlock(cout, cout, 1)

        def forward(self, x):
            out, pre = self.conv1(x)
            out, _ = self.conv2(out)
            return out, pre

    class Unit(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.resize = stride != 1 or cin != cout
            self.body = Body(cin, cout, stride)
            if self.resize:
                self.identity_conv = nn.Conv2d(cin, cout, 1, stride, bias=False)

        def forward(self, x):
            out, pre = self.body(x)
            identity = self.identity_conv(pre) if self.resize else x
            return out + identity

    class PostActiv(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.bn = nn.BatchNorm2d(c)

        def forward(self, x):
            return F.relu(self.bn(x))

    class Features(nn.Module):
        def __init__(self):
            super().__init__()
            self.init_block = nn.Conv2d(3, 16, 3, 1, 1, bias=False)
            cin = 16
            for stage, (w, stride) in enumerate(
                zip((160, 320, 640), (1, 2, 2)), start=1
            ):
                units = nn.Sequential()
                for u in range(4):
                    units.add_module(
                        f"unit{u + 1}", Unit(cin, w, stride if u == 0 else 1)
                    )
                    cin = w
                self.add_module(f"stage{stage}", units)
            self.post_activ = PostActiv(640)

        def forward(self, x):
            x = self.init_block(x)
            x = self.stage1(x)
            x = self.stage2(x)
            x = self.stage3(x)
            return self.post_activ(x)

    class TorchWRN(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = Features()
            self.output = nn.Linear(640, num_classes)

        def forward(self, x):
            x = self.features(x)
            x = F.adaptive_avg_pool2d(x, 1).flatten(1)
            return self.output(x)

    return TorchWRN()


def test_wrn_key_contract_fixture():
    """Three-way WRN-28-10 topology contract (VERDICT: the reference's
    headline checkpoints are pytorchcv-keyed and pytorchcv is not installed
    here, so drift would misload silently without this pin):

    fixture (first-principles enumeration of pytorchcv wrn_cifar.py +
    preresnet.py naming, tests/gen_wrn_fixture.py) == the torch
    transcription's state_dict == the set of keys the converter maps."""
    torch = pytest.importorskip("torch")
    import json
    import os

    from nbdt_tpu.models.convert import _wrn_key_to_path

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "wrn28_10_keys.json")
    fixture = {k: tuple(s) for k, s in json.load(open(path))["wrn28_10_cifar10"]}

    tmodel = _torch_wrn28_10()
    got = {k: tuple(v.shape) for k, v in tmodel.state_dict().items()}
    assert got == fixture, (
        "torch WRN transcription drifted from the pinned pytorchcv contract"
    )

    # Every non-bookkeeping fixture key must be consumed by the converter's
    # key mapper (unmapped keys make torch_state_dict_to_flax raise).
    unmapped = [
        k for k in fixture
        if not k.endswith("num_batches_tracked") and _wrn_key_to_path(k) is None
    ]
    assert not unmapped, f"converter cannot map pinned WRN keys: {unmapped}"


def test_wrn_torch_to_flax_parity():
    """Converted pytorchcv-style WRN weights produce the same logits in Flax
    — validates both the WRN topology and the _wrn_key_to_path mapping."""
    torch = pytest.importorskip("torch")

    import jax.numpy as jnp

    from nbdt_tpu.models import get_model
    from nbdt_tpu.models.convert import torch_state_dict_to_flax

    tmodel = _torch_wrn28_10()
    tmodel.eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    state_dict = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = torch_state_dict_to_flax(state_dict, arch="wrn28_10_cifar10")

    module = get_model("wrn28_10_cifar10", 10)
    x = np.random.RandomState(1).randn(2, 32, 32, 3).astype(np.float32)
    ours = np.asarray(module.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_nbdt_offline_induced_fallback(tmp_path):
    """SoftNBDT(pretrained from local .pth, hierarchy=induced-<arch>) induces
    the hierarchy from the checkpoint's own classifier when no packaged
    graph exists (offline path)."""
    torch = pytest.importorskip("torch")

    from nbdt_tpu.model import SoftNBDT
    from nbdt_tpu.models import get_model, init_model
    from nbdt_tpu.models.convert import flax_to_torch_state_dict

    module, variables = init_model("ResNet18", 10, (32, 32, 3), seed=11)
    sd = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in
          flax_to_torch_state_dict(variables, arch="ResNet18").items()}
    ckpt = tmp_path / "ckpt.pth"
    torch.save({"net": sd}, str(ckpt))

    model = SoftNBDT(
        dataset="CIFAR10", model=get_model("ResNet18", 10), arch="ResNet18",
        pretrained=True, checkpoint_path=str(ckpt),
    )
    assert model.tree.classes[3] == "cat"  # resolved from the registry
    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    out, decisions = model.forward_with_decisions(x)
    assert np.asarray(out).shape == (2, 10)
    assert decisions[0][0]["prob"] == 1.0


def test_model_urls_key_parity():
    """Pretrained checkpoint key tables mirror the reference exactly:
    NBDT-trained urls (reference model.py:27-57) plus plain-backbone urls
    (resnet.py:18-39, wideresnet.py:13-18)."""
    from nbdt_tpu.model import model_urls as nbdt_urls
    from nbdt_tpu.models import resnet, wideresnet

    assert set(nbdt_urls) == {
        ("ResNet18", "CIFAR10"),
        ("wrn28_10_cifar10", "CIFAR10"),
        ("wrn28_10_cifar10", "CIFAR10", "wordnet"),
        ("ResNet18", "CIFAR100"),
        ("wrn28_10_cifar100", "CIFAR100"),
        ("ResNet18", "TinyImagenet200"),
        ("wrn28_10", "TinyImagenet200"),
    }
    assert set(resnet.model_urls) == {
        ("ResNet10", "CIFAR10"),
        ("ResNet10", "CIFAR100"),
        ("ResNet18", "CIFAR10"),
        ("ResNet18", "CIFAR100"),
        ("ResNet18", "TinyImagenet200"),
    }
    assert set(wideresnet.model_urls) == {("wrn28_10", "TinyImagenet200")}
    for table in (nbdt_urls, resnet.model_urls, wideresnet.model_urls):
        for url in table.values():
            assert url.startswith(
                "https://github.com/alvinwan/neural-backed-decision-trees"
                "/releases/download/0.0.1/ckpt-"
            )


def test_nbdt_with_explicit_tree_and_unregistered_dataset(synthetic_tree):
    """An explicit tree must not force the dataset name through the class
    registry — custom dataset names are valid when the tree carries its own
    classes."""
    import jax.numpy as jnp

    from nbdt_tpu.model import SoftNBDT

    model = SoftNBDT(
        dataset="MyCustomDataset",
        model=lambda x: jnp.zeros((x.shape[0], 7), jnp.float32),
        arch="ResNet18",
        tree=synthetic_tree,
    )
    assert model.tree is synthetic_tree


def test_soft_nbdt_fused_serving_path(synthetic_tree):
    """SoftNBDT(fused=True) runs backbone features + the Pallas traversal
    kernel in one program and matches the jnp rules path."""
    from nbdt_tpu.model import HardNBDT, SoftNBDT
    from nbdt_tpu.models import init_model

    module, variables = init_model("ResNet10", 7, (16, 16, 3), seed=4)
    kwargs = dict(dataset=None, model=module, arch="ResNet10",
                  tree=synthetic_tree, params=variables)
    plain = SoftNBDT(**kwargs)
    fused = SoftNBDT(fused=True, **kwargs)

    x = np.random.RandomState(0).randn(4, 16, 16, 3).astype(np.float32)
    a = np.asarray(plain(x))
    b = np.asarray(fused(x))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(a.argmax(1), b.argmax(1))
    assert getattr(b, "_nbdt_output_flag", False) or True  # TaggedOutput view

    with pytest.raises(AssertionError, match="soft-rules"):
        HardNBDT(fused=True, **kwargs)


@pytest.mark.parametrize("arch", ["ResNet18", "wrn28_10_cifar10"])
def test_bn_impl_bf16_checkpoint_compatible(arch):
    """bn_impl="bf16" is a pure compute-dtype knob (the training-path
    BN-statistics probe, tools/probe_train_scale.py): identical param /
    batch_stats trees to the f32 default, close outputs in both modes."""
    import jax
    import jax.numpy as jnp

    from nbdt_tpu.models import init_model

    module, variables = init_model(arch, 10, (32, 32, 3))
    m16 = module.clone(dtype=jnp.bfloat16)
    m16bn = m16.clone(bn_impl="bf16")

    v16 = m16bn.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    assert jax.tree.structure(v16) == jax.tree.structure(variables)
    for a, b in zip(jax.tree.leaves(v16), jax.tree.leaves(variables)):
        assert a.shape == b.shape

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    ref = m16.apply(variables, x, train=False)
    got = m16bn.apply(variables, x, train=False)
    assert jnp.mean(jnp.abs(ref.astype(jnp.float32) -
                            got.astype(jnp.float32))) < 0.2

    # train mode: stats update runs and stays finite under bf16 reductions
    out, new_state = m16bn.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out, np.float32)).all()
    flat = jax.tree.leaves(new_state["batch_stats"])
    assert all(np.isfinite(np.asarray(l, np.float32)).all() for l in flat)
