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


def _torch_squeezenet(version="1_0", num_classes=10):
    """torchvision SqueezeNet topology with torchvision key names
    (torchvision is not installed here; transcribed from its
    squeezenet.py — Fire modules, ceil-mode 3x2 max pools, conv
    classifier)."""
    torch = _pytest.importorskip("torch")
    import torch.nn as nn

    class Fire(nn.Module):
        def __init__(self, cin, s, e1, e3):
            super().__init__()
            self.squeeze = nn.Conv2d(cin, s, 1)
            self.squeeze_activation = nn.ReLU(inplace=True)
            self.expand1x1 = nn.Conv2d(s, e1, 1)
            self.expand1x1_activation = nn.ReLU(inplace=True)
            self.expand3x3 = nn.Conv2d(s, e3, 3, padding=1)
            self.expand3x3_activation = nn.ReLU(inplace=True)

        def forward(self, x):
            x = self.squeeze_activation(self.squeeze(x))
            return torch.cat([
                self.expand1x1_activation(self.expand1x1(x)),
                self.expand3x3_activation(self.expand3x3(x)),
            ], 1)

    pool = lambda: nn.MaxPool2d(3, 2, ceil_mode=True)
    if version == "1_0":
        feats = [
            nn.Conv2d(3, 96, 7, 2), nn.ReLU(True), pool(),
            Fire(96, 16, 64, 64), Fire(128, 16, 64, 64),
            Fire(128, 32, 128, 128), pool(),
            Fire(256, 32, 128, 128), Fire(256, 48, 192, 192),
            Fire(384, 48, 192, 192), Fire(384, 64, 256, 256), pool(),
            Fire(512, 64, 256, 256),
        ]
    else:
        feats = [
            nn.Conv2d(3, 64, 3, 2), nn.ReLU(True), pool(),
            Fire(64, 16, 64, 64), Fire(128, 16, 64, 64), pool(),
            Fire(128, 32, 128, 128), Fire(256, 32, 128, 128), pool(),
            Fire(256, 48, 192, 192), Fire(384, 48, 192, 192),
            Fire(384, 64, 256, 256), Fire(512, 64, 256, 256),
        ]

    class TorchSqueezeNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*feats)
            self.classifier = nn.Sequential(
                nn.Dropout(), nn.Conv2d(512, num_classes, 1),
                nn.ReLU(True), nn.AdaptiveAvgPool2d(1),
            )

        def forward(self, x):
            return torch.flatten(self.classifier(self.features(x)), 1)

    return TorchSqueezeNet()


def _torch_shufflenet(num_classes=10, width="x1_0"):
    """torchvision ShuffleNetV2 topology with torchvision key names
    (transcribed from its shufflenetv2.py); width selects the
    _stage_out_channels table (x0_5/x1_0/x1_5/x2_0)."""
    torch = _pytest.importorskip("torch")
    import torch.nn as nn

    def shuffle(x, groups=2):
        b, c, h, w = x.shape
        return (x.view(b, groups, c // groups, h, w)
                .transpose(1, 2).contiguous().view(b, c, h, w))

    class Unit(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.stride = stride
            bc = cout // 2
            if stride > 1:
                self.branch1 = nn.Sequential(
                    nn.Conv2d(cin, cin, 3, stride, 1, groups=cin, bias=False),
                    nn.BatchNorm2d(cin),
                    nn.Conv2d(cin, bc, 1, bias=False),
                    nn.BatchNorm2d(bc), nn.ReLU(True),
                )
            b2in = cin if stride > 1 else cin // 2
            self.branch2 = nn.Sequential(
                nn.Conv2d(b2in, bc, 1, bias=False), nn.BatchNorm2d(bc),
                nn.ReLU(True),
                nn.Conv2d(bc, bc, 3, stride, 1, groups=bc, bias=False),
                nn.BatchNorm2d(bc),
                nn.Conv2d(bc, bc, 1, bias=False), nn.BatchNorm2d(bc),
                nn.ReLU(True),
            )

        def forward(self, x):
            if self.stride == 1:
                x1, x2 = x.chunk(2, dim=1)
                out = torch.cat((x1, self.branch2(x2)), 1)
            else:
                out = torch.cat((self.branch1(x), self.branch2(x)), 1)
            return shuffle(out)

    from nbdt_tpu.models.shufflenet import _CHANNELS

    chans = _CHANNELS[width]

    class TorchShuffleNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Sequential(
                nn.Conv2d(3, chans[0], 3, 2, 1, bias=False),
                nn.BatchNorm2d(chans[0]), nn.ReLU(True),
            )
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            cin = chans[0]
            for si, (reps, c) in enumerate(zip((4, 8, 4), chans[1:4]),
                                           start=2):
                units = [Unit(cin, c, 2)]
                cin = c
                units += [Unit(cin, c, 1) for _ in range(reps - 1)]
                setattr(self, f"stage{si}", nn.Sequential(*units))
            self.conv5 = nn.Sequential(
                nn.Conv2d(chans[3], chans[4], 1, bias=False),
                nn.BatchNorm2d(chans[4]), nn.ReLU(True),
            )
            self.fc = nn.Linear(chans[4], num_classes)

        def forward(self, x):
            x = self.maxpool(self.conv1(x))
            x = self.stage4(self.stage3(self.stage2(x)))
            x = self.conv5(x)
            return self.fc(x.mean([2, 3]))

    return TorchShuffleNet()


def _torch_tv_resnet(layers, groups=1, width_per_group=64, num_classes=10):
    """torchvision ImageNet-ResNet topology with torchvision key names
    (transcribed from its resnet.py — Bottleneck with groups/base_width,
    7x7/2 stem + maxpool, downsample shortcuts, `fc` head)."""
    torch = _pytest.importorskip("torch")
    import torch.nn as nn

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            width = int(planes * (width_per_group / 64.0)) * groups
            self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride, 1,
                                   groups=groups, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class TorchResNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            for i, (planes, blocks, stride) in enumerate(
                zip((64, 128, 256, 512), layers, (1, 2, 2, 2)), start=1
            ):
                setattr(self, f"layer{i}", self._make_layer(planes, blocks,
                                                            stride))
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(512 * 4, num_classes)

        def _make_layer(self, planes, blocks, stride):
            downsample = None
            if stride != 1 or self.inplanes != planes * 4:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * 4, 1, stride,
                              bias=False),
                    nn.BatchNorm2d(planes * 4),
                )
            units = [Bottleneck(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * 4
            units += [Bottleneck(self.inplanes, planes)
                      for _ in range(blocks - 1)]
            return nn.Sequential(*units)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.fc(torch.flatten(self.avgpool(x), 1))

    return TorchResNet()


@_pytest.mark.parametrize("arch,groups,base_width", [
    ("resnext50_32x4d", 32, 4),
    ("wide_resnet50_2", 1, 128),
])
def test_resnext_wide_torch_parity(arch, groups, base_width):
    """ResNeXt / wide-ResNet: converted torchvision-style weights (grouped
    bottleneck convs) produce the same logits in Flax."""
    torch = _pytest.importorskip("torch")
    import jax.numpy as jnp
    import numpy as np

    from nbdt_tpu.models import get_model
    from nbdt_tpu.models.convert import torch_state_dict_to_flax

    tmodel = _torch_tv_resnet((3, 4, 6, 3), groups=groups,
                              width_per_group=base_width).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = torch_state_dict_to_flax(sd, arch=arch)

    module = get_model(arch, 10)
    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    ours = np.asarray(module.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


@_pytest.mark.parametrize("arch,size,feat", [
    ("resnext101_32x8d", 64, 2048),
    ("wide_resnet101_2", 64, 2048),
    ("densenet161", 32, 2208),
    ("densenet201", 32, 1920),
    ("vgg13_bn", 32, 512),
    ("vgg19_bn", 32, 512),
])
def test_widened_zoo_forward(arch, size, feat):
    """Round-3 zoo-breadth additions: logits + feature dims + induction
    probe-able classifier heads."""
    import jax.numpy as jnp
    import numpy as np

    from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
    from nbdt_tpu.models import init_model

    module, variables = init_model(arch, 10, (size, size, 3))
    x = np.random.RandomState(0).randn(1, size, size, 3).astype(np.float32)
    out = module.apply(variables, jnp.asarray(x), train=False)
    assert out.shape == (1, 10)
    centers = get_centers_from_flax_params(variables["params"])
    assert centers is not None and centers.shape == (10, feat)


@_pytest.mark.parametrize("arch,builder", [
    ("squeezenet1_0", lambda: _torch_squeezenet("1_0")),
    ("squeezenet1_1", lambda: _torch_squeezenet("1_1")),
    ("shufflenet_v2_x1_0", _torch_shufflenet),
    # x1_5/x2_0: same topology, wider channel table (zoo-completeness vs
    # the reference's torchvision-0.7 star-import)
    ("shufflenet_v2_x1_5", lambda: _torch_shufflenet(width="x1_5")),
    ("shufflenet_v2_x2_0", lambda: _torch_shufflenet(width="x2_0")),
])
def test_new_zoo_torch_parity(arch, builder):
    """Converted torchvision-style weights produce the same logits in Flax
    (eval mode, randomized BN stats) for the round-3 zoo additions."""
    torch = _pytest.importorskip("torch")
    import jax.numpy as jnp
    import numpy as np

    from nbdt_tpu.models import get_model
    from nbdt_tpu.models.convert import torch_state_dict_to_flax

    tmodel = builder().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = torch_state_dict_to_flax(sd, arch=arch)

    module = get_model(arch, 10)
    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    ours = np.asarray(module.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_new_zoo_centers_and_roundtrip():
    """Hierarchy induction probes the new heads (SqueezeNet's 1x1-conv
    classifier included), and the converter round-trips flax -> torch ->
    flax for the new families."""
    import numpy as np

    from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
    from nbdt_tpu.models import init_model
    from nbdt_tpu.models.convert import (
        flax_to_torch_state_dict,
        torch_state_dict_to_flax,
    )

    for arch, feat in (("squeezenet1_1", 512), ("shufflenet_v2_x1_0", 1024)):
        module, variables = init_model(arch, 10, (64, 64, 3))
        centers = get_centers_from_flax_params(variables["params"])
        assert centers is not None and centers.shape == (10, feat), arch
        sd = flax_to_torch_state_dict(variables, arch=arch)
        back = torch_state_dict_to_flax(sd, arch=arch)
        # spot-check round-trip equality on the classifier
        if arch.startswith("squeezenet"):
            np.testing.assert_allclose(
                np.asarray(variables["params"]["classifier"]["kernel"]),
                back["params"]["classifier"]["kernel"],
            )
        else:
            np.testing.assert_allclose(
                np.asarray(variables["params"]["fc"]["kernel"]),
                back["params"]["fc"]["kernel"],
            )
            np.testing.assert_allclose(
                np.asarray(variables["batch_stats"]["stage2_0"]["b1_1"]["var"]),
                back["batch_stats"]["stage2_0"]["b1_1"]["var"],
            )


def _torch_densenet(num_classes=10, growth=32, config=(6, 12, 24, 16)):
    """torchvision DenseNet topology with torchvision key names (transcribed
    from its densenet.py — features.conv0/norm0, denseblock{b}.denselayer{l},
    transition{t}, norm5, classifier)."""
    torch = _pytest.importorskip("torch")
    import torch.nn as nn
    from collections import OrderedDict

    class DenseLayer(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.norm1 = nn.BatchNorm2d(cin)
            self.conv1 = nn.Conv2d(cin, 4 * growth, 1, bias=False)
            self.norm2 = nn.BatchNorm2d(4 * growth)
            self.conv2 = nn.Conv2d(4 * growth, growth, 3, padding=1,
                                   bias=False)
            self.relu = nn.ReLU(inplace=True)

        def forward(self, x):
            out = self.conv1(self.relu(self.norm1(x)))
            out = self.conv2(self.relu(self.norm2(out)))
            return torch.cat([x, out], 1)

    class TorchDenseNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(OrderedDict([
                ("conv0", nn.Conv2d(3, 2 * growth, 7, 2, 3, bias=False)),
                ("norm0", nn.BatchNorm2d(2 * growth)),
                ("relu0", nn.ReLU(inplace=True)),
                ("pool0", nn.MaxPool2d(3, 2, 1)),
            ]))
            c = 2 * growth
            for b, layers in enumerate(config, 1):
                block = nn.Sequential(OrderedDict(
                    (f"denselayer{j + 1}", DenseLayer(c + j * growth))
                    for j in range(layers)))
                self.features.add_module(f"denseblock{b}", block)
                c += layers * growth
                if b != len(config):
                    self.features.add_module(f"transition{b}", nn.Sequential(
                        OrderedDict([
                            ("norm", nn.BatchNorm2d(c)),
                            ("relu", nn.ReLU(inplace=True)),
                            ("conv", nn.Conv2d(c, c // 2, 1, bias=False)),
                            ("pool", nn.AvgPool2d(2, 2)),
                        ])))
                    c //= 2
            self.features.add_module("norm5", nn.BatchNorm2d(c))
            self.classifier = nn.Linear(c, num_classes)

        def forward(self, x):
            out = torch.relu(self.features(x))
            out = torch.flatten(
                torch.nn.functional.adaptive_avg_pool2d(out, 1), 1)
            return self.classifier(out)

    return TorchDenseNet()


def _torch_mobilenet_v2(num_classes=10):
    """torchvision MobileNetV2 topology with torchvision key names
    (transcribed from its mobilenetv2.py — features.0..18, inverted
    residuals with .conv Sequentials, classifier.1)."""
    _pytest.importorskip("torch")
    import torch
    import torch.nn as nn

    def conv_bn_relu(cin, cout, k, stride=1, groups=1):
        return nn.Sequential(
            nn.Conv2d(cin, cout, k, stride, (k - 1) // 2, groups=groups,
                      bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU6(inplace=True),
        )

    class InvertedResidual(nn.Module):
        def __init__(self, inp, oup, stride, t):
            super().__init__()
            hidden = inp * t
            self.use_res = stride == 1 and inp == oup
            layers = []
            if t != 1:
                layers.append(conv_bn_relu(inp, hidden, 1))
            layers += [
                conv_bn_relu(hidden, hidden, 3, stride, groups=hidden),
                nn.Conv2d(hidden, oup, 1, bias=False),
                nn.BatchNorm2d(oup),
            ]
            self.conv = nn.Sequential(*layers)

        def forward(self, x):
            return x + self.conv(x) if self.use_res else self.conv(x)

    class TorchMobileNetV2(nn.Module):
        def __init__(self):
            super().__init__()
            settings = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                        (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                        (6, 320, 1, 1)]
            features = [conv_bn_relu(3, 32, 3, stride=2)]
            cin = 32
            for t, c, n, s in settings:
                for i in range(n):
                    features.append(
                        InvertedResidual(cin, c, s if i == 0 else 1, t))
                    cin = c
            features.append(conv_bn_relu(cin, 1280, 1))
            self.features = nn.Sequential(*features)
            self.classifier = nn.Sequential(
                nn.Dropout(0.2), nn.Linear(1280, num_classes))

        def forward(self, x):
            x = self.features(x)
            return self.classifier(x.mean([2, 3]))

    return TorchMobileNetV2()


@_pytest.mark.parametrize("arch,builder", [
    ("densenet121", _torch_densenet),
    ("mobilenet_v2", _torch_mobilenet_v2),
])
def test_densenet_mobilenet_torch_parity(arch, builder):
    """DenseNet/MobileNetV2 converter: torchvision-style weights produce the
    same logits in Flax, and the flax->torch direction enumerates exactly
    the torchvision key set (round-trip exact)."""
    torch = _pytest.importorskip("torch")
    import jax.numpy as jnp

    from nbdt_tpu.models import get_model
    from nbdt_tpu.models.convert import (
        flax_to_torch_state_dict,
        torch_state_dict_to_flax,
    )

    tmodel = builder().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = torch_state_dict_to_flax(sd, arch=arch)

    module = get_model(arch, 10)
    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    ours = np.asarray(module.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)

    # flax -> torch enumerates exactly the torchvision key set, values exact
    back = flax_to_torch_state_dict(variables, arch=arch)
    expected = {k for k in sd if not k.endswith("num_batches_tracked")}
    assert set(back) == expected
    for k in expected:
        np.testing.assert_array_equal(back[k], sd[k])
