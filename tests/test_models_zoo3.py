"""Round-3 zoo-completion families: AlexNet, plain VGG, GoogLeNet, MNASNet,
Inception v3 (the remaining torchvision-0.7 classification archs the
reference reaches via star-import, reference models/__init__.py:1-12).

Parity pattern matches tests/test_models_extra.py: transcribe the
torchvision topology in torch with torchvision key names, randomize BN
stats, convert, and compare eval logits.
"""

import numpy as np
import pytest as _pytest


# ---------------------------------------------------------------------------
# torch transcriptions (torchvision topologies + key names)
# ---------------------------------------------------------------------------


def _torch_alexnet(num_classes=10):
    torch = _pytest.importorskip("torch")
    import torch.nn as nn

    class TorchAlexNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(
                nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(inplace=True),
                nn.MaxPool2d(3, 2),
                nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(inplace=True),
                nn.MaxPool2d(3, 2),
                nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(inplace=True),
                nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(inplace=True),
                nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(inplace=True),
                nn.MaxPool2d(3, 2),
            )
            self.avgpool = nn.AdaptiveAvgPool2d((6, 6))
            self.classifier = nn.Sequential(
                nn.Dropout(), nn.Linear(256 * 6 * 6, 4096),
                nn.ReLU(inplace=True),
                nn.Dropout(), nn.Linear(4096, 4096), nn.ReLU(inplace=True),
                nn.Linear(4096, num_classes),
            )

        def forward(self, x):
            x = self.avgpool(self.features(x))
            return self.classifier(torch.flatten(x, 1))

    return TorchAlexNet()


def _torch_basic_conv(cin, cout, **kw):
    torch = _pytest.importorskip("torch")
    import torch.nn as nn
    import torch.nn.functional as F

    class BasicConv2d(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
            self.bn = nn.BatchNorm2d(cout, eps=0.001)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)), inplace=True)

    return BasicConv2d()


def _torch_googlenet(num_classes=10):
    torch = _pytest.importorskip("torch")
    import torch.nn as nn

    class Inception(nn.Module):
        def __init__(self, cin, c1, c3r, c3, c5r, c5, pp):
            super().__init__()
            self.branch1 = _torch_basic_conv(cin, c1, kernel_size=1)
            self.branch2 = nn.Sequential(
                _torch_basic_conv(cin, c3r, kernel_size=1),
                _torch_basic_conv(c3r, c3, kernel_size=3, padding=1))
            self.branch3 = nn.Sequential(
                _torch_basic_conv(cin, c5r, kernel_size=1),
                # torchvision uses 3x3 here despite the ch5x5 arg name
                _torch_basic_conv(c5r, c5, kernel_size=3, padding=1))
            self.branch4 = nn.Sequential(
                nn.MaxPool2d(3, stride=1, padding=1, ceil_mode=True),
                _torch_basic_conv(cin, pp, kernel_size=1))

        def forward(self, x):
            return torch.cat([self.branch1(x), self.branch2(x),
                              self.branch3(x), self.branch4(x)], 1)

    class TorchGoogLeNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = _torch_basic_conv(3, 64, kernel_size=7, stride=2,
                                           padding=3)
            self.maxpool1 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
            self.conv2 = _torch_basic_conv(64, 64, kernel_size=1)
            self.conv3 = _torch_basic_conv(64, 192, kernel_size=3, padding=1)
            self.maxpool2 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
            self.inception3a = Inception(192, 64, 96, 128, 16, 32, 32)
            self.inception3b = Inception(256, 128, 128, 192, 32, 96, 64)
            self.maxpool3 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
            self.inception4a = Inception(480, 192, 96, 208, 16, 48, 64)
            self.inception4b = Inception(512, 160, 112, 224, 24, 64, 64)
            self.inception4c = Inception(512, 128, 128, 256, 24, 64, 64)
            self.inception4d = Inception(512, 112, 144, 288, 32, 64, 64)
            self.inception4e = Inception(528, 256, 160, 320, 32, 128, 128)
            self.maxpool4 = nn.MaxPool2d(2, stride=2, ceil_mode=True)
            self.inception5a = Inception(832, 256, 160, 320, 32, 128, 128)
            self.inception5b = Inception(832, 384, 192, 384, 48, 128, 128)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(1024, num_classes)

        def forward(self, x):
            x = self.maxpool1(self.conv1(x))
            x = self.maxpool2(self.conv3(self.conv2(x)))
            x = self.maxpool3(self.inception3b(self.inception3a(x)))
            x = self.inception4a(x)
            x = self.inception4b(x)
            x = self.inception4c(x)
            x = self.inception4d(x)
            x = self.maxpool4(self.inception4e(x))
            x = self.inception5b(self.inception5a(x))
            x = torch.flatten(self.avgpool(x), 1)
            return self.fc(x)

    return TorchGoogLeNet()


def _torch_mnasnet(alpha=1.0, num_classes=10):
    torch = _pytest.importorskip("torch")
    import torch.nn as nn

    from nbdt_tpu.models.mnasnet import get_depths

    class InvRes(nn.Module):
        def __init__(self, cin, cout, k, s, e):
            super().__init__()
            mid = cin * e
            self.apply_residual = cin == cout and s == 1
            self.layers = nn.Sequential(
                nn.Conv2d(cin, mid, 1, bias=False), nn.BatchNorm2d(mid),
                nn.ReLU(inplace=True),
                nn.Conv2d(mid, mid, k, padding=k // 2, stride=s, groups=mid,
                          bias=False),
                nn.BatchNorm2d(mid), nn.ReLU(inplace=True),
                nn.Conv2d(mid, cout, 1, bias=False), nn.BatchNorm2d(cout))

        def forward(self, x):
            out = self.layers(x)
            return out + x if self.apply_residual else out

    def stack(cin, cout, k, s, e, n):
        blocks = [InvRes(cin, cout, k, s, e)]
        blocks += [InvRes(cout, cout, k, 1, e) for _ in range(n - 1)]
        return nn.Sequential(*blocks)

    # torchvision _version=2 layout: _get_depths scales the stem too
    d = get_depths(alpha)

    class TorchMNASNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = nn.Sequential(
                nn.Conv2d(3, d[0], 3, padding=1, stride=2, bias=False),
                nn.BatchNorm2d(d[0]), nn.ReLU(inplace=True),
                nn.Conv2d(d[0], d[0], 3, padding=1, groups=d[0], bias=False),
                nn.BatchNorm2d(d[0]), nn.ReLU(inplace=True),
                nn.Conv2d(d[0], d[1], 1, bias=False), nn.BatchNorm2d(d[1]),
                stack(d[1], d[2], 3, 2, 3, 3), stack(d[2], d[3], 5, 2, 3, 3),
                stack(d[3], d[4], 5, 2, 6, 3), stack(d[4], d[5], 3, 1, 6, 2),
                stack(d[5], d[6], 5, 2, 6, 4), stack(d[6], d[7], 3, 1, 6, 1),
                nn.Conv2d(d[7], 1280, 1, bias=False), nn.BatchNorm2d(1280),
                nn.ReLU(inplace=True))
            self.classifier = nn.Sequential(nn.Dropout(0.2),
                                            nn.Linear(1280, num_classes))

        def forward(self, x):
            return self.classifier(self.layers(x).mean([2, 3]))

    return TorchMNASNet()


def _torch_inception_v3(num_classes=10):
    torch = _pytest.importorskip("torch")
    import torch.nn as nn
    import torch.nn.functional as F

    bc = _torch_basic_conv

    class InceptionA(nn.Module):
        def __init__(self, cin, pool_features):
            super().__init__()
            self.branch1x1 = bc(cin, 64, kernel_size=1)
            self.branch5x5_1 = bc(cin, 48, kernel_size=1)
            self.branch5x5_2 = bc(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = bc(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = bc(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = bc(96, 96, kernel_size=3, padding=1)
            self.branch_pool = bc(cin, pool_features, kernel_size=1)

        def forward(self, x):
            bp = F.avg_pool2d(x, 3, stride=1, padding=1)
            return torch.cat([
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                self.branch_pool(bp)], 1)

    class InceptionB(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3 = bc(cin, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = bc(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = bc(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = bc(96, 96, kernel_size=3, stride=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                F.max_pool2d(x, 3, stride=2)], 1)

    class InceptionC(nn.Module):
        def __init__(self, cin, c7):
            super().__init__()
            self.branch1x1 = bc(cin, 192, kernel_size=1)
            self.branch7x7_1 = bc(cin, c7, kernel_size=1)
            self.branch7x7_2 = bc(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7_3 = bc(c7, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = bc(cin, c7, kernel_size=1)
            self.branch7x7dbl_2 = bc(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = bc(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = bc(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = bc(c7, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch_pool = bc(cin, 192, kernel_size=1)

        def forward(self, x):
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_1(x)
            for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                      self.branch7x7dbl_4, self.branch7x7dbl_5):
                bd = m(bd)
            bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([self.branch1x1(x), b7, bd, bp], 1)

    class InceptionD(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3_1 = bc(cin, 192, kernel_size=1)
            self.branch3x3_2 = bc(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = bc(cin, 192, kernel_size=1)
            self.branch7x7x3_2 = bc(192, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7x3_3 = bc(192, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7x3_4 = bc(192, 192, kernel_size=3, stride=2)

        def forward(self, x):
            b7 = self.branch7x7x3_1(x)
            for m in (self.branch7x7x3_2, self.branch7x7x3_3,
                      self.branch7x7x3_4):
                b7 = m(b7)
            return torch.cat([self.branch3x3_2(self.branch3x3_1(x)), b7,
                              F.max_pool2d(x, 3, stride=2)], 1)

    class InceptionE(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch1x1 = bc(cin, 320, kernel_size=1)
            self.branch3x3_1 = bc(cin, 384, kernel_size=1)
            self.branch3x3_2a = bc(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3_2b = bc(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = bc(cin, 448, kernel_size=1)
            self.branch3x3dbl_2 = bc(448, 384, kernel_size=3, padding=1)
            self.branch3x3dbl_3a = bc(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = bc(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch_pool = bc(cin, 192, kernel_size=1)

        def forward(self, x):
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd),
                            self.branch3x3dbl_3b(bd)], 1)
            bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([self.branch1x1(x), b3, bd, bp], 1)

    class TorchInceptionV3(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = bc(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = bc(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = bc(32, 64, kernel_size=3, padding=1)
            self.Conv2d_3b_1x1 = bc(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = bc(80, 192, kernel_size=3)
            self.Mixed_5b = InceptionA(192, 32)
            self.Mixed_5c = InceptionA(256, 64)
            self.Mixed_5d = InceptionA(288, 64)
            self.Mixed_6a = InceptionB(288)
            self.Mixed_6b = InceptionC(768, 128)
            self.Mixed_6c = InceptionC(768, 160)
            self.Mixed_6d = InceptionC(768, 160)
            self.Mixed_6e = InceptionC(768, 192)
            self.Mixed_7a = InceptionD(768)
            self.Mixed_7b = InceptionE(1280)
            self.Mixed_7c = InceptionE(2048)
            self.fc = nn.Linear(2048, num_classes)

        def forward(self, x):
            x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
            x = F.max_pool2d(x, 3, stride=2)
            for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                      self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                      self.Mixed_6d, self.Mixed_6e, self.Mixed_7a,
                      self.Mixed_7b, self.Mixed_7c):
                x = m(x)
            x = F.adaptive_avg_pool2d(x, (1, 1))
            return self.fc(torch.flatten(x, 1))

    return TorchInceptionV3()


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@_pytest.mark.parametrize("arch,builder,size,tol", [
    ("alexnet", _torch_alexnet, 224, 1e-4),
    ("alexnet", _torch_alexnet, 64, 1e-4),  # adaptive-pool upsampling path
    ("googlenet", _torch_googlenet, 64, 1e-3),
    ("mnasnet0_5", lambda: _torch_mnasnet(0.5), 64, 1e-3),
    ("mnasnet1_0", lambda: _torch_mnasnet(1.0), 64, 1e-3),
    ("mnasnet1_3", lambda: _torch_mnasnet(1.3), 64, 1e-3),
    ("inception_v3", _torch_inception_v3, 96, 2e-3),
])
def test_zoo3_torch_parity(arch, builder, size, tol):
    """Converted torchvision-style weights produce the same eval logits."""
    torch = _pytest.importorskip("torch")
    import jax.numpy as jnp

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
    x = np.random.RandomState(0).randn(2, size, size, 3).astype(np.float32)
    ours = np.asarray(module.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=tol, atol=tol)


def test_converter_skips_aux_heads():
    """GoogLeNet/Inception checkpoints carry train-only aux-head weights;
    the converter must skip (not reject) them."""
    _pytest.importorskip("torch")
    import torch

    from nbdt_tpu.models.convert import torch_state_dict_to_flax

    tmodel = _torch_googlenet().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    sd["aux1.conv.conv.weight"] = np.zeros((128, 512, 1, 1), np.float32)
    sd["aux2.fc2.bias"] = np.zeros((10,), np.float32)
    variables = torch_state_dict_to_flax(sd, arch="googlenet")
    assert "inception3a" in variables["params"]
    assert not any(k.startswith("aux") for k in variables["params"])


@_pytest.mark.parametrize("arch,size,feat", [
    ("vgg11", 32, 512),
    ("vgg16", 32, 512),
    ("vgg19", 64, 512),
    ("mnasnet0_75", 64, 1280),
    ("inception_v3", 128, 2048),
])
def test_zoo3_forward_and_probe(arch, size, feat):
    """Remaining variants: logits shape + induction-probe-able classifier."""
    import jax.numpy as jnp

    from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
    from nbdt_tpu.models import init_model

    module, variables = init_model(arch, 10, (size, size, 3))
    x = np.random.RandomState(0).randn(1, size, size, 3).astype(np.float32)
    out = module.apply(variables, jnp.asarray(x), train=False)
    assert out.shape == (1, 10)
    centers = get_centers_from_flax_params(variables["params"])
    assert centers is not None and centers.shape == (10, feat)


def test_zoo3_nbdt_end_to_end():
    """A new-zoo backbone drives the full NBDT flow: induce a hierarchy
    from its classifier rows, build the tree, and run soft + hard
    inference with decision paths (the reference's --arch star-import
    promise, models/__init__.py:1-12)."""
    import jax.numpy as jnp

    from nbdt_tpu.assets import get_dataset_wnids
    from nbdt_tpu.hierarchy.build import build_induced_graph
    from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
    from nbdt_tpu.model import HardNBDT, SoftNBDT
    from nbdt_tpu.models import init_model
    from nbdt_tpu.tree import Tree

    module, variables = init_model("mnasnet0_5", 10, (32, 32, 3))
    wnids = get_dataset_wnids("CIFAR10")
    centers = get_centers_from_flax_params(variables["params"])
    tree = Tree.from_graph(build_induced_graph(wnids, centers), wnids,
                           classes=[f"c{i}" for i in range(10)])
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3)
                    .astype(np.float32))
    soft = SoftNBDT(dataset=None, model=module, tree=tree, params=variables)
    out, decisions = soft.forward_with_decisions(x)
    assert out.shape == (2, 10) and len(decisions) == 2
    assert all("prob" in d and "name" in d for d in decisions[0])
    hard = HardNBDT(dataset=None, model=module, tree=tree, params=variables)
    hout, hdec = hard.forward_with_decisions(x)
    assert hout.shape == (2, 10) and len(hdec[0]) >= 2


def test_zoo3_roundtrip_exact():
    """flax -> torch -> flax is exact for the new families (key-set
    enumeration covers every parameter; nothing silently dropped)."""
    import jax

    from nbdt_tpu.models import init_model
    from nbdt_tpu.models.convert import (
        flax_to_torch_state_dict,
        torch_state_dict_to_flax,
    )

    for arch, size in (("alexnet", 64), ("googlenet", 64),
                       ("mnasnet1_0", 64), ("inception_v3", 96)):
        module, variables = init_model(arch, 10, (size, size, 3))
        sd = flax_to_torch_state_dict(variables, arch=arch)
        back = torch_state_dict_to_flax(sd, arch=arch)
        orig_leaves, orig_tree = jax.tree_util.tree_flatten(dict(variables))
        back_leaves, back_tree = jax.tree_util.tree_flatten(back)
        assert orig_tree == back_tree, arch
        for a, b in zip(orig_leaves, back_leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def _torch_vgg(depth, bn, num_classes=10):
    """torchvision VGG (make_layers + avgpool + 3-layer classifier, exact
    key names; convs keep bias=True in BOTH variants)."""
    torch = _pytest.importorskip("torch")
    import torch.nn as nn

    cfgs = {
        11: [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
        13: [64, 64, "M", 128, 128, "M", 256, 256, "M",
             512, 512, "M", 512, 512, "M"],
        16: [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"],
    }
    layers, in_c = [], 3
    for v in cfgs[depth]:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_c, v, 3, padding=1))
            if bn:
                layers.append(nn.BatchNorm2d(v))
            layers.append(nn.ReLU(inplace=True))
            in_c = v

    class TorchVGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*layers)
            self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
            self.classifier = nn.Sequential(
                nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
                nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
                nn.Linear(4096, num_classes),
            )

        def forward(self, x):
            x = self.avgpool(self.features(x))
            return self.classifier(torch.flatten(x, 1))

    return TorchVGG()


@_pytest.mark.parametrize("arch,bn,size", [
    ("vgg11", False, 64),      # adaptive-pool upsampling path (2x2 -> 7x7)
    ("vgg11_bn", True, 64),
    ("vgg11_bn", True, 224),   # exact-7x7 path (identity pool)
])
def test_vgg_classic_head_torch_parity(arch, bn, size):
    """classic_head=True VGG converts torchvision checkpoints and
    reproduces eval logits — closing the one zoo family without a
    checkpoint-parity path (round-3 VERDICT missing #3)."""
    torch = _pytest.importorskip("torch")
    import jax.numpy as jnp

    from nbdt_tpu.models import vgg as vgg_mod
    from nbdt_tpu.models.convert import torch_state_dict_to_flax

    tmodel = _torch_vgg(11, bn=bn).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = torch_state_dict_to_flax(sd, arch=arch)

    module = getattr(vgg_mod, arch)(10, classic_head=True)
    n = 1 if size > 64 else 2
    x = np.random.RandomState(0).randn(n, size, size, 3).astype(np.float32)
    ours = np.asarray(module.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_vgg_classic_head_roundtrip_and_collapsed_guard():
    """flax -> torch -> flax is exact for classic-head VGG; exporting a
    collapsed-head VGG to torchvision keys fails loudly (the deviation is
    documented, not silent)."""
    import jax
    import jax.numpy as jnp

    from nbdt_tpu.models import init_model
    from nbdt_tpu.models.vgg import vgg11_bn
    from nbdt_tpu.models.convert import (
        flax_to_torch_state_dict,
        torch_state_dict_to_flax,
    )

    module = vgg11_bn(10, classic_head=True)
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)), train=False)
    variables = jax.tree_util.tree_map(np.asarray, dict(variables))
    sd = flax_to_torch_state_dict(variables, arch="vgg11_bn")
    assert "classifier.0.weight" in sd and "features.0.bias" in sd
    back = torch_state_dict_to_flax(sd, arch="vgg11_bn")
    orig_leaves, orig_tree = jax.tree_util.tree_flatten(dict(variables))
    back_leaves, back_tree = jax.tree_util.tree_flatten(back)
    assert orig_tree == back_tree
    for a, b in zip(orig_leaves, back_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    _, collapsed = init_model("vgg11_bn", 10, (32, 32, 3))
    with _pytest.raises(ValueError, match="classic_head"):
        flax_to_torch_state_dict(collapsed, arch="vgg11_bn")


def test_mnasnet_v2_stem_scales_with_alpha():
    """torchvision's _version=2 layout alpha-scales the stem channels too
    (_get_depths covers all eight base channels); a fixed 32/16 stem is the
    deprecated v1 layout and breaks converting real v2 checkpoints."""
    from nbdt_tpu.models import init_model
    from nbdt_tpu.models.mnasnet import get_depths

    assert get_depths(0.5)[:2] == [16, 8]
    assert get_depths(1.0)[:2] == [32, 16]
    assert get_depths(1.3)[:2] == [40, 24]

    _, variables = init_model("mnasnet0_5", 10, (32, 32, 3))
    assert variables["params"]["l0"]["kernel"].shape == (3, 3, 3, 16)
    assert variables["params"]["l6"]["kernel"].shape == (1, 1, 16, 8)


def test_transform_input_option_and_converter_warning():
    """torchvision's pretrained googlenet/inception_v3 force
    transform_input=True; the model option applies the per-channel affine
    and the converter warns so converted released checkpoints don't
    silently produce different logits."""
    import jax.numpy as jnp

    from nbdt_tpu.models import get_model, init_model
    from nbdt_tpu.models.convert import (
        flax_to_torch_state_dict,
        torch_state_dict_to_flax,
    )
    from nbdt_tpu.models.googlenet import transform_input_rescale

    # the affine itself matches torchvision _transform_input exactly
    x = np.random.RandomState(0).randn(2, 4, 4, 3).astype(np.float32)
    want = x * (np.array([0.229, 0.224, 0.225]) / 0.5) + (
        np.array([0.485, 0.456, 0.406]) - 0.5) / 0.5
    np.testing.assert_allclose(
        np.asarray(transform_input_rescale(jnp.asarray(x))), want,
        rtol=1e-6, atol=1e-6)

    # model option == host-side rescale + plain model
    module, variables = init_model("googlenet", 10, (64, 64, 3))
    ti = get_model("googlenet", 10, transform_input=True)
    xi = np.random.RandomState(1).randn(1, 64, 64, 3).astype(np.float32)
    plain = module.apply(variables, transform_input_rescale(jnp.asarray(xi)),
                         train=False)
    opted = ti.apply(variables, jnp.asarray(xi), train=False)
    np.testing.assert_allclose(np.asarray(opted), np.asarray(plain),
                               rtol=1e-6, atol=1e-6)

    sd = flax_to_torch_state_dict(variables, arch="googlenet")
    with _pytest.warns(UserWarning, match="transform_input=True"):
        torch_state_dict_to_flax(sd, arch="googlenet")
