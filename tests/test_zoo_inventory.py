"""Pin the model-zoo inventory so docs/ZOO.md's completeness claim stays
literally true.

The reference reaches its zoo by star-importing torchvision.models and
pytorchcv.models.efficientnet (reference nbdt/models/__init__.py:1-12).
This pins (a) the exact torchvision-0.7 classification constructor list,
(b) pytorchcv's efficientnet export grid b0..b8 x {plain, b, c}, and
(c) the reference's own local archs — all of which must be registered.
"""

from nbdt_tpu.models import get_model, get_model_choices

# torchvision 0.7 classification constructors (torchvision/models/__init__.py
# at v0.7.0: resnet, alexnet, vgg, squeezenet, inception, densenet,
# googlenet, mobilenet, mnasnet, shufflenetv2 submodule exports).
TORCHVISION_07_CLASSIFIERS = {
    "alexnet",
    "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "resnext50_32x4d", "resnext101_32x8d",
    "wide_resnet50_2", "wide_resnet101_2",
    "vgg11", "vgg11_bn", "vgg13", "vgg13_bn",
    "vgg16", "vgg16_bn", "vgg19", "vgg19_bn",
    "squeezenet1_0", "squeezenet1_1",
    "inception_v3", "googlenet",
    "densenet121", "densenet169", "densenet201", "densenet161",
    "mobilenet_v2",
    "mnasnet0_5", "mnasnet0_75", "mnasnet1_0", "mnasnet1_3",
    "shufflenet_v2_x0_5", "shufflenet_v2_x1_0",
    "shufflenet_v2_x1_5", "shufflenet_v2_x2_0",
}

# pytorchcv.models.efficientnet __all__ constructor grid (pytorchcv is
# unpinned in the reference's requirements.txt:1; current releases export
# b0..b8 plain + TF-mode "b" + AdvProp "c").
PYTORCHCV_EFFICIENTNETS = {
    f"efficientnet_b{i}{s}" for i in range(9) for s in ("", "b", "c")
}

# The reference's own local models (nbdt/models/resnet.py:160-223,
# wideresnet.py:28-40).
REFERENCE_LOCAL = {
    "ResNet10", "ResNet18", "ResNet34", "ResNet50", "ResNet101", "ResNet152",
    "wrn28_10", "wrn28_10_cifar10", "wrn28_10_cifar100",
}


def test_zoo_covers_reference_star_imports():
    registered = set(get_model_choices())
    required = (TORCHVISION_07_CLASSIFIERS | PYTORCHCV_EFFICIENTNETS
                | REFERENCE_LOCAL)
    missing = required - registered
    assert not missing, f"zoo missing reference-reachable archs: {sorted(missing)}"


def test_zoo_has_no_unexplained_extras():
    """Anything beyond the reference surface must be a deliberate,
    documented extra (keeps ZOO.md's table == the registry)."""
    deliberate_extras = {"vit_b16", "vit_s16"}  # the ViT stretch configs
    registered = set(get_model_choices())
    extras = registered - (TORCHVISION_07_CLASSIFIERS
                           | PYTORCHCV_EFFICIENTNETS | REFERENCE_LOCAL)
    assert extras == deliberate_extras, sorted(extras)


def test_new_widths_construct():
    for arch in ("shufflenet_v2_x1_5", "shufflenet_v2_x2_0",
                 "efficientnet_b8", "efficientnet_b8b", "efficientnet_b0c"):
        m = get_model(arch, 10)
        assert m is not None
    assert get_model("efficientnet_b8b", 10).tf_mode is True
    assert get_model("efficientnet_b0c", 10).tf_mode is True
    assert get_model("shufflenet_v2_x2_0", 10).width == "x2_0"
