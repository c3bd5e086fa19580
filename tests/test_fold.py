"""BatchNorm folding: the folded serving variant computes the same function
(standard inference optimization; no reference counterpart — the reference
serves unfused torch BatchNorm)."""

import numpy as np
import pytest


def _with_real_stats(module, variables, img, seed=0):
    """Run one train-mode pass so running mean/var are non-trivial."""
    rng = np.random.RandomState(seed)
    xw = rng.randn(16, img, img, 3).astype(np.float32)
    _, upd = module.apply(variables, xw, train=True, mutable=["batch_stats"])
    return {"params": variables["params"], "batch_stats": upd["batch_stats"]}


@pytest.mark.parametrize(
    "arch,img",
    [("ResNet18", 32), ("ResNet50", 32), ("resnet18", 64)],
    ids=["basicblock", "bottleneck", "imagenet-stem"],
)
def test_folded_matches_unfolded(arch, img):
    import jax.numpy as jnp

    from nbdt_tpu.models import init_model
    from nbdt_tpu.models.fold import fold_batchnorm

    module, variables = init_model(arch, 10, (img, img, 3))
    variables = _with_real_stats(module, variables, img)
    fmod, fvars = fold_batchnorm(module, variables)
    assert "batch_stats" not in fvars

    x = np.random.RandomState(1).randn(8, img, img, 3).astype(np.float32)
    a = module.apply(variables, x, train=False)
    b = fmod.apply(fvars, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    assert bool((jnp.argmax(a, -1) == jnp.argmax(b, -1)).all())


def test_folded_is_inference_only():
    from nbdt_tpu.models import init_model
    from nbdt_tpu.models.fold import fold_batchnorm

    module, variables = init_model("ResNet10", 10, (16, 16, 3))
    fmod, fvars = fold_batchnorm(module, variables)
    with pytest.raises(AssertionError, match="inference-only"):
        fmod.apply(fvars, np.zeros((2, 16, 16, 3), np.float32), train=True,
                   mutable=["batch_stats"])


def test_fold_rejects_unsupported_topology():
    from nbdt_tpu.models import get_model
    from nbdt_tpu.models.fold import fold_batchnorm

    wrn = get_model("wrn28_10_cifar10", 10)
    with pytest.raises(TypeError, match="ResNet family"):
        fold_batchnorm(wrn, {"params": {}})


def test_fold_without_batch_stats_is_a_clear_error():
    """Bare params (no batch_stats) must fail with a message naming the
    missing collection, not a raw KeyError deep in the recursion."""
    from nbdt_tpu.models import init_model
    from nbdt_tpu.models.fold import fold_batchnorm

    module, variables = init_model("ResNet10", 10, (16, 16, 3))
    with pytest.raises(ValueError, match="batch_stats"):
        fold_batchnorm(module, {"params": variables["params"]})


def test_soft_nbdt_fold_bn_option(synthetic_tree):
    """SoftNBDT(fold_bn=True): same predictions and working decision paths
    through the public wrapper (the CLI/API entry point)."""
    from nbdt_tpu.model import SoftNBDT
    from nbdt_tpu.models import init_model

    module, variables = init_model("ResNet10", 7, (16, 16, 3))
    plain = SoftNBDT(dataset=None, model=module, tree=synthetic_tree,
                     params=variables)
    folded = SoftNBDT(dataset=None, model=module, tree=synthetic_tree,
                      params=variables, fold_bn=True)
    x = np.random.RandomState(0).randn(6, 16, 16, 3).astype(np.float32)
    a, b = plain(x), folded(x)
    assert (np.argmax(a, -1) == np.argmax(b, -1)).all()
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    out, decisions = folded.forward_with_decisions(x)
    assert len(decisions) == 6 and decisions[0][-1]["name"]
    # unfolded params remain the source of truth on the wrapper
    assert "bn1" in folded.params["params"]
    with pytest.raises(AssertionError, match="pick one"):
        SoftNBDT(dataset=None, model=module, tree=synthetic_tree,
                 params=variables, fold_bn=True, fused=True)
