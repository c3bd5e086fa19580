"""Serving export: StableHLO artifacts, symbolic batch, AOT compile."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def flagship():
    from nbdt_tpu.assets import get_dataset_wnids
    from nbdt_tpu.hierarchy.build import build_induced_graph
    from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
    from nbdt_tpu.models import init_model
    from nbdt_tpu.tree import Tree

    module, variables = init_model("ResNet10", 10, (16, 16, 3))
    wnids = get_dataset_wnids("CIFAR10")
    centers = get_centers_from_flax_params(variables["params"])
    G = build_induced_graph(wnids, centers)
    tree = Tree.from_graph(G, wnids, classes=[f"c{i}" for i in range(10)])
    return module, variables, tree


def test_export_roundtrip_symbolic_batch(flagship, tmp_path):
    """One artifact serves multiple batch sizes; reloaded outputs match the
    live function; the artifact is self-contained (no model code at load)."""
    import jax.numpy as jnp

    from nbdt_tpu.serving import export_serving, load_serving, make_serving_fn

    module, variables, tree = flagship
    path = str(tmp_path / "nbdt.stablehlo")
    out = export_serving(module, variables, tree, path, image_size=16,
                         bf16=False, platforms=("cpu",))
    assert out == path
    served = load_serving(path)
    live = make_serving_fn(module, variables, tree, bf16=False)

    rng = np.random.RandomState(0)
    for batch in (1, 5):
        x = jnp.asarray(rng.randn(batch, 16, 16, 3).astype(np.float32))
        got = np.asarray(served(x))
        want = np.asarray(live(x))
        assert got.shape == (batch, 10)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_bf16_backbone_argmax_parity(flagship, tmp_path):
    """The bf16 serving artifact keeps f32 node decisions: its argmax
    matches the f32 path (the CLAUDE.md precision-split invariant)."""
    import jax.numpy as jnp

    from nbdt_tpu.serving import export_serving, load_serving, make_serving_fn

    module, variables, tree = flagship
    path = str(tmp_path / "nbdt-bf16.stablehlo")
    export_serving(module, variables, tree, path, image_size=16,
                   bf16=True, platforms=("cpu",))
    served = load_serving(path)
    f32 = make_serving_fn(module, variables, tree, bf16=False)

    x = jnp.asarray(np.random.RandomState(1).randn(8, 16, 16, 3)
                    .astype(np.float32))
    got = np.asarray(served(x))
    want = np.asarray(f32(x))
    assert (got.argmax(1) == want.argmax(1)).all()


def test_aot_compile_fixed_batch(flagship):
    """AOT compile pins the batch size and runs without retracing."""
    import jax.numpy as jnp

    from nbdt_tpu.serving import aot_compile, make_serving_fn

    module, variables, tree = flagship
    fn = make_serving_fn(module, variables, tree, bf16=False)
    compiled = aot_compile(fn, batch=4, image_size=16)
    x = jnp.zeros((4, 16, 16, 3), jnp.float32)
    out = np.asarray(compiled(x))
    assert out.shape == (4, 10)
    assert np.isfinite(out).all()


def test_shard_serving_matches_unsharded(flagship):
    """Data-parallel serving over the 8-device CPU mesh returns the same
    leaf distribution as the single-device path."""
    import jax
    import jax.numpy as jnp

    from nbdt_tpu.parallel import make_mesh
    from nbdt_tpu.serving import make_serving_fn, shard_serving

    module, variables, tree = flagship
    fn = make_serving_fn(module, variables, tree, bf16=False)
    mesh = make_mesh(n_devices=8, tp=1)
    sharded = shard_serving(fn, mesh)

    x = jnp.asarray(np.random.RandomState(2).randn(16, 16, 16, 3)
                    .astype(np.float32))
    with mesh:
        got = np.asarray(sharded(x))
    want = np.asarray(jax.jit(fn)(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_cli_random_init(tmp_path):
    """nbdt-export end-to-end: CLI -> artifact -> load -> serve."""
    import jax.numpy as jnp

    from nbdt_tpu.bin.nbdt_export import main
    from nbdt_tpu.serving import load_serving

    out = str(tmp_path / "cli.stablehlo")
    main(["--arch", "ResNet10", "--dataset", "CIFAR10", "--random-init",
          "--out", out, "--image-size", "16", "--f32",
          "--platforms", "cpu"])
    served = load_serving(out)
    got = np.asarray(served(jnp.zeros((3, 16, 16, 3), jnp.float32)))
    assert got.shape == (3, 10)
    assert np.isfinite(got).all()


def test_export_folded_bn_argmax_parity(flagship, tmp_path):
    """fold_bn=True exports the BN-folded graph (conv+bias+ReLU only) and
    predictions still match the unfolded f32 path exactly."""
    import jax.numpy as jnp

    from nbdt_tpu.serving import export_serving, load_serving, make_serving_fn

    module, variables, tree = flagship
    path = str(tmp_path / "nbdt-folded.stablehlo")
    export_serving(module, variables, tree, path, image_size=16,
                   bf16=True, platforms=("cpu",), fold_bn=True)
    served = load_serving(path)
    f32 = make_serving_fn(module, variables, tree, bf16=False)

    x = jnp.asarray(np.random.RandomState(2).randn(8, 16, 16, 3)
                    .astype(np.float32))
    got = np.asarray(served(x))
    want = np.asarray(f32(x))
    assert (got.argmax(1) == want.argmax(1)).all()


def test_export_uint8_input_matches_float_path(flagship, tmp_path):
    """uint8_input=True bakes on-device normalization in: feeding raw uint8
    must equal the float path fed the same host-normalized pixels."""
    import jax.numpy as jnp

    from nbdt_tpu.data.transforms import CIFAR_MEAN, CIFAR_STD, normalize
    from nbdt_tpu.serving import export_serving, load_serving, make_serving_fn

    module, variables, tree = flagship
    path = str(tmp_path / "nbdt-u8.stablehlo")
    export_serving(module, variables, tree, path, image_size=16,
                   bf16=False, platforms=("cpu",), uint8_input=True,
                   normalize=(CIFAR_MEAN, CIFAR_STD))
    served = load_serving(path)
    live = make_serving_fn(module, variables, tree, bf16=False)

    u8 = np.random.RandomState(3).randint(0, 256, (4, 16, 16, 3),
                                          dtype=np.uint8)
    got = np.asarray(served(jnp.asarray(u8)))
    want = np.asarray(live(jnp.asarray(normalize(u8, CIFAR_MEAN, CIFAR_STD))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
