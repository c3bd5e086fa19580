"""Device-side normalization: uint8 batches + in-step normalize must train
and evaluate the same as the host-normalized float pipeline (the transforms
consume identical RNG draws, so crops/flips match; only the affine moves)."""

import numpy as np
import pytest


@pytest.fixture()
def setup():
    from nbdt_tpu.data import DataLoader, SyntheticDataset
    from nbdt_tpu.hierarchy.build import build_induced_graph
    from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
    from nbdt_tpu.models import init_model
    from nbdt_tpu.tree import Tree

    module, variables = init_model("ResNet10", 7, (16, 16, 3))
    wnids = [f"f{i:08d}" for i in range(7)]
    centers = get_centers_from_flax_params(variables["params"])
    tree = Tree.from_graph(build_induced_graph(wnids, centers), wnids,
                           classes=[f"c{i}" for i in range(7)])
    # ONE batch per epoch: the two pipelines' inputs differ only in the
    # affine's float association (~1e-7), but SGD+BN amplify that across
    # steps — single-step comparisons stay tight, multi-step ones drift.
    ds = SyntheticDataset(num_classes=7, size=8, image_size=16)
    return module, variables, tree, ds


def _trainer(module, variables, tree, ds, tmp_path, device_normalize):
    from nbdt_tpu.trainer import TrainConfig, Trainer
    from nbdt_tpu.data import DataLoader

    dn = {"device_normalize": True} if device_normalize else {}
    tl = DataLoader(ds, 8, shuffle=False, transform=ds.transform_train(**dn))
    vl = DataLoader(ds, 8, transform=ds.transform_val(**dn),
                    drop_last=False, pad_last=True)
    cfg = TrainConfig(dataset="CIFAR10", arch="ResNet10", batch_size=8,
                      epochs=2, loss="SoftTreeSupLoss", lr=0.05,
                      checkpoint_dir=str(tmp_path))
    return Trainer(
        cfg, module, variables, tl, vl, tree=tree,
        device_normalize=(ds.mean, ds.std) if device_normalize else None,
    )


def test_uint8_batches_reach_the_step(setup):
    _, _, _, ds = setup
    from nbdt_tpu.data import DataLoader

    dl = DataLoader(ds, 8, transform=ds.transform_train(device_normalize=True))
    x, y, valid = next(iter(dl))
    assert x.dtype == np.uint8


def test_device_normalize_matches_host_path(setup, tmp_path):
    module, variables, tree, ds = setup

    host = _trainer(module, variables, tree, ds, tmp_path / "h", False)
    dev = _trainer(module, variables, tree, ds, tmp_path / "d", True)

    # eval on IDENTICAL params (before any update): accuracy must match
    # exactly — argmax is robust to the affine's float association.
    ah = host.evaluate(0, checkpoint=False)
    ad = dev.evaluate(0, checkpoint=False)
    assert ah == ad

    # first step: identical params, inputs equal to float association
    mh = host.train_epoch(0)
    md = dev.train_epoch(0)
    np.testing.assert_allclose(md["loss"], mh["loss"], rtol=1e-5)
    np.testing.assert_allclose(md["acc"], mh["acc"], atol=1e-6)
    # after one update: still tracking (looser — drift compounds)
    mh = host.train_epoch(1)
    md = dev.train_epoch(1)
    np.testing.assert_allclose(md["loss"], mh["loss"], rtol=1e-3)


def test_eval_device_count_fast_path_matches_host_metric(setup, tmp_path):
    """evaluate()'s sync-free device-count path must equal the host-side
    TopK accumulation over the same logits (k=1 and k=5)."""
    import numpy as np

    from nbdt_tpu import metrics
    from nbdt_tpu.data import DataLoader, SyntheticDataset

    module, variables, tree, _ = setup
    ds = SyntheticDataset(num_classes=7, size=20, image_size=16)

    for name in ("top1", "top5"):
        tr = _trainer(module, variables, tree, ds, tmp_path / name, False)
        tr.config.metric = name
        tr.testloader = DataLoader(ds, 8, transform=ds.transform_val(),
                                   drop_last=False, pad_last=True)
        acc_fast = tr.evaluate(0, checkpoint=False)

        ref = getattr(metrics, name)()
        for x, y, valid in tr.testloader:
            logits = np.asarray(tr.eval_step(tr.params, tr.batch_stats,
                                             tr._put(x)))
            ref.forward(logits[valid], np.asarray(y)[valid])
        assert acc_fast == ref.report() * 100.0


def test_label_subset_wrappers_forward_dataset_surface():
    """Include/Exclude/Resample wrappers forward transforms and
    normalization constants to the wrapped dataset (reference reaches them
    via the base class; without forwarding, wrapped runs silently trained
    on raw pixels and --device-normalize refused valid datasets)."""
    from nbdt_tpu.data import SyntheticDataset
    from nbdt_tpu.data.custom import (
        IncludeLabelsDataset,
        ResampleLabelsDataset,
    )

    ds = SyntheticDataset(num_classes=7, size=16, image_size=16)
    w = IncludeLabelsDataset(ds, [0, 1, 2])
    assert np.allclose(w.mean, ds.mean)
    assert callable(w.transform_train)
    x = w.transform_val(device_normalize=True)(
        np.zeros((2, 16, 16, 3), np.uint8))
    assert x.dtype == np.uint8
    r = ResampleLabelsDataset(ds, 0.5)
    assert np.allclose(r.std, ds.std)
    with pytest.raises(AttributeError):
        r.not_a_dataset_attr
