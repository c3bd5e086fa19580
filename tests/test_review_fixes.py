"""Regression tests for the round-2 semantic-review fixes (resume LR,
best-acc meta, tree-refresh detection, multi-path hard targets, loud
criterion guards, analyzer train lifecycle, partial final batch)."""

import numpy as np
import pytest


@pytest.fixture()
def tiny_trainer(tmp_path):
    from nbdt_tpu.data import DataLoader, SyntheticDataset
    from nbdt_tpu.hierarchy.build import build_induced_graph
    from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
    from nbdt_tpu.models import init_model
    from nbdt_tpu.trainer import TrainConfig, Trainer
    from nbdt_tpu.tree import Tree

    module, variables = init_model("ResNet10", 7, (16, 16, 3))
    wnids = [f"f{i:08d}" for i in range(7)]
    centers = get_centers_from_flax_params(variables["params"])
    tree = Tree.from_graph(build_induced_graph(wnids, centers), wnids,
                           classes=[f"c{i}" for i in range(7)])
    ds = SyntheticDataset(num_classes=7, size=32, image_size=16)
    tl = DataLoader(ds, 8, shuffle=True, transform=ds.transform_train())
    vl = DataLoader(ds, 8, transform=ds.transform_val(), drop_last=False,
                    pad_last=True)

    def make(epochs=14):
        cfg = TrainConfig(dataset="CIFAR10", arch="ResNet10", batch_size=8,
                          epochs=epochs, loss="SoftTreeSupLoss", lr=0.1,
                          checkpoint_dir=str(tmp_path))
        return Trainer(cfg, module, variables, tl, vl, tree=tree)

    return make


def _schedule_count(opt_state):
    import optax

    counts = []

    def visit(s):
        if isinstance(s, optax.ScaleByScheduleState):
            counts.append(int(s.count))
        return s

    import jax
    jax.tree_util.tree_map(
        visit, opt_state,
        is_leaf=lambda s: isinstance(s, optax.ScaleByScheduleState))
    return counts[0]


def test_resume_fast_forwards_lr_schedule(tiny_trainer):
    """load() must advance the LR-schedule step count to the resumed epoch:
    optimizer.init resets it, and resuming past the 3/7E / 5/7E milestones
    would otherwise train at the initial (up to 100x too hot) LR."""
    tr = tiny_trainer()
    tr.best_acc = 55.0
    path = tr.save(epoch=12, acc=40.0, suffix="-last")

    tr2 = tiny_trainer()
    tr2.load(path)
    assert tr2.start_epoch == 12
    assert _schedule_count(tr2.opt_state) == 12 * len(tr2.trainloader)


def test_resume_last_preserves_best_acc(tiny_trainer):
    """The rolling '-last' checkpoint stores the CURRENT epoch's accuracy;
    resume must restore the historical best, or a worse epoch would
    overwrite the best-accuracy checkpoint."""
    tr = tiny_trainer()
    tr.best_acc = 94.0
    path = tr.save(epoch=10, acc=91.0, suffix="-last")

    tr2 = tiny_trainer()
    tr2.load(path)
    assert tr2.best_acc == 94.0


def test_first_set_epoch_regen_rebuilds_step(tiny_trainer):
    """A hierarchy regeneration on the criterion's very FIRST set_epoch
    (e.g. resume landing on a refresh epoch) must rebuild the jitted step —
    it used to be recorded as 'the initial tree' and swallowed."""
    from nbdt_tpu.rules import to_device_tree

    tr = tiny_trainer()

    class FakeCriterion:
        def __init__(self, jt):
            self.jt = jt

        def set_epoch(self, cur, total):
            # regenerate on the first call, like SoftTreeLoss at offset 0
            self.jt = to_device_tree(tr.tree.arrays)

    tr.criterion_state = FakeCriterion(tr.jt)
    old_step = tr.train_step
    tr.train_epoch(0)
    assert tr.train_step is not old_step, (
        "first-call regeneration did not rebuild the train step")
    assert tr.jt is tr.criterion_state.jt


def test_multipath_target_child_first_wins():
    """When a class sits under two children of one node (multi-path graph),
    the hard-loss target is the FIRST child slot (reference
    model.py:134-136 takes cls[0]), not the last."""
    from nbdt_tpu.hierarchy.digraph import Digraph
    from nbdt_tpu.tree import Tree

    G = Digraph()
    # root -> a, b; a -> leaf0, leaf1; b -> leaf1 (leaf1 has two paths)
    for wnid, label in [("f00000000", "root"), ("f00000001", "a"),
                        ("f00000002", "b"), ("f00000003", "leaf0"),
                        ("f00000004", "leaf1")]:
        G.add_node(wnid, label=label)
    G.add_edge("f00000000", "f00000001")
    G.add_edge("f00000000", "f00000002")
    G.add_edge("f00000001", "f00000003")
    G.add_edge("f00000001", "f00000004")
    G.add_edge("f00000002", "f00000004")

    leaves = ["f00000003", "f00000004"]
    tree = Tree.from_graph(G, leaves, classes=["leaf0", "leaf1"])
    ta = tree.arrays
    root_i = [i for i, n in enumerate(tree.inodes)
              if n.wnid == "f00000000"][0]
    # class 1 (leaf1) is under root's child 0 (a) AND child 1 (b): the
    # reference targets the first -> slot 0
    assert ta.target_child[root_i, 1] == 0


def test_soft_tree_loss_requires_params_fn(synthetic_tree):
    """SoftTreeLoss due for a refresh without params_fn fails loudly
    (the reference crashes too) instead of silently freezing the tree."""
    from nbdt_tpu.losses import SoftTreeLoss

    crit = SoftTreeLoss(tree=synthetic_tree, tree_start_epochs=2,
                        tree_update_every_epochs=3)
    crit.set_epoch(0, 10)  # pre-start: fine
    with pytest.raises(RuntimeError, match="params_fn"):
        crit.set_epoch(2, 10)  # offset 0 -> regeneration due


def test_soft_seg_loss_routes_custom_criterion(synthetic_tree):
    """SoftSegTreeSupLoss applies a custom criterion to BOTH terms — the
    raw maps and the per-pixel bayesian maps — with the tsw weighting
    (reference loss.py:318-327; round 2 rejected custom criteria, round 3
    routes them; numerical parity vs the reference's own class is pinned
    in test_reference_parity.py)."""
    import jax.numpy as jnp

    from nbdt_tpu.losses import SoftSegTreeSupLoss

    calls = []

    def crit(maps, targets):
        calls.append(tuple(maps.shape))
        return jnp.float32(1.0)

    loss = SoftSegTreeSupLoss(tree=synthetic_tree, criterion=crit,
                              tree_supervision_weight=3.0)
    maps = np.random.RandomState(0).randn(2, 4, 4, 7).astype(np.float32)
    labels = np.random.RandomState(1).randint(0, 7, (2, 4, 4))
    total = float(loss(maps, labels.astype(np.int32)))
    assert total == pytest.approx(1.0 + 3.0 * 1.0)
    assert calls == [(2, 4, 4, 7), (2, 4, 4, 7)]  # raw + bayesian maps


def test_analyzer_sees_training_batches(tiny_trainer):
    """Reference lifecycle (main.py:224-245): the analyzer wraps the train
    loop (start_train/end_train) and receives every training batch."""
    tr = tiny_trainer()

    class Recorder:
        def __init__(self):
            self.events = []

        def start_train(self, epoch):
            self.events.append(("start_train", epoch))

        def end_train(self, epoch):
            self.events.append(("end_train", epoch))

        def update_batch(self, outputs, targets, images=None):
            assert outputs.shape[-1] == 7
            assert images is not None and images.ndim == 4
            self.events.append(("batch", len(targets)))

    tr.analyzer = Recorder()
    tr.train_epoch(0)
    kinds = [e[0] for e in tr.analyzer.events]
    assert kinds[0] == "start_train" and kinds[-1] == "end_train"
    assert kinds.count("batch") == len(tr.trainloader)


def test_partial_final_batch_trains(tmp_path):
    """drop_last=False without pad_last yields the final SHORT batch (torch
    DataLoader semantics, reference main.py:136-141) and the jitted step
    handles the second shape."""
    from nbdt_tpu.data import DataLoader, SyntheticDataset
    from nbdt_tpu.hierarchy.build import build_induced_graph
    from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
    from nbdt_tpu.models import init_model
    from nbdt_tpu.trainer import TrainConfig, Trainer
    from nbdt_tpu.tree import Tree

    ds = SyntheticDataset(num_classes=7, size=20, image_size=16)
    dl = DataLoader(ds, 8, shuffle=False, drop_last=False,
                    transform=ds.transform_val())
    sizes = [len(y) for _, y, _ in dl]
    assert sizes == [8, 8, 4]
    assert len(dl) == 3

    module, variables = init_model("ResNet10", 7, (16, 16, 3))
    wnids = [f"f{i:08d}" for i in range(7)]
    centers = get_centers_from_flax_params(variables["params"])
    tree = Tree.from_graph(build_induced_graph(wnids, centers), wnids,
                           classes=[f"c{i}" for i in range(7)])
    vl = DataLoader(ds, 8, transform=ds.transform_val(), drop_last=False,
                    pad_last=True)
    cfg = TrainConfig(dataset="CIFAR10", arch="ResNet10", batch_size=8,
                      epochs=1, loss="SoftTreeSupLoss", lr=0.01,
                      checkpoint_dir=str(tmp_path))
    tr = Trainer(cfg, module, variables, dl, vl, tree=tree)
    stats = tr.train_epoch(0)  # must not crash on the 4-sample batch
    assert np.isfinite(stats["loss"])


def test_hierarchy_centers_from_msgpack(tmp_path):
    """The nbdt-hierarchy CLI advertises .msgpack checkpoints for induced
    hierarchies; get_centers_from_checkpoint must load them (it previously
    fed msgpack bytes to torch.load)."""
    import flax.serialization

    from nbdt_tpu.hierarchy.generate import get_centers_from_checkpoint
    from nbdt_tpu.models import init_model

    module, variables = init_model("ResNet10", 10, (16, 16, 3))
    p = tmp_path / "ckpt.msgpack"
    p.write_bytes(flax.serialization.to_bytes(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    ))
    centers = get_centers_from_checkpoint(str(p))
    np.testing.assert_allclose(
        centers, np.asarray(variables["params"]["linear"]["kernel"]).T
    )


def test_superclass_nbdt_empty_mapping_reports_zero(synthetic_tree):
    """SuperclassNBDT with zero mapped classes must report 0% like its
    parent, not crash in np.stack over an empty column list."""
    from nbdt_tpu.analysis import SuperclassNBDT

    an = SuperclassNBDT(tree=synthetic_tree,
                        superclass_wnids=["n99999999"])
    an.start_test(0)
    logits = np.random.RandomState(0).randn(4, len(synthetic_tree.classes))
    an.update_batch(logits, np.zeros(4, np.int64))
    assert an.accuracy == 0


def test_mini_corpus_keeps_all_parents_multipath(tmp_path):
    """A multi-path (DAG) hierarchy node with several parents must keep
    EVERY hypernym in the derived mini corpus (overwriting kept only the
    last-seen parent, silently breaking hypernym closures)."""
    import json

    from nbdt_tpu.hierarchy.wnid import (
        clear_mini_corpus,
        install_mini_corpus,
        mini_corpus_from_graph_json,
        wnid_to_synset,
    )

    graph = {
        "directed": True,
        "nodes": [{"id": "n00000001", "label": "root"},
                  {"id": "n00000002", "label": "a"},
                  {"id": "n00000003", "label": "b"},
                  {"id": "n00000004", "label": "leaf"}],
        "links": [{"source": "n00000001", "target": "n00000002"},
                  {"source": "n00000001", "target": "n00000003"},
                  {"source": "n00000002", "target": "n00000004"},
                  {"source": "n00000003", "target": "n00000004"}],
    }
    p = tmp_path / "graph-wordnet-multi.json"
    p.write_text(json.dumps(graph))
    try:
        install_mini_corpus(mini_corpus_from_graph_json(str(p)))
        leaf = wnid_to_synset("n00000004")
        parents = {s.wnid for s in leaf.hypernyms()}
        assert parents == {"n00000002", "n00000003"}
    finally:
        clear_mini_corpus()


def test_eval_only_seeds_analyzer_epoch(tiny_trainer):
    """--eval runs never pass through fit(); evaluate() must seed the
    analyzer epoch so '{epoch}' output paths don't render as 'None'."""
    from nbdt_tpu.analysis import SoftEmbeddedDecisionRules

    tr = tiny_trainer(epochs=1)
    an = SoftEmbeddedDecisionRules(tree=tr.tree)
    tr.analyzer = an
    assert an.epoch is None
    tr.evaluate(0, checkpoint=False)
    assert an.epoch == 0


def _multipath_tree():
    from nbdt_tpu.hierarchy.digraph import Digraph
    from nbdt_tpu.tree import Tree

    G = Digraph()
    # root -> {A, B}; A -> {l0, l1}; B -> {l1, l2}: l1 has two parents
    for wnid, label in [("f00000000", "root"), ("f00000001", "A"),
                        ("f00000002", "B"), ("f00000003", "l0"),
                        ("f00000004", "l1"), ("f00000005", "l2")]:
        G.add_node(wnid, label=label)
    for u, v in [("f00000000", "f00000001"), ("f00000000", "f00000002"),
                 ("f00000001", "f00000003"), ("f00000001", "f00000004"),
                 ("f00000002", "f00000004"), ("f00000002", "f00000005")]:
        G.add_edge(u, v)
    leaves = ["f00000003", "f00000004", "f00000005"]
    return Tree.from_graph(G, leaves, classes=["l0", "l1", "l2"])


def test_hard_traverse_multipath_matches_greedy_walk():
    """On a multi-path (DAG) hierarchy the closed-form hard traverse must
    agree with the literal greedy walk — the closed form's unique-path
    invariant breaks for multi-parent leaves (path_len counts slots on
    BOTH parents), so such trees dispatch to the scan walk."""
    import jax.numpy as jnp

    from nbdt_tpu.rules import (
        get_all_node_outputs,
        hard_forward,
        hard_traverse,
        hard_traverse_scan,
        to_device_tree,
    )

    tree = _multipath_tree()
    assert tree.arrays.is_multipath
    jt = to_device_tree(tree.arrays)
    logits = jnp.asarray(
        np.random.RandomState(0).randn(64, 3).astype(np.float32)
    )
    outs = get_all_node_outputs(logits, jt)
    closed = np.asarray(hard_traverse(outs.preds, jt))
    scan = np.asarray(hard_traverse_scan(outs.preds, jt))
    np.testing.assert_array_equal(closed, scan)
    # and the one-hot forward agrees with the walk's leaf
    oh = np.asarray(hard_forward(logits, jt))
    np.testing.assert_array_equal(oh.argmax(-1), scan)


def test_hard_rules_decisions_consistent_on_multipath():
    """HardEmbeddedDecisionRules on a DAG: the returned logits' argmax must
    be the SAME leaf the decision path walks to."""
    from nbdt_tpu.rules import HardEmbeddedDecisionRules

    tree = _multipath_tree()
    rules = HardEmbeddedDecisionRules(tree=tree)
    logits = np.random.RandomState(1).randn(32, 3).astype(np.float32)
    out, decisions = rules.forward_with_decisions(logits)
    preds = np.asarray(out).argmax(-1)
    for b, decision in enumerate(decisions):
        walked = decision[-1]["node"].wnid
        assert tree.wnids_leaves[preds[b]] == walked, b


def test_tree_arrays_unknown_leaf_raises_clearly():
    """A graph leaf absent from the class wnid list is tolerated by the
    host Tree but cannot be represented by the device arrays — compiling
    must raise a descriptive error, not KeyError."""
    from nbdt_tpu.hierarchy.digraph import Digraph
    from nbdt_tpu.tree import Tree

    G = Digraph()
    for wnid in ("f00000000", "f00000001", "f00000002", "f00000009"):
        G.add_node(wnid, label=wnid)
    G.add_edge("f00000000", "f00000001")
    G.add_edge("f00000000", "f00000002")
    G.add_edge("f00000000", "f00000009")  # extra leaf, not a class
    tree = Tree.from_graph(G, ["f00000001", "f00000002"], classes=["a", "b"])
    with pytest.raises(ValueError, match="not in the class wnid list"):
        tree.arrays


def test_rules_outputs_are_tagged():
    """Rules-level forward outputs carry _nbdt_output_flag like the
    reference (model.py:198, 272), so the tree-loss guard fires for
    direct rules usage too."""
    from nbdt_tpu.losses import assert_output_not_nbdt
    from nbdt_tpu.rules import (
        HardEmbeddedDecisionRules,
        SoftEmbeddedDecisionRules,
    )

    tree = _multipath_tree()
    logits = np.random.RandomState(2).randn(4, 3).astype(np.float32)
    for Rules in (SoftEmbeddedDecisionRules, HardEmbeddedDecisionRules):
        out = Rules(tree=tree)(logits)
        with pytest.raises(AssertionError):
            assert_output_not_nbdt(out)


def test_topk_scalar_target():
    """Single-sample convenience: 1-D outputs with a scalar target."""
    from nbdt_tpu.metrics import top1

    m = top1()
    assert m(np.array([0.1, 0.9, 0.0]), 1) == 1
    assert m(np.array([0.1, 0.9, 0.0]), np.int64(2)) == 0
    assert m.correct == 1 and m.total == 2


def test_loss_cli_names_match_reference_registry():
    """--loss choices mirror the reference registry exactly (loss.py:19-24)
    — lowercase helper fns leaking in crashed the trainer post-setup."""
    from nbdt_tpu import losses

    assert set(losses.names) == {
        "HardTreeSupLoss", "SoftTreeSupLoss", "SoftTreeLoss",
        "CrossEntropyLoss",
    }


def test_fused_head_odd_batch_no_overpad():
    """Batches just above a tile multiple must pad only to the sublane
    tile, not to the next block_b multiple (B=40/block 32 previously
    computed 64 rows)."""
    import jax.numpy as jnp

    from nbdt_tpu.ops.soft_traversal import fused_soft_head, prepare_head_constants
    from nbdt_tpu.rules import soft_forward, to_device_tree

    tree = _multipath_tree()
    jt = to_device_tree(tree.arrays)
    rng = np.random.RandomState(3)
    kernel = rng.randn(8, 3).astype(np.float32)
    bias = rng.randn(3).astype(np.float32)
    hc = prepare_head_constants(tree.arrays, kernel, bias)
    feats = rng.randn(40, 8).astype(np.float32)
    (leaf,) = fused_soft_head(jnp.asarray(feats), hc, block_b=32,
                              want_aux=False, interpret=True)
    ref = soft_forward(jnp.asarray(feats @ kernel + bias), jt)
    # the kernel emits leaf LOG-probs; soft_forward returns the raw product
    np.testing.assert_allclose(np.exp(np.asarray(leaf)[:, :3]),
                               np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_cli_subset_wraps_test_split_too():
    """--include-labels must filter BOTH splits like the reference's
    wrapper dataset classes (--dataset CIFAR10IncludeLabels instantiates
    train and test): an unwrapped test set reports accuracy over the full
    label space while training on the subset."""
    import argparse

    from nbdt_tpu.main import build_datasets, get_parser

    args = get_parser().parse_args([
        "--dataset", "CIFAR10", "--synthetic", "--include-labels", "0", "1",
        "--batch-size", "8",
    ])
    trainset, testset = build_datasets(args)
    train_labels = {trainset[i][1] for i in range(len(trainset))}
    test_labels = {testset[i][1] for i in range(len(testset))}
    assert train_labels <= {0, 1}
    assert test_labels <= {0, 1}


def test_cached_lr_schedule_counts_actual_steps(synthetic_tree, tmp_path):
    """Cached mode runs floor(n/B) steps per epoch; the LR milestones and
    resume fast-forward must count those, not len(loader)=ceil."""
    from nbdt_tpu.data import DataLoader, SyntheticDataset
    from nbdt_tpu.models import init_model
    from nbdt_tpu.trainer import TrainConfig, Trainer

    module, variables = init_model("ResNet10", 7, (16, 16, 3))
    ds = SyntheticDataset(num_classes=7, size=20, image_size=16)
    tl = DataLoader(ds, 8, shuffle=True, transform=ds.transform_train(),
                    drop_last=False, pad_last=True)
    vl = DataLoader(ds, 8, transform=ds.transform_val(), drop_last=False,
                    pad_last=True)
    cfg = TrainConfig(dataset="CIFAR10", arch="ResNet10", batch_size=8,
                      epochs=2, loss="SoftTreeSupLoss", lr=0.1,
                      checkpoint_dir=str(tmp_path), cache_dataset=True)
    tr = Trainer(cfg, module, variables, tl, vl, tree=synthetic_tree)
    assert len(tl) == 3 and tr._steps_per_epoch == 2  # 20 // 8
    tr.train_epoch(0)
    assert _schedule_count(tr.opt_state) == 2


def test_cached_mode_keeps_host_eval_normalize_none(synthetic_tree,
                                                    tmp_path):
    """cache_dataset with HOST-normalizing loaders: the store constants go
    to _store_normalize(_eval) only — writing them into
    device_normalize_eval double-normalized the host eval path that
    disable_test_eval/custom-analyzer runs still use."""
    from nbdt_tpu.data import DataLoader, SyntheticDataset
    from nbdt_tpu.models import init_model
    from nbdt_tpu.trainer import TrainConfig, Trainer

    module, variables = init_model("ResNet10", 7, (16, 16, 3))
    ds = SyntheticDataset(num_classes=7, size=32, image_size=16)
    tl = DataLoader(ds, 8, shuffle=True, transform=ds.transform_train())
    vl = DataLoader(ds, 8, transform=ds.transform_val(), drop_last=False,
                    pad_last=True)
    cfg = TrainConfig(dataset="CIFAR10", arch="ResNet10", batch_size=8,
                      epochs=1, loss="SoftTreeSupLoss",
                      checkpoint_dir=str(tmp_path), cache_dataset=True)
    tr = Trainer(cfg, module, variables, tl, vl, tree=synthetic_tree)
    assert tr.device_normalize is None and tr.device_normalize_eval is None
    assert tr._store_normalize is not None
    assert tr._store_normalize_eval is not None


def test_checkpoint_fname_encodes_label_subset(synthetic_tree, tmp_path):
    """A subset run must not collide with the full run's checkpoint path
    (reference generate_checkpoint_fname encodes include/exclude flags)."""
    from nbdt_tpu.trainer import TrainConfig

    import dataclasses

    from nbdt_tpu.utils import generate_checkpoint_fname

    base = dict(dataset="CIFAR10", arch="ResNet10", path_graph=None,
                loss=["SoftTreeSupLoss"])
    full = generate_checkpoint_fname(**base)
    subset = generate_checkpoint_fname(**base, include_labels=(0, 1))
    assert full != subset

    cfg = TrainConfig(dataset="CIFAR10", arch="ResNet10",
                      include_labels=(0, 1))
    cfg2 = dataclasses.replace(cfg, include_labels=())
    from nbdt_tpu.trainer import Trainer

    # config-level: the two fnames must differ
    assert Trainer.checkpoint_fname(
        type("T", (), {"config": cfg})()
    ) != Trainer.checkpoint_fname(type("T", (), {"config": cfg2})())


def test_save_k_reaches_scoresave():
    """--save-k must reach the ScoreSave analyzer family (it was parsed
    and silently dropped)."""
    from nbdt_tpu.main import build_analyzer, get_parser
    from nbdt_tpu.tree import Tree
    from nbdt_tpu.hierarchy.digraph import Digraph

    args = get_parser().parse_args([
        "--analysis", "TopEntropy", "--save-k", "7",
    ])
    tree = _multipath_tree()
    an = build_analyzer(args, tree, type("DS", (), {"classes": ["a"]})())
    assert an.k == 7


def test_default_image_size_mapping():
    from nbdt_tpu.utils import default_image_size

    assert default_image_size("CIFAR10") == 32
    assert default_image_size("TinyImagenet200") == 64
    assert default_image_size("Imagenet1000") == 224


def test_augment_uint8_grouped_matches_per_image():
    """The grouped-slice vectorization must reproduce the per-image
    crop+flip exactly."""
    from nbdt_tpu.data.transforms import augment_uint8

    rng = np.random.RandomState(0)
    batch = rng.randint(0, 256, (37, 16, 16, 3), np.uint8)
    pad = 3
    ys = rng.randint(0, 2 * pad + 1, 37).astype(np.int32)
    xs = rng.randint(0, 2 * pad + 1, 37).astype(np.int32)
    flips = (rng.rand(37) < 0.5).astype(np.uint8)
    out = augment_uint8(batch, pad, ys, xs, flips)
    padded = np.pad(batch, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    for i in range(37):
        ref = padded[i, ys[i]:ys[i] + 16, xs[i]:xs[i] + 16]
        if flips[i]:
            ref = ref[:, ::-1]
        np.testing.assert_array_equal(out[i], ref, err_msg=str(i))


def test_format_time_reference_semantics():
    from nbdt_tpu.utils import format_time

    assert format_time(0) == "0ms"
    assert format_time(0.123) == "123ms"
    assert format_time(61.5) == "1m1s"
    assert format_time(3600 * 24 + 300) == "1D5m"  # zero hours skipped
    assert format_time(2 * 3600 + 30 * 60 + 5) == "2h30m"  # max two units


def test_get_mean_and_std_constant_dataset():
    from nbdt_tpu.utils import get_mean_and_std

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            img = np.full((8, 8, 3), 128, np.uint8)
            img[:, :, 1] = 64
            return img, 0

    mean, std = get_mean_and_std(DS())
    np.testing.assert_allclose(mean, [128 / 255, 64 / 255, 128 / 255],
                               atol=1e-6)
    np.testing.assert_allclose(std, 0.0, atol=1e-6)


def test_compilation_cache_machine_keyed(monkeypatch, tmp_path):
    """Contract since the CPU-skip change (utils.py enable_compilation_cache):
    CPU-only processes never set a cache dir (XLA:CPU AOT reuse is unsafe
    across hosts — the observed SIGILL-warning source); non-CPU processes
    get a dir keyed by the machine fingerprint as a second line of defense."""
    import jax

    from nbdt_tpu.utils import _machine_tag, enable_compilation_cache

    tag = _machine_tag()
    assert len(tag) == 10 and tag == _machine_tag()  # stable on one host
    monkeypatch.delenv("NBDT_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))
    captured = {}
    monkeypatch.setattr(
        jax.config, "update",
        lambda k, v: captured.__setitem__(k, v),
    )

    # 1) CPU-only process (the test-suite environment): cache must stay off.
    assert (jax.config.jax_platforms or "cpu") == "cpu"
    enable_compilation_cache()
    assert "jax_compilation_cache_dir" not in captured

    # 2) The axon tunnel stalls persisting larger executables (round-5
    # finding: first scanned-conv compile hung >20 min with the cache on,
    # ~25 s off) — default off there too, opt back in via the env var.
    monkeypatch.setattr(
        type(jax.config), "jax_platforms", property(lambda self: "axon,cpu")
    )
    enable_compilation_cache()
    assert "jax_compilation_cache_dir" not in captured

    # 3) Real (non-axon) TPU process: machine-keyed dir is set.
    monkeypatch.setattr(
        type(jax.config), "jax_platforms", property(lambda self: "tpu")
    )
    enable_compilation_cache()
    assert captured["jax_compilation_cache_dir"].endswith(
        f"jax_cache-{tag}"
    )

    # 4) Explicit env override wins everywhere (axon included).
    monkeypatch.setattr(
        type(jax.config), "jax_platforms", property(lambda self: "axon,cpu")
    )
    monkeypatch.setenv("NBDT_COMPILE_CACHE", str(tmp_path / "cc"))
    captured.clear()
    enable_compilation_cache()
    assert captured["jax_compilation_cache_dir"] == str(tmp_path / "cc")

    # 5) ... including on CPU-only processes (the documented
    # "force-enables anywhere" contract; the CPU early-return must not
    # shadow the env escape).
    monkeypatch.setattr(
        type(jax.config), "jax_platforms", property(lambda self: "cpu")
    )
    captured.clear()
    enable_compilation_cache()
    assert captured["jax_compilation_cache_dir"] == str(tmp_path / "cc")


def test_bench_watchdog_salvage_paths():
    """bench.py's whole-run watchdog (round-5 postmortem: a >30 min parent
    tunnel wedge would have ended a driver run with no metric line). Three
    contracts, each in a subprocess since the watchdog hard-exits:
    salvage -> JSON + rc 0; nothing to salvage -> rc 1; disarmed -> no-op."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    repo = str(Path(__file__).resolve().parent.parent)

    def run(state_expr, sleep_s):
        return subprocess.run(
            [sys.executable, "-c", (
                "import sys, time\n"
                "import bench\n"
                "bench.TOTAL_BUDGET_S = 1\n"
                f"bench._arm_watchdog({state_expr})\n"
                f"time.sleep({sleep_s})\n"
                "print('SURVIVED')\n"
            )],
            cwd=repo, capture_output=True, text=True, timeout=60,
        )

    r = run("{'fused': 123456.0}", 30)
    assert r.returncode == 0
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["value"] == 123456.0 and rec["unit"] == "images/sec/chip"
    assert rec["vs_baseline"] > 1000  # vs the historical torch-cpu control
    assert "SURVIVED" not in r.stdout  # hard exit, not a fallthrough

    r = run("{}", 30)
    assert r.returncode == 1 and "{" not in r.stdout

    r = run("{'fused': 5.0, 'done': True}", 3)
    assert r.returncode == 0 and "SURVIVED" in r.stdout
    assert "{" not in r.stdout  # disarmed: no salvage line
