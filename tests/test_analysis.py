"""Analyzer plugin tests."""

import numpy as np
import pytest


def test_confusion_matrix():
    from nbdt_tpu.analysis import ConfusionMatrix

    cm = ConfusionMatrix(["a", "b", "c"])
    cm.start_epoch(0)
    cm.start_test(0)
    outputs = np.array([[0.9, 0.1, 0.0], [0.1, 0.8, 0.1], [0.0, 0.2, 0.8],
                        [0.7, 0.2, 0.1]])
    targets = np.array([0, 1, 2, 1])
    cm.update_batch(outputs, targets)
    assert cm.m[0, 0] == 1
    assert cm.m[1, 1] == 1
    assert cm.m[1, 0] == 1  # target b predicted a
    recall = cm.recall()
    np.testing.assert_allclose(recall[1], [0.5, 0.5, 0.0])


def test_decision_rules_analyzer(synthetic_tree, rng):
    from nbdt_tpu.analysis import SoftEmbeddedDecisionRules

    an = SoftEmbeddedDecisionRules(tree=synthetic_tree)
    an.start_epoch(0)
    an.start_test(0)
    x = rng.randn(16, 7).astype(np.float32)
    y = rng.randint(0, 7, 16)
    an.update_batch(x, y)
    assert an.metric.total == 16
    an.end_test(0)
    assert 0 <= an.best_accuracy <= 100


def test_entropy_analyzer(synthetic_tree, rng, tmp_path):
    from nbdt_tpu.analysis import Entropy

    an = Entropy(classes=list("abcdefg"),
                 path=str(tmp_path / "e-{epoch}-{time}/img-{suffix}-{i}-{score:.2e}.jpg"),
                 save_k=2)
    an.start_epoch(0)
    an.start_test(0)
    x = rng.randn(16, 7).astype(np.float32)
    images = rng.rand(16, 8, 8, 3).astype(np.float32)
    an.update_batch(x, np.zeros(16, dtype=int), images)
    assert an.i == 16
    assert an.avg > 0
    an.end_test(0)  # writes jpegs
    import glob

    assert len(glob.glob(str(tmp_path / "e-*/*.jpg"))) == 4  # 2 max + 2 min


def test_top_difference(rng):
    from nbdt_tpu.analysis import TopDifference

    an = TopDifference(classes=list("abc"))
    scores = an.score(np.array([[5.0, 0.0, 0.0], [1.0, 1.0, 1.0]]), None, None)
    assert scores[0] > scores[1]


def test_nbdt_entropy_analyzers(synthetic_tree, rng):
    from nbdt_tpu.analysis import NBDTEntropyBottom, NBDTEntropyMaxMin

    x = rng.randn(4, 7).astype(np.float32)
    for cls in (NBDTEntropyMaxMin, NBDTEntropyBottom):
        an = cls(tree=synthetic_tree, classes=synthetic_tree.classes)
        scores = an.score(x, None, None)
        assert len(scores) == 4
        assert all(np.isfinite(scores))


def test_superclass_with_fake_mapping(synthetic_tree, rng):
    """Superclass eval needs WordNet normally; with fake wnids everything
    maps to -1 and the analyzer degrades to zero coverage, not a crash."""
    from nbdt_tpu.analysis import Superclass

    an = Superclass(tree=synthetic_tree, superclass_wnids=["n00015388"])
    an.start_epoch(0)
    an.start_test(0)
    x = rng.randn(8, 7).astype(np.float32)
    y = rng.randint(0, 7, 8)
    an.update_batch(x, y)
    assert an.total == 0  # nothing mapped without the corpus
    an.end_test(0)


def test_visualize_hierarchy_inference(synthetic_tree, rng, tmp_path):
    from nbdt_tpu.analysis import VisualizeHierarchyInference

    an = VisualizeHierarchyInference(
        tree=synthetic_tree, out_dir=str(tmp_path), limit=2
    )
    an.start_epoch(0)
    an.start_test(0)
    x = rng.randn(4, 7).astype(np.float32)
    an.update_batch(x, np.zeros(4, dtype=int))
    import glob

    files = glob.glob(str(tmp_path / "*.html"))
    assert len(files) == 2
    html = open(files[0]).read()
    assert "CONFIG_TREE_DATA" not in html  # substituted


def test_analyzer_receives_unnormalized_images(synthetic_tree):
    """Trainer.evaluate un-normalizes images before handing them to the
    analyzer (reference main.py:276-277 applies transform_val_inverse), so
    image-writing analyzers save real pixels."""
    from nbdt_tpu.data import DataLoader, SyntheticDataset
    from nbdt_tpu.models import init_model
    from nbdt_tpu.trainer import TrainConfig, Trainer

    seen = []

    class Probe:
        def start_test(self, epoch): pass
        def end_test(self, epoch): pass
        def update_batch(self, outputs, targets, images=None):
            seen.append(images)

    ds = SyntheticDataset(num_classes=7, size=16, image_size=16)
    vl = DataLoader(ds, 8, transform=ds.transform_val(), drop_last=False,
                    pad_last=True)
    tl = DataLoader(ds, 8, shuffle=True, transform=ds.transform_train())
    module, variables = init_model("ResNet10", 7, (16, 16, 3))
    cfg = TrainConfig(batch_size=8, epochs=1, loss="CrossEntropyLoss",
                      checkpoint_dir="/tmp/ckpt-inv")
    tr = Trainer(cfg, module, variables, tl, vl, analyzer=Probe(),
                 inverse_transform=ds.transform_val_inverse())
    tr.evaluate(0, checkpoint=False)
    assert seen
    imgs = np.concatenate(seen)
    # un-normalized pixel space: [0, 1], not standardized (which would have
    # negative values and ~unit variance around 0)
    assert imgs.min() >= -1e-5 and imgs.max() <= 1 + 1e-5


def test_build_analyzer_constructs_every_advertised_analyzer(synthetic_tree):
    """Every name in analysis.names must be constructible through the CLI's
    build_analyzer — rules-driven analyzers receive the live tree."""
    import argparse

    from nbdt_tpu import analysis
    from nbdt_tpu.main import build_analyzer

    class DS:
        classes = synthetic_tree.classes

    for name in analysis.names:
        args = argparse.Namespace(
            analysis=name,
            superclass_wnids=[synthetic_tree.wnids_leaves[0]],
            visualize_decision_node_wnid=synthetic_tree.wnids_leaves[0],
            dataset="CIFAR10", dataset_test=None,
        )
        an = build_analyzer(args, synthetic_tree, DS())
        assert an is not None, name


def test_superclass_explicit_mapping(synthetic_tree, rng):
    """mapping= drives zero-shot eval without the WordNet corpus."""
    from nbdt_tpu.analysis import Superclass

    wnids = synthetic_tree.wnids_leaves
    mapping = {wnids[0]: 0, wnids[1]: 0, wnids[2]: 1}
    an = Superclass(tree=synthetic_tree, superclass_wnids=["a", "b"],
                    mapping=mapping)
    an.start_test(0)
    x = rng.randn(16, len(wnids)).astype(np.float32)
    y = rng.randint(0, 3, 16)
    an.update_batch(x, y)
    assert an.total == int((y != 2).sum() + (y == 2).sum() * (mapping.get(wnids[2], -1) >= 0))
    assert 0 <= an.accuracy <= 100


def test_visualize_decision_node_scores_by_logit(synthetic_tree, rng):
    """VisualizeDecisionNode ranks by the RAW node child logit (reference
    analysis.py:586), not softmax probability."""
    from nbdt_tpu.analysis import VisualizeDecisionNode

    tree = synthetic_tree
    # pick a non-root inner or leaf node with a parent
    wnid = tree.wnids_leaves[0]
    an = VisualizeDecisionNode(tree=tree, visualize_decision_node_wnid=wnid)
    x = rng.randn(8, len(tree.classes)).astype(np.float32)
    scores = an.score(x, None, None)

    node = tree.wnid_to_node[wnid]
    parent = node.parent
    out = an.rules.forward_nodes(x)[parent.wnid]
    k = parent.wnid_to_child_index(wnid)
    np.testing.assert_allclose(scores, out["logits"][:, k], rtol=1e-6)


def test_score_save_pixel_contract(tmp_path):
    """ScoreSave's dump contract is explicit, not range-sniffed: uint8
    passes through, [0,1] floats are scaled, and normalized floats outside
    [0,1] raise with guidance (previously they silently wrote garbage)."""
    pytest.importorskip("PIL")
    from nbdt_tpu.analysis import Entropy

    def run(img):
        a = Entropy(classes=["a", "b"], save_k=1,
                    path=str(tmp_path / "s-{suffix}-{i}-{score:.2e}.jpg"))
        a.start_epoch(0)
        a.start_test(0)
        logits = np.array([[2.0, -1.0]], np.float32)
        a.update_batch(logits, np.array([0]), [img])
        a.end_test(0)

    run(np.zeros((8, 8, 3), np.uint8) + 200)            # uint8: as-is
    run(np.full((8, 8, 3), 0.5, np.float32))            # [0,1] float: x255
    with pytest.raises(ValueError, match="transform_val_inverse"):
        run(np.full((8, 8, 3), 2.3, np.float32))        # normalized: loud
