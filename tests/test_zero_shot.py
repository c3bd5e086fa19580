"""Zero-shot superclass eval flow through the CLI (reference main.py:62-72,
131, 272-275 + analysis.py:430-535): train-label subsetting via
--exclude-labels, standard test metric off via --disable-test-eval, accuracy
defined by the Superclass analyzer. Offline, wnid->synset degrades to
FakeSynsets whose only hypernym is themselves, so superclass wnids equal to
leaf wnids exercise the full mapping/masking/argmax path.
"""

import numpy as np
import pytest


@pytest.mark.parametrize("arch", ["ResNet10", "vit_s16"])
def test_zero_shot_superclass_eval_cli(tmp_path, arch):
    """Covers the ViT stretch config too (BASELINE #5: ViT backbone NBDT +
    zero-shot unseen-class eval)."""
    from nbdt_tpu.main import main

    acc = main([
        "--dataset", "CIFAR10", "--arch", arch, "--synthetic",
        "--loss", "CrossEntropyLoss", "--eval", "--batch-size", "16",
        "--exclude-labels", "3",
        "--disable-test-eval", "--analysis", "Superclass",
        # CIFAR10 leaf wnids (airplane, automobile): offline they map only
        # to themselves, giving a 2-superclass problem over those samples.
        "--superclass-wnids", "n02691156", "n02958343",
        "--platform", "cpu", "--checkpoint-dir", str(tmp_path),
    ])
    assert 0 <= acc <= 100


def test_disable_test_eval_skips_standard_metric(tmp_path):
    """With --disable-test-eval and no analyzer metric, the standard eval
    reports 0 (reference: metric.forward is skipped, main.py:272-275)."""
    from nbdt_tpu.main import main

    acc = main([
        "--dataset", "CIFAR10", "--arch", "ResNet10", "--synthetic",
        "--loss", "CrossEntropyLoss", "--eval", "--batch-size", "16",
        "--disable-test-eval",
        "--platform", "cpu", "--checkpoint-dir", str(tmp_path),
    ])
    assert acc == 0.0


def test_dataset_test_mismatch_requires_disable(tmp_path):
    """A test set with a different label space without --disable-test-eval
    must fail loudly (reference main.py:131 assert)."""
    from nbdt_tpu.main import main

    with pytest.raises(AssertionError, match="disable-test-eval"):
        main([
            "--dataset", "CIFAR10", "--arch", "ResNet10", "--synthetic",
            "--loss", "CrossEntropyLoss", "--eval", "--batch-size", "16",
            "--dataset-test", "CIFAR100",
            "--platform", "cpu", "--checkpoint-dir", str(tmp_path),
        ])


def test_metric_flag_honored(tiny_logits_case=None):
    """--metric top5 drives evaluate(): with 7 classes and random logits,
    top5 accuracy must exceed top1 on the same (deterministic) model."""
    from nbdt_tpu.data import DataLoader, SyntheticDataset
    from nbdt_tpu.models import init_model
    from nbdt_tpu.trainer import TrainConfig, Trainer

    module, variables = init_model("ResNet10", 7, (16, 16, 3))
    ds = SyntheticDataset(num_classes=7, size=64, image_size=16)
    vl = DataLoader(ds, 16, transform=ds.transform_val(), drop_last=False,
                    pad_last=True)
    tl = DataLoader(ds, 16, shuffle=True, transform=ds.transform_train())

    accs = {}
    for metric in ("top1", "top5"):
        cfg = TrainConfig(dataset="CIFAR10", arch="ResNet10", batch_size=16,
                          epochs=1, loss="CrossEntropyLoss", metric=metric,
                          checkpoint_dir="/tmp/ckpt-metric")
        tr = Trainer(cfg, module, variables, tl, vl)
        accs[metric] = tr.evaluate(0, checkpoint=False)
    assert accs["top5"] > accs["top1"]
