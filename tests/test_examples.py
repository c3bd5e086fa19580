"""The shipped example trainers run end-to-end offline (synthetic data).

Counterparts: reference examples/imagenet (ClassyVision DDP trainer) and
the separate-repo segmentation training the reference points at.
"""

import os
import runpy
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_example(relpath, argv):
    path = os.path.join(REPO, relpath)
    old = sys.argv
    sys.argv = [path] + argv
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = old


def test_imagenet_example_synthetic(capsys):
    _run_example("examples/imagenet/train.py", [
        "--config", os.path.join(REPO, "examples/imagenet/configs/resnet18-nbdt.json"),
        "--synthetic", "--platform", "cpu", "--epochs", "1",
        "--batch-size", "8",
    ])
    out = capsys.readouterr().out
    assert "epoch 0" in out and "loss=" in out
    assert "nan" not in out.lower()


def test_segmentation_example_synthetic(capsys):
    _run_example("examples/segmentation/train_seg.py", [
        "--dataset", "synthetic", "--platform", "cpu", "--epochs", "1",
        "--batch-size", "2", "--crop", "32",
    ])
    out = capsys.readouterr().out
    assert "loss" in out.lower()
    assert "nan" not in out.lower()
