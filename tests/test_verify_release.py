"""tools/verify_release.py — the turnkey released-checkpoint parity
harness (BASELINE.md north star; reference README.md:431-438,
models/utils.py:83-103) — validated offline end-to-end: a synthesized
reference-format ``.pth`` + synthetic val set drive the tool's whole path
(converter -> dual-report eval -> transcript -> verdict)."""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="module")
def staged_checkpoint(tmp_path_factory):
    """A reference-format .pth ({net: module.-prefixed state_dict, acc,
    epoch} — the exact layout reference main.py:299-307 saves) synthesized
    from a fresh ResNet10 through the flax->torch exporter."""
    torch = pytest.importorskip("torch")

    from nbdt_tpu.models import init_model
    from nbdt_tpu.models.convert import flax_to_torch_state_dict

    _, variables = init_model("ResNet10", 10, (32, 32, 3), seed=3)
    sd = flax_to_torch_state_dict(variables, arch="ResNet10")
    path = tmp_path_factory.mktemp("release") / "ckpt-CIFAR10-ResNet10.pth"
    torch.save(
        {"net": {f"module.{k}": torch.from_numpy(np.asarray(v))
                 for k, v in sd.items()},
         "acc": 12.3, "epoch": 0},
        path,
    )
    return str(path)


def _run(argv):
    import verify_release

    return verify_release.main(argv)


BASE = ["--arch", "ResNet10", "--dataset", "CIFAR10", "--val", "synthetic",
        "--synthetic-size", "96", "--batch-size", "48",
        "--transcript-n", "8"]


def test_report_only_run(staged_checkpoint, tmp_path):
    """No expected value and no reference transcript: report-only, exit 0,
    all three top-1s and the transcript present."""
    out = tmp_path / "report.json"
    rc = _run(["--checkpoint", staged_checkpoint, *BASE,
               "--report-out", str(out)])
    assert rc == 0
    report = json.loads(out.read_text())
    for k in ("backbone_top1", "nbdt_soft_top1", "nbdt_hard_top1"):
        assert 0.0 <= report[k] <= 100.0
    assert report["pass"] is None
    assert len(report["transcript"]) == 8
    first = report["transcript"][0]["path"]
    assert len(first) >= 2  # root decision + leaf at minimum
    assert all("prob" in step and "name" in step for step in first)


def test_verdict_pass_and_transcript_selfdiff(staged_checkpoint, tmp_path):
    """Measured top-1 vs itself passes; the transcript diffed against the
    tool's own prior output has zero mismatches."""
    out = tmp_path / "r1.json"
    assert _run(["--checkpoint", staged_checkpoint, *BASE,
                 "--report-out", str(out)]) == 0
    measured = json.loads(out.read_text())["nbdt_soft_top1"]

    out2 = tmp_path / "r2.json"
    rc = _run(["--checkpoint", staged_checkpoint, *BASE,
               "--expected-top1", str(measured), "--tolerance", "0.2",
               "--reference-transcript", str(out), "--report-out", str(out2)])
    assert rc == 0
    report = json.loads(out2.read_text())
    assert report["pass"] is True
    assert report["transcript_mismatches"] == []


def test_verdict_fails_on_accuracy_gap(staged_checkpoint, tmp_path):
    out = tmp_path / "r.json"
    assert _run(["--checkpoint", staged_checkpoint, *BASE,
                 "--report-out", str(out)]) == 0
    measured = json.loads(out.read_text())["nbdt_soft_top1"]
    rc = _run(["--checkpoint", staged_checkpoint, *BASE,
               "--expected-top1", str(measured + 5.0), "--tolerance", "0.2"])
    assert rc == 1


def test_val_real_branch_runs_on_staged_pickle(staged_checkpoint, tmp_path):
    """The --val real branch — the one that actually runs on staging day —
    executes end-to-end against a tiny on-disk CIFAR10 test_batch in the
    real loader's python-pickle format (round-4 VERDICT weak #5: only the
    synthetic branch had ever run). Also pins that --val real defaults
    expected_top1 to the published README table, so the verdict against the
    staged checkpoint is a real FAIL (random-init net vs 97.55)."""
    import pickle

    base = tmp_path / "data" / "cifar-10-batches-py"
    base.mkdir(parents=True)
    rng = np.random.RandomState(0)
    n = 50
    with open(base / "test_batch", "wb") as fh:
        pickle.dump(
            {"data": rng.randint(0, 256, size=(n, 3072)).astype(np.uint8),
             "labels": (np.arange(n) % 10).tolist()},
            fh,
        )

    out = tmp_path / "real.json"
    rc = _run(["--checkpoint", staged_checkpoint, "--arch", "ResNet10",
               "--dataset", "CIFAR10", "--val", "real",
               "--dataset-root", str(tmp_path / "data"),
               "--batch-size", "25", "--transcript-n", "4",
               "--report-out", str(out)])
    report = json.loads(out.read_text())
    assert report["val"] == "real" and report["n_val"] == n
    assert report["expected_top1"] == 97.55  # README table default kicks in
    assert rc == 1 and report["pass"] is False  # random init != released
    assert len(report["transcript"]) == 4

    # Missing staged data exits with the actionable SystemExit message.
    with pytest.raises(SystemExit, match="No staged"):
        _run(["--checkpoint", staged_checkpoint, "--arch", "ResNet10",
              "--dataset", "CIFAR10", "--val", "real",
              "--dataset-root", str(tmp_path / "nowhere")])


def test_verdict_fails_on_decision_path_divergence(staged_checkpoint,
                                                   tmp_path):
    """A corrupted reference transcript (one wnid swapped) must flag the
    image and fail — decision-path parity is the README's second axis."""
    out = tmp_path / "r.json"
    assert _run(["--checkpoint", staged_checkpoint, *BASE,
                 "--report-out", str(out)]) == 0
    report = json.loads(out.read_text())
    report["transcript"][3]["path"][0]["wnid"] = "n00000000"
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps(report))

    out2 = tmp_path / "r2.json"
    rc = _run(["--checkpoint", staged_checkpoint, *BASE,
               "--reference-transcript", str(bad), "--report-out", str(out2)])
    assert rc == 1
    assert json.loads(out2.read_text())["transcript_mismatches"] == [3]
