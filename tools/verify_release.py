#!/usr/bin/env python
"""Turnkey released-checkpoint parity harness.

BASELINE.md's north star — top-1 + decision-path parity against the
released checkpoints (reference README.md:431-438; download machinery
reference nbdt/models/utils.py:83-103) — cannot run in this image (zero
network egress). This tool closes it the minute a checkpoint (and
optionally the real dataset) is staged locally, in ONE command:

    python tools/verify_release.py \
        --checkpoint ckpt-CIFAR10-wrn28_10_cifar10.pth \
        --arch wrn28_10_cifar10 --dataset CIFAR10 --dataset-root ./data

Pipeline: checkpoint -> converter -> dual-report eval (backbone top-1 AND
NBDT soft + hard top-1 in the same pass, reference main.py:261-308
semantics) -> decision-path transcript for the first N val images ->
diff NBDT top-1 against the published accuracy table (reference
README.md:431-438; the README grants ±0.1-0.2%, default tolerance 0.2).
Prints PASS/FAIL and exits 0 (pass) / 1 (fail).

`--val synthetic` runs the identical code path end-to-end on an offline
synthetic val set (how tests/test_verify_release.py validates this tool
without network access). `--reference-transcript` additionally diffs the
per-image decision-path wnid sequences against a previously saved
transcript JSON (e.g. one captured from the reference implementation).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

# Reference README.md:431-438 "Results" table: NBDT top-1 of the released
# checkpoints (WRN-28-10 for CIFAR/TinyImagenet, EfficientNet-B7b ImageNet).
PUBLISHED_TOP1 = {
    "CIFAR10": 97.55,
    "CIFAR100": 82.97,
    "TinyImagenet200": 67.72,
    "Imagenet1000": 76.60,
}


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True,
                        help=".pth (reference format) or .msgpack checkpoint")
    parser.add_argument("--arch", required=True)
    parser.add_argument("--dataset", default="CIFAR10")
    parser.add_argument("--hierarchy", default=None,
                        help="default: induced-<arch>")
    parser.add_argument("--path-graph", default=None)
    parser.add_argument("--path-wnids", default=None)
    parser.add_argument("--val", choices=["real", "synthetic"], default="real",
                        help="'real' loads the staged dataset's val split; "
                        "'synthetic' validates the harness offline")
    parser.add_argument("--dataset-root", default="./data")
    parser.add_argument("--synthetic-size", type=int, default=512,
                        help="val images in --val synthetic mode")
    parser.add_argument("--synthetic-seed", type=int, default=0)
    parser.add_argument("--image-size", type=int, default=None,
                        help="synthetic image size (default: dataset's)")
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--expected-top1", type=float, default=None,
                        help="published NBDT top-1 to verify against "
                        "(default: the reference README table for the "
                        "dataset; pass explicitly for other recipes)")
    parser.add_argument("--tolerance", type=float, default=0.2,
                        help="allowed |measured - expected| in points "
                        "(reference README.md:438 grants ±0.1-0.2)")
    parser.add_argument("--transcript-n", type=int, default=16,
                        help="images to include in the decision transcript")
    parser.add_argument("--report-out", default=None,
                        help="write the full JSON report here")
    parser.add_argument("--reference-transcript", default=None,
                        help="transcript JSON to diff decision paths against")
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    return parser


def _dataset_image_size(dataset: str) -> int:
    return {"CIFAR10": 32, "CIFAR100": 32, "TinyImagenet200": 64,
            "Imagenet1000": 224}.get(dataset, 32)


def _build_valset(args, num_classes):
    from nbdt_tpu.data import get_dataset
    from nbdt_tpu.data.cifar import LearnableSyntheticDataset
    from nbdt_tpu.utils import DATASET_TO_CLASSES

    if args.val == "synthetic":
        size = args.image_size or _dataset_image_size(args.dataset)
        classes = DATASET_TO_CLASSES.get(args.dataset)
        return LearnableSyntheticDataset(
            num_classes=num_classes, size=args.synthetic_size,
            image_size=size, seed=args.synthetic_seed, train=False,
            classes=classes)
    ds_cls = get_dataset(args.dataset)
    try:
        return ds_cls(root=args.dataset_root, train=False)
    except FileNotFoundError as e:
        raise SystemExit(
            f"{e}\nNo staged {args.dataset} at {args.dataset_root}. Stage "
            "the dataset there, or run --val synthetic to validate the "
            "harness offline.")


def _evaluate(model, hard_rules, valset, batch_size):
    """Dual-report eval: backbone, NBDT-soft, and NBDT-hard top-1 from ONE
    backbone pass per batch (reference main.py:261-308 + the DecisionRules
    analyzer re-score, analysis.py:204-237)."""
    import jax
    import jax.numpy as jnp

    backbone = jax.jit(model.model)
    transform = valset.transform_val()
    n = len(valset)
    counts = np.zeros(3, dtype=np.int64)
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        imgs = np.stack([transform(valset.images[i]) for i in idx])
        labels = valset.labels[idx]
        pad = batch_size - len(idx)
        if pad:  # static batch shape for jit; padded rows are not counted
            imgs = np.concatenate([imgs, np.zeros_like(imgs[:pad])])
        logits = np.asarray(backbone(jnp.asarray(imgs)))[: len(idx)]
        soft = np.asarray(model.rules(logits))
        hard = np.asarray(hard_rules(logits))
        counts[0] += int((logits.argmax(1) == labels).sum())
        counts[1] += int((soft.argmax(1) == labels).sum())
        counts[2] += int((hard.argmax(1) == labels).sum())
    return tuple(100.0 * c / n for c in counts)


def _transcript(model, valset, n):
    transform = valset.transform_val()
    n = min(n, len(valset))
    imgs = np.stack([transform(valset.images[i]) for i in range(n)])
    outputs, decisions = model.forward_with_decisions(imgs)
    preds = np.asarray(outputs).argmax(1)
    entries = []
    for i in range(n):
        entries.append({
            "index": i,
            "label": int(valset.labels[i]),
            "prediction": int(preds[i]),
            "predicted_class": model.tree.classes[int(preds[i])],
            "path": [
                {
                    "wnid": (d["node"].wnid if d.get("node") is not None
                             else None),
                    "name": d.get("name"),
                    "prob": float(d.get("prob", float("nan"))),
                    "entropy": float(d.get("entropy", float("nan"))),
                }
                for d in decisions[i]
            ],
        })
    return entries


def _diff_transcripts(ours, theirs):
    """Compare decision-path wnid sequences image-for-image."""
    mismatches = []
    for a, b in zip(ours, theirs):
        wa = [s["wnid"] for s in a["path"]]
        wb = [s["wnid"] for s in b["path"]]
        if wa != wb or a["prediction"] != b["prediction"]:
            mismatches.append(a["index"])
    return mismatches


def main(argv=None):
    args = build_parser().parse_args(argv)

    from nbdt_tpu.utils import (DATASET_TO_NUM_CLASSES,
                                enable_compilation_cache, maybe_set_platform)

    maybe_set_platform(args.platform)
    enable_compilation_cache()

    from nbdt_tpu.model import HardEmbeddedDecisionRules, SoftNBDT
    from nbdt_tpu.models import get_model

    num_classes = DATASET_TO_NUM_CLASSES[args.dataset]
    module = get_model(args.arch, num_classes)
    # checkpoint -> converter -> params, through the same public path the
    # reference-parity tests pin (NBDT._load_pretrained_params).
    model = SoftNBDT(
        dataset=args.dataset, model=module, arch=args.arch,
        hierarchy=args.hierarchy, path_graph=args.path_graph,
        path_wnids=args.path_wnids, pretrained=True,
        checkpoint_path=args.checkpoint,
    )
    hard_rules = HardEmbeddedDecisionRules(tree=model.tree)

    valset = _build_valset(args, num_classes)
    backbone_top1, soft_top1, hard_top1 = _evaluate(
        model, hard_rules, valset, args.batch_size)
    transcript = _transcript(model, valset, args.transcript_n)

    expected = args.expected_top1
    if expected is None and args.val == "real":
        expected = PUBLISHED_TOP1.get(args.dataset)

    report = {
        "checkpoint": args.checkpoint,
        "arch": args.arch,
        "dataset": args.dataset,
        "val": args.val,
        "n_val": len(valset),
        "backbone_top1": round(backbone_top1, 4),
        "nbdt_soft_top1": round(soft_top1, 4),
        "nbdt_hard_top1": round(hard_top1, 4),
        "expected_top1": expected,
        "tolerance": args.tolerance,
        "transcript": transcript,
    }

    checks = []
    if expected is not None:
        delta = soft_top1 - expected
        ok = abs(delta) <= args.tolerance
        checks.append(ok)
        report["top1_delta"] = round(delta, 4)
        print(f"top-1: measured (soft NBDT) {soft_top1:.2f} vs published "
              f"{expected:.2f} (delta {delta:+.2f}, tolerance "
              f"±{args.tolerance}) -> {'OK' if ok else 'MISMATCH'}")
    print(f"backbone top-1 {backbone_top1:.2f} | NBDT soft {soft_top1:.2f} "
          f"| NBDT hard {hard_top1:.2f}  ({len(valset)} images)")

    if args.reference_transcript:
        with open(args.reference_transcript) as f:
            ref = json.load(f)
        ref_entries = ref["transcript"] if isinstance(ref, dict) else ref
        mismatches = _diff_transcripts(transcript, ref_entries)
        ok = not mismatches
        checks.append(ok)
        report["transcript_mismatches"] = mismatches
        print(f"decision paths: {min(len(transcript), len(ref_entries))} "
              f"compared, {len(mismatches)} mismatched "
              f"-> {'OK' if ok else 'MISMATCH: ' + str(mismatches)}")

    report["pass"] = bool(all(checks)) if checks else None
    if args.report_out:
        with open(args.report_out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"report written to {args.report_out}")

    if checks and not all(checks):
        print("FAIL")
        return 1
    print("PASS" if checks else
          "DONE (no expected value / reference transcript to verify "
          "against — report only)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
