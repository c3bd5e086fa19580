"""Load a pretrained NBDT and run single-image inference with decisions.

Equivalent of the reference's Colab notebook
(examples/load_pretrained_nbdts.ipynb): build SoftNBDT over a released
checkpoint and print the prediction plus the decision path with per-step
confidences.

Offline note: this image has no network egress, so pass --checkpoint with a
locally downloaded reference ``.pth`` (converted automatically), or omit
--pretrained to run a randomly initialized backbone for a smoke test.

    python examples/load_pretrained.py image.png --arch ResNet18 \
        --dataset CIFAR10 [--checkpoint ckpt.pth] [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("image", help="path or URL of the input image")
    parser.add_argument("--dataset", default="CIFAR10")
    parser.add_argument("--arch", default="ResNet18")
    parser.add_argument("--checkpoint", default=None,
                        help="local reference .pth to load")
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = parser.parse_args(argv)

    from nbdt_tpu.utils import (
        DATASET_TO_CLASSES,
        DATASET_TO_NUM_CLASSES,
        load_image_from_path,
        maybe_set_platform,
    )

    maybe_set_platform(args.platform)
    from nbdt_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from nbdt_tpu.data.transforms import CIFAR_MEAN, CIFAR_STD
    from nbdt_tpu.model import SoftNBDT
    from nbdt_tpu.models import init_model

    num_classes = DATASET_TO_NUM_CLASSES[args.dataset]
    module, variables = init_model(args.arch, num_classes, (32, 32, 3))

    # Hierarchy resolution is left entirely to NBDT: it uses the packaged
    # induced graph when present, and otherwise induces one from the
    # LOADED checkpoint's classifier weights (model.py handles the
    # FileNotFoundError fallback). Pre-building a tree here from the
    # random init_model weights would pair a garbage hierarchy with real
    # checkpoint params whenever --checkpoint is given.
    tree = None

    model = SoftNBDT(
        dataset=args.dataset,
        model=module,
        arch=args.arch,
        hierarchy=f"induced-{args.arch}" if tree is None else None,
        tree=tree,
        pretrained=args.checkpoint is not None,
        checkpoint_path=args.checkpoint,
        params=None if args.checkpoint else variables,
    )

    im = load_image_from_path(args.image).convert("RGB").resize((32, 32))
    x = np.asarray(im, dtype=np.float32)[None] / 255.0
    x = (x - CIFAR_MEAN) / CIFAR_STD

    outputs, decisions = model.forward_with_decisions(x)
    classes = DATASET_TO_CLASSES.get(args.dataset)
    pred = int(np.argmax(np.asarray(outputs)[0]))
    name = classes[pred] if classes else f"class{pred}"
    print(f"Prediction: {name}")
    print("Decisions:", ", ".join(
        f"{d['name']} (Confidence: {(1 - d['entropy']) * 100:.2f}%)"
        for d in decisions[0][1:]
    ))


if __name__ == "__main__":
    main()
