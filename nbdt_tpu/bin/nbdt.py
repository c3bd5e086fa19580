"""Single-image NBDT inference CLI (reference nbdt/bin/nbdt).

Usage: nbdt IMAGE_PATH_OR_URL [--arch wrn28_10_cifar10] [--dataset CIFAR10]
       [--checkpoint /path/to/ckpt.pth] [--hierarchy wordnet]

Prints the prediction plus each intermediate decision with its confidence
(1 - entropy, matching reference bin/nbdt:39-49 — note this can be negative
for wide nodes; preserved for output parity).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def preprocess(image, size: int = 32, mean=None, std=None) -> np.ndarray:
    """Resize -> center crop -> normalize (reference bin/nbdt:23-31)."""
    from ..data.transforms import CIFAR_MEAN, CIFAR_STD

    mean = mean if mean is not None else CIFAR_MEAN
    std = std if std is not None else CIFAR_STD
    w, h = image.size
    scale = size / min(w, h)
    image = image.resize((max(size, int(round(w * scale))),
                          max(size, int(round(h * scale)))))
    w, h = image.size
    left, top = (w - size) // 2, (h - size) // 2
    image = image.crop((left, top, left + size, top + size))
    x = np.asarray(image.convert("RGB"), dtype=np.float32) / 255.0
    x = (x - mean) / std
    return x[None]  # NHWC batch of 1


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("image", help="path or URL of image to classify")
    parser.add_argument("--arch", default="wrn28_10_cifar10")
    parser.add_argument("--dataset", default="CIFAR10")
    parser.add_argument("--hierarchy", default=None)
    parser.add_argument("--path-graph", default=None)
    parser.add_argument("--path-wnids", default=None)
    parser.add_argument("--checkpoint", default=None,
                        help="local .pth/.msgpack checkpoint (offline use)")
    parser.add_argument("--hard", action="store_true", help="use hard rules")
    parser.add_argument("--random-init", action="store_true",
                        help="skip the pretrained checkpoint and run a "
                             "randomly initialized backbone (offline demo "
                             "of the decision-path machinery)")
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = parser.parse_args(argv)
    if args.random_init and args.checkpoint:
        parser.error("--random-init and --checkpoint are mutually exclusive")

    from ..utils import enable_compilation_cache, maybe_set_platform

    maybe_set_platform(args.platform)
    enable_compilation_cache()

    from ..model import HardNBDT, SoftNBDT
    from ..models import get_model, init_model
    from ..utils import DATASET_TO_NUM_CLASSES, load_image_from_path

    num_classes = DATASET_TO_NUM_CLASSES[args.dataset]

    cls = HardNBDT if args.hard else SoftNBDT
    if args.random_init:
        module, variables = init_model(
            args.arch, num_classes, (32, 32, 3), seed=0
        )
        model = cls(
            dataset=args.dataset,
            model=module,
            arch=args.arch,
            hierarchy=args.hierarchy,
            path_graph=args.path_graph,
            path_wnids=args.path_wnids,
            params=variables,
        )
    else:
        module = get_model(args.arch, num_classes)
        model = cls(
            dataset=args.dataset,
            model=module,
            arch=args.arch,
            hierarchy=args.hierarchy,
            path_graph=args.path_graph,
            path_wnids=args.path_wnids,
            pretrained=True,  # checkpoint_path when given, else URL cache
            checkpoint_path=args.checkpoint,
        )

    image = load_image_from_path(args.image)
    x = preprocess(image)
    outputs, decisions = model.forward_with_decisions(x)
    pred = int(np.asarray(outputs).argmax(1)[0])
    cls_name = model.tree.classes[pred]
    print("Prediction:", cls_name, "// Decisions:", ", ".join(
        "{} (Confidence: {:.2f}%)".format(
            info["name"], (1 - info["entropy"]) * 100
        )
        for info in decisions[0]
    ))


if __name__ == "__main__":
    main()
