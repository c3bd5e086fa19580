"""Baseline (non-NBDT) single-image classifier CLI (reference nbdt/bin/original).

Same preprocessing and backbone as the ``nbdt`` CLI but prints only the
flat-classifier prediction — for comparing against NBDT decisions.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("image")
    parser.add_argument("--arch", default="wrn28_10_cifar10")
    parser.add_argument("--dataset", default="CIFAR10")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = parser.parse_args(argv)

    from ..utils import enable_compilation_cache, maybe_set_platform

    maybe_set_platform(args.platform)
    enable_compilation_cache()

    from ..bin.nbdt import preprocess
    from ..models import get_model, make_eval_fn
    from ..models.convert import torch_state_dict_to_flax
    from ..models.utils import load_torch_checkpoint
    from ..utils import DATASET_TO_CLASSES, DATASET_TO_NUM_CLASSES, load_image_from_path

    num_classes = DATASET_TO_NUM_CLASSES[args.dataset]
    module = get_model(args.arch, num_classes)
    assert args.checkpoint, "--checkpoint required (offline baseline CLI)"
    variables = torch_state_dict_to_flax(
        load_torch_checkpoint(args.checkpoint), arch=args.arch
    )
    forward = make_eval_fn(module, variables)

    x = preprocess(load_image_from_path(args.image))
    logits = np.asarray(forward(x))
    pred = int(logits.argmax(1)[0])
    classes = DATASET_TO_CLASSES.get(args.dataset)
    print("Prediction:", classes[pred] if classes else pred)


if __name__ == "__main__":
    main()
