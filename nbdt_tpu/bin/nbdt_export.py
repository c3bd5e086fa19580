"""Export a trained NBDT to a self-contained serving artifact.

Usage: nbdt-export --arch ResNet18 --dataset CIFAR10 \
           [--checkpoint ckpt.pth|ckpt.msgpack] [--hierarchy induced-ResNet18] \
           --out nbdt.stablehlo [--f32] [--platforms cpu tpu] [--image-size N]

The artifact embeds the weights and tree constants (StableHLO via
jax.export, symbolic batch dimension): load it with
``nbdt_tpu.serving.load_serving`` — no model code, checkpoint, or hierarchy
JSON needed at serving time. There is no reference counterpart (its only
deployment example rebuilds the model per Flask request, examples/app/
api.py:30-35).
"""

from __future__ import annotations

import argparse

_DEFAULT_SIZE = {"TinyImagenet200": 64, "Imagenet1000": 224}


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--arch", default="ResNet18")
    parser.add_argument("--dataset", default="CIFAR10")
    parser.add_argument("--hierarchy", default=None)
    parser.add_argument("--path-graph", default=None)
    parser.add_argument("--path-wnids", default=None)
    parser.add_argument("--checkpoint", default=None,
                        help="local .pth/.msgpack checkpoint")
    parser.add_argument("--random-init", action="store_true",
                        help="export a randomly initialized backbone "
                             "(offline smoke test of the export pipeline)")
    parser.add_argument("--out", required=True,
                        help="output artifact path (e.g. nbdt.stablehlo)")
    parser.add_argument("--image-size", type=int, default=None,
                        help="input HxW (default: 32; 64 TinyImagenet200; "
                             "224 Imagenet1000)")
    parser.add_argument("--f32", action="store_true",
                        help="keep the backbone in f32 (default: bf16 "
                             "backbone, f32 node decisions)")
    parser.add_argument("--fold-bn", action="store_true",
                        help="fold BatchNorm into conv weights before "
                             "export (ResNet family; +2%% measured, exact "
                             "argmax parity)")
    parser.add_argument("--uint8-input", action="store_true",
                        help="artifact takes raw uint8 NHWC and normalizes "
                             "on device with the dataset's constants (4x "
                             "smaller request payloads)")
    parser.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                        help="force the local JAX backend for the export")
    return parser


def main(argv=None):
    args = get_parser().parse_args(argv)

    from ..utils import enable_compilation_cache, maybe_set_platform

    maybe_set_platform(args.platform)
    enable_compilation_cache()

    from ..model import SoftNBDT
    from ..models import get_model, init_model
    from ..serving import export_serving
    from ..utils import DATASET_TO_NUM_CLASSES

    num_classes = DATASET_TO_NUM_CLASSES[args.dataset]
    size = args.image_size or _DEFAULT_SIZE.get(args.dataset, 32)

    if args.random_init:
        module, variables = init_model(args.arch, num_classes,
                                       (size, size, 3), seed=0)
        nbdt = SoftNBDT(
            dataset=args.dataset, model=module, arch=args.arch,
            hierarchy=args.hierarchy, path_graph=args.path_graph,
            path_wnids=args.path_wnids, params=variables,
        )
    else:
        module = get_model(args.arch, num_classes)
        nbdt = SoftNBDT(
            dataset=args.dataset, model=module, arch=args.arch,
            hierarchy=args.hierarchy, path_graph=args.path_graph,
            path_wnids=args.path_wnids, pretrained=True,
            checkpoint_path=args.checkpoint,
        )

    normalize = None
    if args.uint8_input:
        # The dataset classes own their normalization constants (class
        # attrs; same source --device-normalize uses) — no parallel table
        # to fall out of sync.
        from .. import data

        ds_cls = getattr(data, args.dataset, None)
        if ds_cls is None or not (hasattr(ds_cls, "mean")
                                  and hasattr(ds_cls, "std")):
            raise SystemExit(
                f"--uint8-input: no normalization constants for "
                f"{args.dataset}; use the float-input export"
            )
        normalize = (ds_cls.mean, ds_cls.std)
    path = export_serving(
        module, nbdt.params, nbdt.tree, args.out, image_size=size,
        bf16=not args.f32, platforms=tuple(args.platforms),
        fold_bn=args.fold_bn, uint8_input=args.uint8_input,
        normalize=normalize,
    )
    import os

    print(f"==> Exported {args.arch}/{args.dataset} serving artifact to "
          f"{path} ({os.path.getsize(path) / 1e6:.1f} MB, "
          f"platforms={','.join(args.platforms)}, "
          f"input [b,{size},{size},3])")


if __name__ == "__main__":
    main()
