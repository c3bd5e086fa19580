"""Hierarchy generation CLI (reference nbdt/bin/nbdt-hierarchy).

Generates a hierarchy (induced/wordnet/random), validates it, and writes an
HTML visualization. The induced method takes FC-layer centers from a
checkpoint (torch .pth or this repo's .msgpack) or an arch's random init.
"""

from __future__ import annotations

import argparse


def get_parser() -> argparse.ArgumentParser:
    from ..utils import DATASETS, METHODS

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="CIFAR10", choices=DATASETS)
    parser.add_argument("--method", default="induced", choices=METHODS)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--branching-factor", type=int, default=2)
    parser.add_argument("--extra", type=int, default=0,
                        help="percent extra nodes to add")
    parser.add_argument("--no-prune", action="store_true")
    parser.add_argument("--fname", default="")
    parser.add_argument("--path", default="")
    parser.add_argument("--single-path", action="store_true")
    parser.add_argument("--induced-linkage", default="ward")
    parser.add_argument("--induced-affinity", default="euclidean")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--arch", default=None)
    parser.add_argument("--wnids-root", default="./nbdt_tpu/wnids")
    parser.add_argument("--hierarchies-root", default=None)
    parser.add_argument("--vis-out-dir", default="out")
    parser.add_argument("--no-vis", action="store_true")
    return parser


def main(argv=None):
    args = get_parser().parse_args(argv)

    from ..assets import get_dataset_wnids
    from ..hierarchy.generate import generate_hierarchy, test_hierarchy
    from ..hierarchy.vis import generate_hierarchy_vis

    wnids = get_dataset_wnids(args.dataset)

    centers = None
    if args.method == "induced" and not args.checkpoint:
        # induce from a randomly initialized arch (reference falls back to
        # pretrained models; offline we use the registered arch's init)
        assert args.arch, "--arch or --checkpoint required for induced"
        from ..models import init_model

        num_classes = len(wnids)
        size = 64 if args.dataset == "TinyImagenet200" else 32
        _, variables = init_model(args.arch, num_classes, (size, size, 3))
        from ..hierarchy.generate import get_centers_from_flax_params

        centers = get_centers_from_flax_params(variables["params"])

    path = generate_hierarchy(
        dataset=args.dataset,
        method=args.method,
        seed=args.seed,
        branching_factor=args.branching_factor,
        extra=args.extra,
        no_prune=args.no_prune,
        fname=args.fname,
        path=args.path,
        single_path=args.single_path,
        induced_linkage=args.induced_linkage,
        induced_affinity=args.induced_affinity,
        checkpoint=args.checkpoint,
        arch=args.arch,
        centers=centers,
        wnids=wnids,
        hierarchies_root=args.hierarchies_root,
    )
    test_hierarchy(args.dataset, path, wnids=wnids)
    if not args.no_vis:
        generate_hierarchy_vis(args.dataset, path, out_dir=args.vis_out_dir)


if __name__ == "__main__":
    main()
