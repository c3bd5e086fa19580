"""Trainer CLI (reference main.py): argparse -> data -> model -> tree ->
loss -> optimizer -> train/test loops with analyzers.

Flag surface mirrors the reference (main.py:28-89 plus the add_arguments
hooks from data/tree/loss/analysis) so reference training commands work
unchanged; reflection-based kwarg plumbing (reference utils.py:78-97) is
replaced by the explicit TrainConfig dataclass.
"""

from __future__ import annotations

import argparse
import sys


def get_parser() -> argparse.ArgumentParser:
    from . import analysis, losses
    from .models import get_model_choices
    from .utils import DATASETS

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="CIFAR10", choices=DATASETS)
    parser.add_argument("--arch", default="ResNet18", choices=get_model_choices())
    parser.add_argument("--epochs", "-e", default=200, type=int)
    parser.add_argument("--batch-size", default=512, type=int)
    parser.add_argument("--lr", default=0.1, type=float)
    parser.add_argument("--loss", default="CrossEntropyLoss",
                        choices=list(losses.names))
    parser.add_argument("--metric", default="top1")
    parser.add_argument("--analysis", default=None, choices=[None, *analysis.names])
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--path-resume", default="")
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--pretrained", action="store_true",
                        help="start from the released reference checkpoint "
                             "for (arch, dataset) — downloads via model_urls "
                             "or reads --checkpoint-path")
    parser.add_argument("--checkpoint-path", default=None,
                        help="local reference .pth (converted to Flax)")
    parser.add_argument("--name", default="")
    parser.add_argument("--data-root", default="./data")
    parser.add_argument("--download", action="store_true")
    parser.add_argument("--synthetic", action="store_true",
                        help="use a synthetic dataset (offline smoke runs)")
    parser.add_argument("--dataset-test", default=None)
    parser.add_argument("--disable-test-eval", action="store_true")
    parser.add_argument("--checkpoint-dir", default="./checkpoint")
    parser.add_argument(
        "--mini-corpus", default=None,
        help="vendored mini WordNet (corpus table JSON or a shipped "
             "wordnet hierarchy JSON) — runs Superclass hypernym mapping "
             "and wordnet flows offline")
    parser.add_argument(
        "--cache-dataset", action="store_true",
        help="upload the full uint8 train set to device HBM once and "
             "gather+augment+normalize inside the jitted step (removes the "
             "per-step host->device transfer bound; CIFAR-scale stores "
             "only)")
    parser.add_argument(
        "--cache-crop-pad", type=int, default=4,
        help="cached-mode augmentation: random-crop padding in pixels "
             "(0 disables the crop; the in-jit analogue of torchvision "
             "RandomCrop(pad))")
    parser.add_argument(
        "--no-cache-flip", action="store_true",
        help="cached-mode augmentation: disable the random horizontal "
             "flip (for datasets whose transform_train has none, e.g. "
             "digits)")
    parser.add_argument(
        "--checkpoint-backend", default="msgpack",
        choices=("msgpack", "orbax"),
        help="orbax = sharding-aware directory checkpoints (each host "
             "writes its own shards; required for multi-host runs whose "
             "arrays are not fully addressable)",
    )
    # tree (reference tree.py:26-35)
    parser.add_argument("--hierarchy", default=None)
    parser.add_argument("--path-graph", default=None)
    parser.add_argument("--path-wnids", default=None)
    # loss weights (reference loss.py:27-79)
    parser.add_argument("--xent-weight", "--xw", type=float, default=1.0)
    parser.add_argument("--xent-weight-end", "--xwe", type=float, default=None)
    parser.add_argument("--xent-weight-power", "--xwp", type=float, default=1.0)
    parser.add_argument("--tree-supervision-weight", "--tsw", type=float, default=1.0)
    parser.add_argument("--tree-supervision-weight-end", "--tswe", type=float,
                        default=None)
    parser.add_argument("--tree-supervision-weight-power", "--tswp", type=float,
                        default=1.0)
    parser.add_argument("--tree-start-epochs", "--tse", type=int, default=67)
    parser.add_argument("--tree-update-every-epochs", "--tueve", type=int, default=10)
    parser.add_argument("--tree-update-end-epochs", "--tuene", type=int, default=120)
    # data subsets (reference data/custom.py:37-41)
    parser.add_argument("--include-labels", nargs="*", type=int, default=())
    parser.add_argument("--exclude-labels", nargs="*", type=int, default=())
    parser.add_argument("--include-classes", nargs="*", type=str, default=())
    parser.add_argument("--probability-labels", default=None)
    # analysis (reference analysis.py:41-44)
    parser.add_argument("--superclass-wnids", nargs="*", type=str, default=None)
    parser.add_argument("--save-k", type=int, default=20)
    parser.add_argument("--visualize-decision-node-wnid", "--vdnw", default=None)
    parser.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                        help="force JAX backend (default: environment's)")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a JAX profiler trace of training into "
                             "DIR (TensorBoard profile / perfetto)")
    parser.add_argument("--remat", action="store_true",
                        help="jax.checkpoint the forward (HBM for FLOPs)")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 conv/matmul compute (params, BN, losses, "
                             "and NBDT node decisions stay f32)")
    parser.add_argument("--bn-impl", default="auto",
                        choices=["auto", "f32", "bf16"],
                        help="BatchNorm batch-statistics dtype on the "
                             "training path (ResNet/WRN families). bf16 "
                             "halves the stat-reduction traffic; measured "
                             "per scale (docs/PERFORMANCE.md): +13.5%% "
                             "ResNet18@32px, -2.6%% WRN@32px, +4.6%% "
                             "WRN@64px, +19%% ResNet50@224px. auto (the "
                             "default) picks bf16 for >=64px images and "
                             "f32 at 32px (torch-parity scale). "
                             "Checkpoint-compatible either way.")
    parser.add_argument("--mesh", action="store_true",
                        help="data-parallel over all local devices (batch "
                             "sharded over a dp mesh; params replicated)")
    parser.add_argument("--zero", action="store_true",
                        help="ZeRO-1: shard optimizer momentum 1/|dp| per "
                             "device (requires --mesh)")
    parser.add_argument("--device-normalize", action="store_true",
                        help="ship raw uint8 batches and normalize on "
                             "device (4x fewer host->device bytes)")
    parser.add_argument("--no-progress", action="store_true",
                        help="disable the per-step progress bar; required "
                             "to reach the sync-free train loop's full "
                             "rate on high-RTT transports (the bar costs "
                             "one host sync per step)")
    # multi-host bootstrap (reference: ClassyVision DDP via
    # torch.distributed.launch, examples/imagenet/classy_train.py:93-106)
    parser.add_argument("--multihost", action="store_true",
                        help="join a multi-host mesh via "
                             "jax.distributed.initialize (implies --mesh); "
                             "each host loads its slice of the batch")
    parser.add_argument("--coordinator-address", default=None,
                        help="host:port of process 0 (or $NBDT_COORDINATOR; "
                             "TPU pods auto-detect)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    return parser


def resolve_bn_impl(bn_impl: str, module, image: int) -> str:
    """Resolve --bn-impl auto to the measured per-scale default.

    BN batch statistics in the stream dtype (bf16) halve the
    stat-reduction HBM traffic; the win grows with spatial size
    (docs/PERFORMANCE.md "BN-statistics probe"): +13.5% ResNet18@32px,
    -2.6% WRN-28-10@32px, +4.6% WRN-28-10@64px, +19% ResNet50@224px.
    auto picks bf16 for >=64px images on archs that expose the knob, and
    f32 at 32px — the scale where the only measured negative lives and
    where the torch train-trajectory parity suite runs. Explicit
    f32/bf16 pass through untouched."""
    if bn_impl != "auto":
        return bn_impl
    return "bf16" if image >= 64 and hasattr(module, "bn_impl") else "f32"


def build_datasets(args):
    from .data import SyntheticDataset, get_dataset, wrap_dataset
    from .utils import DATASET_TO_NUM_CLASSES, default_image_size

    if args.synthetic:
        n = DATASET_TO_NUM_CLASSES[args.dataset]
        n_test = DATASET_TO_NUM_CLASSES.get(
            args.dataset_test or args.dataset, n
        )
        size = default_image_size(args.dataset)
        trainset = SyntheticDataset(n, size=4 * args.batch_size, image_size=size)
        testset = SyntheticDataset(n_test, size=2 * args.batch_size,
                                   image_size=size, seed=1)
    else:
        cls = get_dataset(args.dataset)
        trainset = cls(root=args.data_root, train=True, download=args.download)
        test_name = args.dataset_test or args.dataset
        test_cls = get_dataset(test_name)
        testset = test_cls(root=args.data_root, train=False, download=args.download)
    trainset = wrap_dataset(
        trainset,
        include_labels=args.include_labels,
        exclude_labels=args.exclude_labels,
        include_classes=args.include_classes,
        probability_labels=args.probability_labels,
    )
    # The reference's wrapper DATASET CLASSES (--dataset CIFAR10IncludeLabels)
    # filter BOTH splits; an unwrapped test set would report accuracy over
    # the full label space while training on the subset. An explicit
    # --dataset-test names its own test distribution and stays unwrapped
    # (resampling is a train-only augmentation either way).
    if not args.dataset_test:
        testset = wrap_dataset(
            testset,
            include_labels=args.include_labels,
            exclude_labels=args.exclude_labels,
            include_classes=args.include_classes,
        )
    # Zero-shot guard (reference main.py:131): a test set with a different
    # label space is only allowed when the standard eval is disabled (an
    # analyzer like Superclass then defines the metric).
    assert list(trainset.classes) == list(testset.classes) \
        or args.disable_test_eval, (
        "train/test class mismatch requires --disable-test-eval: "
        f"{trainset.classes[:5]}... vs {testset.classes[:5]}..."
    )
    return trainset, testset


def build_analyzer(args, tree, testset):
    if args.analysis is None:
        return None
    import inspect

    from . import analysis

    cls = getattr(analysis, args.analysis)
    kwargs = {}
    if issubclass(cls, analysis.ScoreSave):
        # --save-k (reference flow); tolerate hand-built namespaces
        save_k = getattr(args, "save_k", None)
        if save_k is not None:
            kwargs["save_k"] = save_k
    # Every rules-driven analyzer (DecisionRules family, the NBDT-entropy
    # scorers, hierarchy-inference visualizer) takes the live tree.
    if "tree" in inspect.signature(cls.__init__).parameters:
        kwargs["tree"] = tree
    if issubclass(cls, analysis.Superclass):
        if args.superclass_wnids is None:
            raise SystemExit(
                f"--analysis {args.analysis} requires --superclass-wnids "
                "(the hypernym wnids defining the superclass label space)"
            )
        kwargs["superclass_wnids"] = args.superclass_wnids
        if args.dataset_test and args.dataset_test != args.dataset:
            kwargs["dataset_test"] = args.dataset_test
    if args.visualize_decision_node_wnid and cls is analysis.VisualizeDecisionNode:
        kwargs["visualize_decision_node_wnid"] = args.visualize_decision_node_wnid
        kwargs["tree"] = tree
    if cls is analysis.ConfusionMatrix or cls is analysis.Noop:
        return cls(classes=testset.classes) if cls is analysis.Noop else cls(
            testset.classes
        )
    return cls(**kwargs)


def main(argv=None):
    args = get_parser().parse_args(argv)

    from .utils import enable_compilation_cache, maybe_set_platform

    maybe_set_platform(args.platform)
    enable_compilation_cache()
    if args.mini_corpus:
        from .hierarchy.wnid import install_mini_corpus

        install_mini_corpus(args.mini_corpus)
    if args.multihost:
        from .parallel import initialize_multihost

        n_procs = initialize_multihost(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        args.mesh = True
        import jax

        print(
            f"==> multihost: process {jax.process_index()}/{n_procs}, "
            f"{len(jax.devices())} global devices"
        )

    from .data import DataLoader, PrefetchLoader
    from .models import init_model
    from .tree import Tree
    from .trainer import TrainConfig, Trainer
    from .utils import (
        Colors,
        DATASET_TO_NUM_CLASSES,
        default_image_size,
        hierarchy_to_path_graph,
    )

    trainset, testset = build_datasets(args)
    num_classes = len(trainset.classes)

    image = default_image_size(args.dataset)
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    module, variables = init_model(args.arch, num_classes, (image, image, 3),
                                   dtype=dtype)
    args.bn_impl = resolve_bn_impl(args.bn_impl, module, image)
    if args.bn_impl != "f32":
        if not hasattr(module, "bn_impl"):
            raise SystemExit(f"--bn-impl is only supported by the "
                             f"ResNet/WRN families, not {args.arch}")
        module = module.clone(bn_impl=args.bn_impl)

    if args.pretrained or args.checkpoint_path:
        # Released-reference warm start (reference main.py:150-157 semantics:
        # --pretrained passes pretrained=True into the arch ctor, which
        # fetches the PLAIN backbone checkpoint from the per-arch url table;
        # the NBDT-trained urls are the fallback).
        from .model import model_urls as nbdt_urls
        from .models import resnet, wideresnet
        from .models.convert import torch_state_dict_to_flax
        from .models.utils import load_state_dict_from_key

        # Backbone tables overwrite NBDT entries on the plain (arch, dataset)
        # key — matching the reference ctor; hierarchy-specific keys exist
        # only in the NBDT table and win when present (valid_keys[-1]).
        urls = {**nbdt_urls, **wideresnet.model_urls, **resnet.model_urls}
        keys = [(args.arch, args.dataset),
                (args.arch, args.dataset, args.hierarchy)]
        state_dict = load_state_dict_from_key(
            keys, urls, pretrained=True,
            checkpoint_path=args.checkpoint_path,
        )
        variables = torch_state_dict_to_flax(state_dict, arch=args.arch)
        Colors.green(f"==> Loaded pretrained weights for {args.arch}/{args.dataset}")

    # Resolve tree (reference loss.py:82-91 set_default_values).
    tree = None
    if args.loss != "CrossEntropyLoss" or args.analysis:
        path_graph = args.path_graph
        if args.hierarchy and not path_graph:
            path_graph = hierarchy_to_path_graph(args.dataset, args.hierarchy)
        if path_graph is None:
            # induce on the fly from the freshly initialized model
            from .hierarchy.generate import generate_hierarchy

            path_graph = generate_hierarchy(
                dataset=args.dataset, method="induced", arch=args.arch,
                params=variables["params"],
                hierarchies_root=args.checkpoint_dir,
            )
        tree = Tree(
            args.dataset, path_graph=path_graph, path_wnids=args.path_wnids,
            classes=list(trainset.classes),
        )

    config = TrainConfig(
        dataset=args.dataset,
        arch=args.arch,
        batch_size=args.batch_size,
        epochs=args.epochs,
        lr=args.lr,
        loss=args.loss,
        tree_supervision_weight=args.tree_supervision_weight,
        tree_supervision_weight_end=args.tree_supervision_weight_end,
        tree_supervision_weight_power=args.tree_supervision_weight_power,
        xent_weight=args.xent_weight,
        xent_weight_end=args.xent_weight_end,
        xent_weight_power=args.xent_weight_power,
        hierarchy=args.hierarchy,
        path_graph=tree.path_graph if tree else None,
        path_wnids=args.path_wnids,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_backend=args.checkpoint_backend,
        cache_dataset=args.cache_dataset,
        cache_crop_pad=args.cache_crop_pad,
        cache_flip=not args.no_cache_flip,
        include_labels=tuple(args.include_labels or ()),
        exclude_labels=tuple(args.exclude_labels or ()),
        include_classes=tuple(args.include_classes or ()),
        name=args.name,
        metric=args.metric,
        disable_test_eval=args.disable_test_eval,
        remat=args.remat,
        tree_start_epochs=args.tree_start_epochs,
        tree_update_every_epochs=args.tree_update_every_epochs,
        tree_update_end_epochs=args.tree_update_end_epochs,
    )

    # Multi-host: batch_size stays global; each host loads its disjoint
    # slice (batch/process_count samples per step per host).
    import jax

    n_procs = jax.process_count() if args.multihost else 1
    proc_id = jax.process_index() if args.multihost else 0
    local_bs = max(1, args.batch_size // n_procs)
    device_normalize = device_normalize_eval = None
    if args.device_normalize:
        for ds_obj, which in ((trainset, args.dataset),
                              (testset, args.dataset_test or args.dataset)):
            if not (hasattr(ds_obj, "mean") and hasattr(ds_obj, "std")):
                raise SystemExit(
                    f"error: --device-normalize: {which} exposes no "
                    "mean/std normalization constants"
                )
        device_normalize = (trainset.mean, trainset.std)
        # The test set normalizes with ITS OWN constants (matches the host
        # transform_val path — they differ in zero-shot --dataset-test runs).
        device_normalize_eval = (testset.mean, testset.std)
    dn = {"device_normalize": True} if device_normalize else {}
    trainloader = PrefetchLoader(DataLoader(
        trainset, local_bs, shuffle=True,
        transform=trainset.transform_train(**dn)
        if hasattr(trainset, "transform_train") else None,
        # Reference parity: torch's DataLoader trains on the final partial
        # batch (drop_last=False, main.py:136-141). The smaller last batch
        # costs ONE extra jit trace (cached across epochs). Mesh runs keep
        # drop_last=True — a partial batch need not divide the dp axis.
        drop_last=args.mesh,
        num_shards=n_procs, shard_id=proc_id,
    ))
    testloader = DataLoader(
        testset, local_bs, shuffle=False,
        transform=testset.transform_val(**dn)
        if hasattr(testset, "transform_val") else None,
        drop_last=False, pad_last=True,
        num_shards=n_procs, shard_id=proc_id,
    )

    analyzer = build_analyzer(args, tree, testset)
    if args.disable_test_eval and (args.analysis is None or args.analysis == "Noop"):
        Colors.red(
            "WARNING: --disable-test-eval turns off the standard test metric; "
            "pass --analysis (e.g. Superclass) to define one."
        )
    mesh = None
    if args.mesh:
        from .parallel import make_mesh

        mesh = make_mesh()
        Colors.cyan(f"==> dp mesh over {mesh.devices.size} devices")
    if args.zero and mesh is None:
        raise SystemExit("error: --zero requires --mesh")
    trainer = Trainer(
        config, module, variables, trainloader, testloader, tree=tree,
        analyzer=analyzer, show_progress=not args.no_progress, mesh=mesh,
        zero=args.zero,
        device_normalize=device_normalize,
        device_normalize_eval=device_normalize_eval,
        inverse_transform=testset.transform_val_inverse()
        if hasattr(testset, "transform_val_inverse") else None,
    )

    if args.loss == "SoftTreeLoss":
        # Self-updating hierarchy (reference loss.py:269-315): regenerate the
        # induced tree from the live params on the configured epoch schedule.
        # The trainer re-jits its step when the tree constants change.
        from .losses import SoftTreeLoss

        trainer.criterion_state = SoftTreeLoss(
            tree=tree,
            arch=args.arch,
            checkpoint_path=args.checkpoint_dir,
            params_fn=lambda: trainer.params,
            tree_start_epochs=args.tree_start_epochs,
            tree_update_every_epochs=args.tree_update_every_epochs,
            tree_update_end_epochs=args.tree_update_end_epochs,
            tree_supervision_weight=args.tree_supervision_weight,
        )

    if args.resume or args.path_resume:
        import os

        # Prefer the rolling last-epoch checkpoint (preemption resume) over
        # the best-accuracy one when both exist. The scan is backend-aware:
        # orbax checkpoints are directories named *.orbax.
        ext = ".orbax" if args.checkpoint_backend == "orbax" else ".msgpack"
        candidates = [args.path_resume] if args.path_resume else [
            os.path.join(args.checkpoint_dir,
                         trainer.checkpoint_fname() + suffix + ext)
            for suffix in ("-last", "")
        ]
        path = next((p for p in candidates if p and os.path.exists(p)), None)
        if path:
            trainer.load(path)
            Colors.green(f"==> Resumed from {path} (epoch {trainer.start_epoch})")
        else:
            Colors.red(f"==> No checkpoint at {candidates[-1]}; starting fresh")

    if args.eval:
        if analyzer is not None:
            analyzer.start_epoch(0)
        acc = trainer.evaluate(0, checkpoint=False)
        if analyzer is not None:
            analyzer.end_epoch(0)
        if args.disable_test_eval and hasattr(analyzer, "accuracy"):
            acc = analyzer.accuracy  # the analyzer defines the metric
        Colors.green(f"==> Eval accuracy: {acc:.2f}%")
        return acc

    if args.profile:
        from .profiling import trace

        with trace(args.profile):
            best = trainer.fit()
    else:
        best = trainer.fit()
    Colors.green(f"==> Best accuracy: {best:.2f}%")
    return best


if __name__ == "__main__":
    main()
