"""Config-driven ImageNet NBDT training (reference examples/imagenet/).

The reference wires SoftTreeSupLoss(tsw=5, hierarchy='induced-efficientnet_b7b')
into a ClassyVision DistributedTrainer launched with torch.distributed +
NCCL DDP (reference examples/imagenet/classy_train.py:93-106,
losses/nbdt_losses.py:6-21, configs/resnet18-nbdt.json). This rebuild is the
TPU-native shape of the same job:

- one JSON config describes model/loss/optimizer/schedule (configs/*.json);
- the mesh replaces the process group: the batch shards over ``dp`` and the
  classifier optionally over ``tp``; XLA inserts the gradient all-reduces
  over ICI — there is no explicit communication code;
- the composite LR schedule (linear warmup -> multistep) is optax.

Run (synthetic data when ImageNet is not on disk):
    python examples/imagenet/train.py --config configs/resnet18-nbdt.json \
        --synthetic --platform cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def build_lr_schedule(opt_cfg: dict, steps_per_epoch: int, epochs: int):
    """Composite schedule: linear warmup for `warmup_frac` of training, then
    multistep decay (reference configs/resnet18-nbdt.json optimizer block)."""
    import optax

    sched_cfg = opt_cfg.get("lr", {})
    warmup_frac = sched_cfg.get("warmup_frac", 0.0555)
    start = sched_cfg.get("start_value", 0.1)
    peak = sched_cfg.get("end_value", 0.4)
    values = sched_cfg.get("values", [peak, peak / 10, peak / 100, peak / 1000])
    milestones = sched_cfg.get("milestones", [30, 60, 80])

    total = max(1, epochs * steps_per_epoch)
    warmup_steps = max(1, int(total * warmup_frac))
    warmup = optax.linear_schedule(start, peak, warmup_steps)
    # join_schedules REBASES the second schedule's step count to zero at
    # the boundary, so milestone boundaries must be expressed relative to
    # the end of warmup — absolute steps would fire each decay
    # warmup_steps (~5 epochs) late vs the reference's global-epoch
    # milestones (ClassyVision composite 'fixed' interval scaling).
    boundaries = [m * steps_per_epoch - warmup_steps for m in milestones]
    if any(b < 1 for b in boundaries):
        # Clamping would silently collapse duplicate boundary-1 keys in the
        # piecewise dict, dropping decay factors — a misconfiguration, not
        # something to paper over.
        bad = [m for m, b in zip(milestones, boundaries) if b < 1]
        raise ValueError(
            f"LR milestones {bad} (epochs) fall inside the warmup phase "
            f"({warmup_steps} steps ~= "
            f"{warmup_steps / max(1, steps_per_epoch):.1f} epochs); move "
            "them past warmup or shrink warmup_frac.")
    multistep = optax.piecewise_constant_schedule(
        values[0],
        {b: values[i + 1] / values[i] for i, b in enumerate(boundaries)},
    )
    return optax.join_schedules([warmup, multistep], [warmup_steps])


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--synthetic", action="store_true",
                        help="random data (offline smoke run)")
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    parser.add_argument("--epochs", type=int, default=None,
                        help="override config num_epochs")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree for the classifier")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 conv compute (f32 params/losses)")
    parser.add_argument("--multihost", action="store_true",
                        help="join a multi-host mesh (coordinator/process "
                             "info via flags or NBDT_* env vars)")
    parser.add_argument("--coordinator-address", default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args(argv)

    from nbdt_tpu.utils import enable_compilation_cache, maybe_set_platform

    maybe_set_platform(args.platform)
    enable_compilation_cache()
    if args.multihost:
        from nbdt_tpu.parallel import initialize_multihost

        initialize_multihost(args.coordinator_address, args.num_processes,
                             args.process_id)

    import jax
    import jax.numpy as jnp
    import optax

    from nbdt_tpu.assets import get_dataset_wnids
    from nbdt_tpu.data import DataLoader, PrefetchLoader, SyntheticDataset
    from nbdt_tpu.hierarchy.build import build_induced_graph
    from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
    from nbdt_tpu.losses import cross_entropy, soft_tree_sup_loss
    from nbdt_tpu.metrics import TopK
    from nbdt_tpu.models import init_model
    from nbdt_tpu.parallel import make_mesh, shard_batch, shard_params
    from nbdt_tpu.rules import to_device_tree
    from nbdt_tpu.tree import Tree

    with open(args.config) as f:
        cfg = json.load(f)

    epochs = args.epochs or cfg.get("num_epochs", 90)
    model_cfg = cfg.get("model", {})
    arch = model_cfg.get("arch", "ResNet18")
    num_classes = model_cfg.get("num_classes", 1000)
    image = model_cfg.get("image_size", 224)
    batch = args.batch_size or cfg.get("batch_size", 256)
    loss_cfg = cfg.get("loss", {})
    tsw = loss_cfg.get("tree_supervision_weight", 5.0)
    opt_cfg = cfg.get("optimizer", {})

    # Mesh: all devices (global, after any multihost init) on dp (x tp);
    # the SPMD program below is identical on 1 host or many.
    n_dev = len(jax.devices())
    tp = args.tp if n_dev % max(args.tp, 1) == 0 else 1
    mesh = make_mesh(tp=tp)
    print(f"mesh: dp={mesh.devices.shape[0]} tp={mesh.devices.shape[1]}")

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    module, variables = init_model(arch, num_classes, (image, image, 3),
                                   dtype=dtype)

    # Hierarchy: packaged graph for the configured hierarchy if present,
    # else induce from the (possibly random) classifier weights — offline
    # equivalent of 'induced-efficientnet_b7b'.
    hierarchy = loss_cfg.get("hierarchy")
    wnids = get_dataset_wnids("Imagenet1000")[:num_classes]
    try:
        tree = Tree("Imagenet1000", hierarchy=hierarchy,
                    classes=[f"class{i}" for i in range(num_classes)])
    except Exception:
        centers = get_centers_from_flax_params(variables["params"])
        G = build_induced_graph(wnids, centers)
        tree = Tree.from_graph(
            G, wnids, classes=[f"class{i}" for i in range(num_classes)]
        )
    jt = to_device_tree(tree.arrays)

    if not args.synthetic:
        from nbdt_tpu.data import Imagenet1000

        root = cfg.get("data_root", "./data")
        trainset = Imagenet1000(root=root, train=True)
        testset = Imagenet1000(root=root, train=False)
    else:
        trainset = SyntheticDataset(num_classes, size=2 * batch, image_size=image)
        testset = SyntheticDataset(num_classes, size=batch, image_size=image,
                                   seed=1)
    trainloader = PrefetchLoader(DataLoader(trainset, batch_size=batch,
                                            shuffle=True))
    testloader = DataLoader(testset, batch_size=batch, pad_last=True,
                            drop_last=False)

    schedule = build_lr_schedule(opt_cfg, len(trainloader), epochs)
    optimizer = optax.chain(
        optax.add_decayed_weights(opt_cfg.get("weight_decay", 1e-4)),
        optax.trace(decay=opt_cfg.get("momentum", 0.9)),
        optax.scale_by_learning_rate(schedule),
    )

    params = shard_params(mesh, variables["params"], tp_shard_classifier=tp > 1)
    batch_stats = shard_params(mesh, variables.get("batch_stats", {}))
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            logits, mutated = module.apply(
                {"params": p, "batch_stats": batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            loss = cross_entropy(logits, y)
            loss += tsw * soft_tree_sup_loss(logits, y, jt)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        acc = (jnp.argmax(logits, -1) == y).mean()
        return new_params, new_stats, new_opt, {"loss": loss, "acc": acc}

    @jax.jit
    def eval_step(params, batch_stats, x):
        return module.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )

    with mesh:
        for epoch in range(epochs):
            t0 = time.time()
            m = {}
            for x, y, valid in trainloader:
                x, y = shard_batch(mesh, np.asarray(x), np.asarray(y))
                params, batch_stats, opt_state, m = train_step(
                    params, batch_stats, opt_state, x, y
                )
            top1, top5 = TopK(1), TopK(5)
            for x, y, valid in testloader:
                logits = np.asarray(eval_step(params, batch_stats, jnp.asarray(x)))
                top1.forward(logits[valid], np.asarray(y)[valid])
                top5.forward(logits[valid], np.asarray(y)[valid])
            print(
                f"epoch {epoch}: loss={float(m.get('loss', 0)):.4f} "
                f"top1={top1.report() * 100:.2f}% top5={top5.report() * 100:.2f}% "
                f"({time.time() - t0:.1f}s)"
            )


if __name__ == "__main__":
    main()
