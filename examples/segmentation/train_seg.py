"""Segmentation training with per-pixel tree supervision (SegNBDT pipeline).

The reference keeps its segmentation trainer in a separate repo (SURVEY §2.2
note) and ships only datasets + SegNBDT + SoftSegTreeSupLoss in-library;
this example provides the missing end-to-end loop, TPU-native: a small
encoder-decoder emitting NHWC class maps, one jitted train step whose loss
adds the per-pixel soft tree term (losses.py soft_seg_tree_sup_loss), and
SoftSegNBDT inference at the end.

Run offline (synthetic masks):
    python examples/segmentation/train_seg.py --platform cpu --epochs 2

Real data: --dataset LookIntoPerson|PascalContext|ADE20K --data-root ...
(see nbdt_tpu/data/segmentation.py docstrings for expected layouts).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="synthetic",
                        choices=["synthetic", "PascalContext",
                                 "LookIntoPerson", "ADE20K"])
    parser.add_argument("--data-root", default="./data")
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--crop", type=int, default=64)
    parser.add_argument("--lr", type=float, default=0.05)
    parser.add_argument("--tsw", type=float, default=1.0)
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = parser.parse_args(argv)

    from nbdt_tpu.utils import enable_compilation_cache, maybe_set_platform

    maybe_set_platform(args.platform)
    enable_compilation_cache()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from nbdt_tpu.assets import dataset_to_dummy_wnids
    from nbdt_tpu.data import SegDataLoader, SyntheticSegDataset
    from nbdt_tpu.data.segmentation import ADE20K, LookIntoPerson, PascalContext
    from nbdt_tpu.hierarchy.build import build_induced_graph
    from nbdt_tpu.losses import masked_cross_entropy, soft_seg_tree_sup_loss
    from nbdt_tpu.model import SoftSegNBDT
    from nbdt_tpu.rules import to_device_tree
    from nbdt_tpu.tree import Tree

    if args.dataset == "synthetic":
        num_classes = 20
        train = SyntheticSegDataset(num_classes=num_classes, size=8 * args.batch_size,
                                    image_size=args.crop)
        val = SyntheticSegDataset(num_classes=num_classes, size=2 * args.batch_size,
                                  image_size=args.crop, seed=1)
        val.split = "val"
        classes = train.classes
    else:
        cls = {"PascalContext": PascalContext, "LookIntoPerson": LookIntoPerson,
               "ADE20K": ADE20K}[args.dataset]
        train = cls(root=args.data_root, split="train", crop_size=args.crop)
        val = cls(root=args.data_root, split="val", crop_size=args.crop)
        num_classes = cls.NUM_CLASS
        classes = cls.classes

    class SegNet(nn.Module):
        """Tiny encoder-decoder: 2x down, 2x up, per-pixel class logits."""

        num_classes: int

        @nn.compact
        def __call__(self, x, train: bool = False):
            norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                             momentum=0.9, name=name)
            h = nn.relu(norm("bn1")(nn.Conv(32, (3, 3), name="c1")(x)))
            h = nn.relu(norm("bn2")(nn.Conv(64, (3, 3), strides=(2, 2),
                                            name="c2")(h)))
            h = nn.relu(norm("bn3")(nn.Conv(64, (3, 3), name="c3")(h)))
            h = jax.image.resize(h, (h.shape[0], x.shape[1], x.shape[2],
                                     h.shape[-1]), "nearest")
            return nn.Conv(self.num_classes, (1, 1), name="head")(h)

    module = SegNet(num_classes)
    loader = SegDataLoader(train, args.batch_size, shuffle=True)
    val_loader = SegDataLoader(val, args.batch_size, drop_last=False)
    x0, y0 = next(iter(loader))
    variables = module.init(jax.random.PRNGKey(0), x0)

    # Per-pixel tree: induce from the head's class kernel rows.
    wnids = dataset_to_dummy_wnids("LookIntoPerson")[:num_classes] \
        if num_classes <= 20 else [f"f{i:08d}" for i in range(num_classes)]
    centers = np.asarray(variables["params"]["head"]["kernel"])[0, 0].T
    tree = Tree.from_graph(build_induced_graph(wnids, centers), wnids,
                           classes=list(classes))
    jt = to_device_tree(tree.arrays)

    optimizer = optax.sgd(args.lr, momentum=0.9)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    tsw = args.tsw

    @jax.jit
    def step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            out, mutated = module.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            flat_out = out.reshape(-1, out.shape[-1])
            flat_y = y.reshape(-1)
            loss = masked_cross_entropy(flat_out, flat_y)
            loss += tsw * soft_seg_tree_sup_loss(flat_out, flat_y, jt)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    for epoch in range(args.epochs):
        t0, loss = time.time(), None
        for x, y in loader:
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, jnp.asarray(x), jnp.asarray(y)
            )
        # per-pixel accuracy on valid pixels
        correct = total = 0
        for x, y in val_loader:
            out = module.apply({"params": params, "batch_stats": batch_stats},
                               jnp.asarray(x), train=False)
            pred = np.asarray(out).argmax(-1)
            valid = y >= 0
            correct += int((pred[valid] == y[valid]).sum())
            total += int(valid.sum())
        print(f"epoch {epoch}: loss={float(loss):.4f} "
              f"pixel_acc={100 * correct / max(total, 1):.2f}% "
              f"({time.time() - t0:.1f}s)")

    # SegNBDT per-pixel tree inference over one batch
    model = SoftSegNBDT(dataset=None, model=module, tree=tree,
                        params={"params": params, "batch_stats": batch_stats})
    out = model(x0)
    print("SoftSegNBDT output:", tuple(out.shape))


if __name__ == "__main__":
    main()
