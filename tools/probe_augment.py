"""A/B probe: fused single-gather crop+flip vs the two-gather + masked
reverse formulation it replaced (trainer._device_augment).

Both variants are measured in ONE session (the tunnel's bandwidth varies
session to session, CLAUDE.md), interleaved, two ways:

  1. augment-only microbench (jitted augment over a [B,32,32,3] uint8
     batch, pipelined dispatches)
  2. the full cached multi-step train step (ResNet18, SoftTreeSupLoss,
     steps_per_call scan) — the number that actually matters

Usage: python tools/probe_augment.py [--batch 512] [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fused_device_augment(x, key, crop_pad: int, flip: bool):
    """The probed (and rejected) reformulation: ONE flattened H*W-index
    gather with the flip folded into reversed column indices. Identical
    semantics and RNG stream to trainer._device_augment (pinned bit-exact
    by tests/test_train.py::test_device_augment_exact_numpy_parity against
    the same numpy reference)."""
    import jax
    import jax.numpy as jnp

    B, H, W, C = x.shape
    kc, kf = jax.random.split(key)
    if crop_pad:
        xp = jnp.pad(x, ((0, 0), (crop_pad, crop_pad),
                         (crop_pad, crop_pad), (0, 0)))
        offs = jax.random.randint(kc, (B, 2), 0, 2 * crop_pad + 1)
        rows = offs[:, :1] + jnp.arange(H)[None]
        cols = offs[:, 1:] + jnp.arange(W)[None]
        if flip:
            # flip-after-crop == crop with reversed column indices
            f = jax.random.bernoulli(kf, 0.5, (B,))
            cols = jnp.where(f[:, None], cols[:, ::-1], cols)
        flat = rows[:, :, None] * (W + 2 * crop_pad) + cols[:, None, :]
        x = jnp.take_along_axis(
            xp.reshape(B, -1, C), flat.reshape(B, H * W)[:, :, None], axis=1
        ).reshape(B, H, W, C)
    elif flip:
        f = jax.random.bernoulli(kf, 0.5, (B,))
        x = jnp.where(f[:, None, None, None], x[:, :, ::-1, :], x)
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--steps-per-call", type=int, default=16)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from nbdt_tpu.utils import enable_compilation_cache, maybe_set_platform

    if args.platform:
        maybe_set_platform(args.platform)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import nbdt_tpu.trainer as trainer_mod
    from nbdt_tpu.assets import get_dataset_wnids
    from nbdt_tpu.hierarchy.build import build_induced_graph
    from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
    from nbdt_tpu.models import init_model
    from nbdt_tpu.rules import to_device_tree
    from nbdt_tpu.tree import Tree

    log(f"backend: {jax.default_backend()}")
    B = args.batch
    ship_aug = trainer_mod._device_augment  # the shipped axis-wise form

    # --- 1. augment-only microbench -------------------------------------
    x = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (B, 32, 32, 3), np.uint8))
    key = jax.random.PRNGKey(0)

    def timed(fn, name):
        jfn = jax.jit(lambda a, k: fn(a, k, 4, True))
        jfn(x, key).block_until_ready()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [jfn(x, jax.random.fold_in(key, i)) for i in range(args.iters)]
            s = outs[0].astype(jnp.int32).sum()
            for o in outs[1:]:
                s = s + o.astype(jnp.int32).sum()
            int(s)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        log(f"augment-only {name}: {best * 1e3:.3f} ms/batch")
        return best

    t_fused = timed(fused_device_augment, "fused-1-gather")
    t_ship = timed(ship_aug, "two-gather+reverse")
    log(f"augment micro: fused is {t_ship / t_fused:.2f}x the shipped rate")

    # --- 2. full cached train step --------------------------------------
    module, variables = init_model("ResNet18", 10, (32, 32, 3))
    wnids = get_dataset_wnids("CIFAR10")
    centers = get_centers_from_flax_params(variables["params"])
    tree = Tree.from_graph(build_induced_graph(wnids, centers), wnids,
                           classes=[f"c{i}" for i in range(10)])
    jt = to_device_tree(tree.arrays)
    module16 = module.clone(dtype=jnp.bfloat16)
    optimizer = optax.sgd(0.1, momentum=0.9)

    N = B * args.steps_per_call * 2
    images = jnp.asarray(np.random.RandomState(1).randint(
        0, 256, (N, 32, 32, 3), np.uint8))
    labels = jnp.asarray(np.random.RandomState(2).randint(0, 10, (N,)))
    perm = jnp.asarray(np.random.RandomState(3).permutation(N))
    norm = ((0.4914, 0.4822, 0.4465), (0.2023, 0.1994, 0.2010))

    # host snapshots: the step donates its buffers, so each run gets a
    # fresh device copy (device_put of a donated array raises)
    host_params = jax.tree.map(np.asarray, variables["params"])
    host_stats = jax.tree.map(np.asarray, variables["batch_stats"])

    def build(aug_fn):
        """Build AND compile the step while the augment global is patched.

        trainer.make_train_step's one_step resolves ``_device_augment``
        from the trainer module namespace at TRACE time (the step's first
        invocation), not at build time — so the compile must happen inside
        the patch window, or every step silently traces whatever the
        global holds when run() first calls it.
        """
        trainer_mod._device_augment = aug_fn
        try:
            step = trainer_mod.make_train_step(
                module16, optimizer, "SoftTreeSupLoss", jt, cached=True,
                batch_size=B, normalize=norm,
                steps_per_call=args.steps_per_call)
            params = jax.device_put(host_params)
            stats = jax.device_put(host_stats)
            opt = optimizer.init(params)
            out = step(params, stats, opt, images, labels, perm,
                       jnp.int32(0), jax.random.PRNGKey(0),
                       jnp.float32(1), jnp.float32(1))
            jax.block_until_ready(out[:3])
        finally:
            trainer_mod._device_augment = ship_aug
        return step

    def run(step, name):
        params = jax.device_put(host_params)
        stats = jax.device_put(host_stats)
        opt = optimizer.init(params)
        rng = jax.random.PRNGKey(0)
        out = step(params, stats, opt, images, labels, perm,
                   jnp.int32(0), rng, jnp.float32(1), jnp.float32(1))
        jax.block_until_ready(out[:3])
        params, stats, opt = out[:3]
        best = 1e9
        for r in range(4):
            t0 = time.perf_counter()
            out = step(params, stats, opt, images, labels, perm,
                       jnp.int32(0), rng, jnp.float32(1), jnp.float32(1))
            jax.block_until_ready(out[:3])
            params, stats, opt = out[:3]
            dt = (time.perf_counter() - t0) / args.steps_per_call
            best = min(best, dt)
        ips = B / best
        log(f"cached-step {name}: {best * 1e3:.2f} ms/step = {ips:,.0f} imgs/s")
        return ips

    step_fused = build(fused_device_augment)
    step_ship = build(ship_aug)
    r_f1 = run(step_fused, "fused-1-gather")
    r_s1 = run(step_ship, "two-gather+reverse")
    r_f2 = run(step_fused, "fused-1-gather (2nd)")
    r_s2 = run(step_ship, "two-gather+reverse (2nd)")
    r_fused, r_ship = max(r_f1, r_f2), max(r_s1, r_s2)
    log(f"RESULT: fused {r_fused:,.0f} vs shipped {r_ship:,.0f} imgs/s "
        f"({r_fused / r_ship:.3f}x)")


if __name__ == "__main__":
    main()
