"""Training-throughput benchmark: host-fed pipeline vs device-resident
cache, plus analyzer-attached eval rate (VERDICT r2 items 5 and 7).

One process does everything (the axon tunnel serves one client; see
CLAUDE.md). Warm epochs only — the first epoch of each config absorbs
compiles and is discarded.

Usage: python tools/bench_train.py [--size 51200] [--batch 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=51200)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--arch", default="ResNet18")
    ap.add_argument("--image", type=int, default=32)
    ap.add_argument("--f32-only", action="store_true",
                    help="skip bf16 configs (CPU smoke)")
    ap.add_argument("--cached-only", action="store_true",
                    help="measure only the device-cached config")
    ap.add_argument("--cached-analyzer-only", action="store_true",
                    help="measure only the cached-store + device-counted "
                         "NBDT analyzer one-dispatch eval (the round-3 "
                         "composition)")
    ap.add_argument("--steps-per-call", type=int, default=16)
    args = ap.parse_args()

    from nbdt_tpu.utils import enable_compilation_cache, maybe_set_platform

    if args.platform:
        maybe_set_platform(args.platform)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nbdt_tpu.analysis import SoftEmbeddedDecisionRules
    from nbdt_tpu.assets import get_dataset_wnids
    from nbdt_tpu.data import DataLoader, SyntheticDataset
    from nbdt_tpu.hierarchy.build import build_induced_graph
    from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
    from nbdt_tpu.models import get_model, init_model
    from nbdt_tpu.trainer import TrainConfig, Trainer
    from nbdt_tpu.tree import Tree

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    t0 = time.time()
    module, variables = init_model(args.arch, 10,
                                   (args.image, args.image, 3))
    module16 = (module if args.f32_only
                else get_model(args.arch, 10, dtype=jnp.bfloat16))
    wnids = get_dataset_wnids("CIFAR10")
    centers = get_centers_from_flax_params(variables["params"])
    tree = Tree.from_graph(build_induced_graph(wnids, centers), wnids,
                           classes=[f"c{i}" for i in range(10)])
    ds = SyntheticDataset(num_classes=10, size=args.size,
                          image_size=args.image)
    ds_test = SyntheticDataset(num_classes=10, size=min(10240, args.size),
                               image_size=args.image)
    log(f"init: {time.time() - t0:.0f}s (includes any tunnel-handoff stall)")

    def epochs(tr, label):
        times = []
        for e in range(args.epochs):
            stats = tr.train_epoch(e)
            times.append(stats["time"])
            log(f"  {label} epoch {e}: {stats['time']:.2f}s "
                f"({args.size / stats['time']:,.0f} imgs/s) "
                f"loss={stats['loss']:.3f}")
        best = min(times[1:]) if len(times) > 1 else times[0]
        log(f"{label}: {args.size / best:,.0f} imgs/s end-to-end (warm best)")
        return args.size / best

    results = {}

    tl = DataLoader(ds, args.batch, shuffle=True,
                    transform=ds.transform_train(device_normalize=True))
    vl = DataLoader(ds_test, args.batch,
                    transform=ds.transform_val(device_normalize=True),
                    drop_last=False, pad_last=True)
    cfg = TrainConfig(dataset="CIFAR10", arch=args.arch,
                      batch_size=args.batch, epochs=args.epochs,
                      loss="SoftTreeSupLoss", lr=0.1,
                      checkpoint_dir="/tmp/bench-train-ckpt")
    # -- device-resident cache + device-counted NBDT analyzer --------------
    # (the round-3 composition: evaluate() is ONE dispatch including the
    # analyzer's re-score; previously the analyzer disabled caching)
    if args.cached_analyzer_only:
        import json

        cfg_ca = TrainConfig(dataset="CIFAR10", arch=args.arch,
                             batch_size=args.batch, epochs=1,
                             loss="SoftTreeSupLoss", lr=0.1,
                             checkpoint_dir="/tmp/bench-train-ckpt",
                             cache_dataset=True,
                             cache_steps_per_call=args.steps_per_call)
        an = SoftEmbeddedDecisionRules(tree=tree)
        tr_ca = Trainer(cfg_ca, module16, variables, tl, vl, tree=tree,
                        analyzer=an)
        assert tr_ca._cached_train is not None, "cache was disabled"
        tr_ca.train_epoch(0)  # also exercises the cached train step
        times = []
        for _ in range(3):
            t = time.time()
            tr_ca.evaluate(0, checkpoint=False)
            times.append(time.time() - t)
        best = min(times[1:])
        rate = len(ds_test) / best
        log(f"eval one-dispatch (cached store + NBDT-Soft analyzer): "
            f"{rate:,.0f} imgs/s (epoch {best:.3f}s, "
            f"NBDT acc {an.accuracy:.2f}%)")
        print(json.dumps({"eval_cached_analyzer": round(rate, 1)}))
        return

    # -- host-fed uint8 pipeline (round-2 best: ~17.3k on the tunnel) ------
    if not args.cached_only:
        tr = Trainer(cfg, module16, variables, tl, vl, tree=tree,
                     device_normalize=(ds.mean, ds.std))
        results["host_fed"] = epochs(tr, "bf16 host-fed uint8")

    # -- device-resident cache ---------------------------------------------
    cfg_c = TrainConfig(dataset="CIFAR10", arch=args.arch,
                        batch_size=args.batch, epochs=args.epochs,
                        loss="SoftTreeSupLoss", lr=0.1,
                        checkpoint_dir="/tmp/bench-train-ckpt",
                        cache_dataset=True,
                        cache_steps_per_call=args.steps_per_call)
    tr_c = Trainer(cfg_c, module16, variables, tl, vl, tree=tree)
    results["cached"] = epochs(
        tr_c, f"bf16 device-cached (K={args.steps_per_call})")
    if args.cached_only:
        times = []
        for _ in range(3):
            t = time.time()
            tr_c.evaluate(0, checkpoint=False)
            times.append(time.time() - t)
        best = min(times[1:])
        results["eval_cached"] = len(ds_test) / best
        log(f"eval one-dispatch (cached store): "
            f"{results['eval_cached']:,.0f} imgs/s (epoch {best:.3f}s)")
        import json

        print(json.dumps({k: round(v, 1) for k, v in results.items()}))
        return

    # -- f32 device-cached (reference precision) ---------------------------
    if not args.f32_only:
        tr_c32 = Trainer(cfg_c, module, variables, tl, vl, tree=tree)
        results["cached_f32"] = epochs(tr_c32, "f32 device-cached")

    # -- eval rates: sync-free with and without a DecisionRules analyzer ---
    def eval_rate(tr, label):
        times = []
        for _ in range(3):
            t = time.time()
            tr.evaluate(0, checkpoint=False)
            times.append(time.time() - t)
        best = min(times[1:])
        log(f"{label}: {len(ds_test) / best:,.0f} imgs/s "
            f"(epoch {best:.2f}s)")
        return len(ds_test) / best

    results["eval_plain"] = eval_rate(tr_c, "eval sync-free (no analyzer)")
    an = SoftEmbeddedDecisionRules(tree=tree)
    tr_an = Trainer(cfg, module16, variables, tl, vl, tree=tree,
                    analyzer=an, device_normalize=(ds.mean, ds.std))
    results["eval_analyzer"] = eval_rate(
        tr_an, "eval sync-free (NBDT-Soft analyzer, device-counted)")
    # control: re-measure the plain eval AFTER the analyzer one, so a
    # tunnel-bandwidth collapse mid-session can't masquerade as analyzer
    # overhead
    results["eval_plain_again"] = eval_rate(
        tr_c, "eval sync-free control (no analyzer, re-measured)")

    import json

    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
