"""Training perf at reference-recipe scale, in ONE TPU session.

Round-3 left three training-perf gaps (VERDICT r3 item 3): the training
table stopped at ResNet18/CIFAR, there was no number for WRN-28-10 — the
reference's actual headline recipe
(/root/reference/scripts/gen_train_eval_wideresnet.sh, main.py:207-210) —
no ImageNet-scale (224px, C=1000 tree) training measurement, and the 21%
BN-statistics cost was declared "inherent" without a mitigation probe on
the *training* path. This measures all three:

    wrn          WRN-28-10 / CIFAR10 / SoftTreeSupLoss, bf16,
                 --cache-dataset: imgs/s, ms/step, MFU, epoch turnaround
                 (train + one-dispatch eval), at the recipe batch (128)
                 and the throughput batch (512).
    bn           BN-stats probe on the TRAINING path: bn_impl="f32"
                 (torch-parity default) vs "bf16" (norm + batch-stat
                 reductions in the stream dtype) on ResNet18@512 and
                 WRN-28-10@512 — win or recorded negative.
    imagenet     ResNet50 @ 224px, 1000-class induced tree,
                 SoftTreeSupLoss, bf16, device-cached store.

All epochs are warm best-of-N (first epoch absorbs compiles and is
discarded). Per-image forward FLOPs are counted conv-by-conv (2 FLOPs per
MAC, the convention of docs/PERFORMANCE.md); training steps are costed at
3x forward. Usage:

    python tools/probe_train_scale.py [--phases wrn,bn,tiny,imagenet]

(`tiny` = WRN-28-10 @64px, the TinyImagenet tsw=10 recipe scale — the
rung whose +4.6% bf16-BN result backs resolve_bn_impl's auto default.)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()
PEAK_TFLOPS = 197.0  # v5e bf16

# Forward GFLOP/image, counted conv-by-conv at 2 FLOPs/MAC:
#   WRN-28-10 @ 32px: init 0.001 + stage1 3.356 + stage2 3.566 +
#                     stage3 3.566 = 10.49 (matches docs/PERFORMANCE.md)
#   ResNet50 @ 224px: the standard 4.09 GMAC torchvision count
#   ResNet18 @ 32px (CIFAR): 1.111 (docs/PERFORMANCE.md)
#   wrn28_10 @ 64px (TinyImagenet200 variant, adaptive pool): every conv
#   stage runs at 4x the 32px spatial extent -> 4 x 10.49 = 41.96
FWD_GFLOPS = {"wrn28_10_cifar10": 10.49, "resnet50": 8.18, "ResNet18": 1.111,
              "wrn28_10": 41.96}


def log(*a):
    print(f"[{time.time() - T0:7.1f}s]", *a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default="wrn,bn,tiny,imagenet")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--steps-per-call", type=int, default=16)
    ap.add_argument("--wrn-size", type=int, default=25600)
    ap.add_argument("--in-size", type=int, default=6400,
                    help="imagenet-phase synthetic train-store size "
                         "(224px uint8: 6400 imgs = 0.96 GB resident)")
    ap.add_argument("--in-batch", type=int, default=256)
    ap.add_argument("--bn-archs", default="ResNet18,wrn28_10_cifar10",
                    help="archs for the bn phase (ResNet18 alone makes a "
                         "CPU smoke test of the shared run_config path "
                         "feasible — WRN-28-10 compiles for minutes on cpu)")
    args = ap.parse_args()
    phases = set(args.phases.split(","))

    from nbdt_tpu.utils import enable_compilation_cache, maybe_set_platform

    if args.platform:
        maybe_set_platform(args.platform)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from nbdt_tpu.assets import get_dataset_wnids
    from nbdt_tpu.data import DataLoader, SyntheticDataset
    from nbdt_tpu.hierarchy.build import build_induced_graph
    from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
    from nbdt_tpu.models import init_model
    from nbdt_tpu.trainer import TrainConfig, Trainer
    from nbdt_tpu.tree import Tree

    log(f"backend: {jax.default_backend()}")
    results = {}

    def build_tree(variables, dataset, num_classes):
        wnids = get_dataset_wnids(dataset)
        centers = get_centers_from_flax_params(variables["params"])
        return Tree.from_graph(
            build_induced_graph(wnids, centers), wnids,
            classes=[f"c{i}" for i in range(num_classes)])

    def run_config(tag, arch, num_classes, dataset, image, batch, size,
                   fwd_gflops, epochs=None, bn_impl="f32", eval_too=False,
                   remat=False, augment=True):
        epochs = epochs or args.epochs
        t0 = time.time()
        module, variables = init_model(arch, num_classes, (image, image, 3))
        module16 = module.clone(dtype=jnp.bfloat16)
        if bn_impl != "f32":
            module16 = module16.clone(bn_impl=bn_impl)
        tree = build_tree(variables, dataset, num_classes)
        ds = SyntheticDataset(num_classes=num_classes, size=size,
                              image_size=image)
        ds_test = SyntheticDataset(num_classes=num_classes,
                                   size=min(2560, size), image_size=image)
        tl = DataLoader(ds, batch, shuffle=True,
                        transform=ds.transform_train(device_normalize=True))
        vl = DataLoader(ds_test, batch,
                        transform=ds.transform_val(device_normalize=True),
                        drop_last=False, pad_last=True)
        cfg = TrainConfig(dataset=dataset, arch=arch, batch_size=batch,
                          epochs=epochs, loss="SoftTreeSupLoss", lr=0.1,
                          checkpoint_dir="/tmp/probe-train-scale-ckpt",
                          cache_dataset=True, remat=remat,
                          cache_crop_pad=4 if augment else 0,
                          cache_flip=augment,
                          cache_steps_per_call=args.steps_per_call)
        tr = Trainer(cfg, module16, variables, tl, vl, tree=tree)
        log(f"{tag}: built in {time.time() - t0:.0f}s "
            f"(incl. any tunnel-handoff stall)")
        times = []
        for e in range(epochs):
            stats = tr.train_epoch(e)
            times.append(stats["time"])
            log(f"  {tag} epoch {e}: {stats['time']:.2f}s "
                f"({size / stats['time']:,.0f} imgs/s) "
                f"loss={stats['loss']:.3f}")
        best = min(times[1:]) if len(times) > 1 else times[0]
        steps = size // batch
        ips = size / best
        ms_step = best / steps * 1e3
        mfu = ips * 3 * fwd_gflops / 1e3 / PEAK_TFLOPS
        r = {"ips": round(ips, 1), "ms_step": round(ms_step, 2),
             "mfu": round(mfu, 3), "batch": batch}
        if eval_too:
            etimes = []
            for _ in range(3):
                t = time.time()
                tr.evaluate(0, checkpoint=False)
                etimes.append(time.time() - t)
            r["eval_s"] = round(min(etimes[1:]), 3)
            r["eval_ips"] = round(len(ds_test) / min(etimes[1:]), 1)
            r["epoch_turnaround_s"] = round(best + min(etimes[1:]), 3)
        log(f"{tag}: {ips:,.0f} imgs/s, {ms_step:.1f} ms/step, "
            f"{mfu:.0%} MFU" + (f", epoch turnaround "
            f"{r['epoch_turnaround_s']}s" if eval_too else ""))
        print(json.dumps({tag: r}), flush=True)
        results[tag] = r
        return r

    # --- WRN-28-10: the reference's headline recipe ----------------------
    if "wrn" in phases:
        run_config("wrn28_10 b128 (recipe)", "wrn28_10_cifar10", 10,
                   "CIFAR10", 32, 128, args.wrn_size,
                   FWD_GFLOPS["wrn28_10_cifar10"], eval_too=True)
        run_config("wrn28_10 b512", "wrn28_10_cifar10", 10,
                   "CIFAR10", 32, 512, args.wrn_size,
                   FWD_GFLOPS["wrn28_10_cifar10"], eval_too=True)

    # --- BN-statistics probe on the training path -------------------------
    if "bn" in phases:
        bs = min(512, args.wrn_size)
        for arch in args.bn_archs.split(","):
            gf = FWD_GFLOPS[arch]
            a = run_config(f"bn-f32 {arch} b{bs}", arch, 10, "CIFAR10",
                           32, bs, args.wrn_size, gf, bn_impl="f32")
            b = run_config(f"bn-bf16 {arch} b{bs}", arch, 10, "CIFAR10",
                           32, bs, args.wrn_size, gf, bn_impl="bf16")
            speedup = a["ms_step"] / b["ms_step"]
            log(f"bn probe {arch}: bf16 stats {speedup:.3f}x "
                f"({a['ms_step']:.1f} -> {b['ms_step']:.1f} ms/step)")
            print(json.dumps({f"bn-speedup {arch}": round(speedup, 3)}),
                  flush=True)

    # --- TinyImagenet-scale: WRN-28-10 @ 64px (reference tsw=10 recipe,
    # scripts/gen_train_eval_wideresnet.sh + main.py batch default 512) —
    # completes the per-scale training ladder between CIFAR (32px) and
    # ImageNet (224px), and settles the per-scale --bn-impl default.
    if "tiny" in phases:
        gf = FWD_GFLOPS["wrn28_10"]
        size = min(args.wrn_size, 12800)  # 64px store: 12.8k imgs = 157 MB
        a = run_config("wrn28_10 64px b512 (tiny recipe)", "wrn28_10", 200,
                       "TinyImagenet200", 64, 512, size, gf, eval_too=True)
        b = run_config("wrn28_10 64px b512 bn-bf16", "wrn28_10", 200,
                       "TinyImagenet200", 64, 512, size, gf, bn_impl="bf16")
        speedup = a["ms_step"] / b["ms_step"]
        log(f"bn probe wrn28_10@64px: bf16 stats {speedup:.3f}x")
        print(json.dumps({"bn-speedup wrn28_10@64px": round(speedup, 3)}),
              flush=True)

    # --- ImageNet-scale train step ----------------------------------------
    if "imagenet" in phases:
        try:
            run_config(f"resnet50 224px C=1000 b{args.in_batch}",
                       "resnet50", 1000, "Imagenet1000", 224,
                       args.in_batch, args.in_size, FWD_GFLOPS["resnet50"],
                       eval_too=True)
        except Exception as e:  # OOM fallback: halve the batch
            log(f"imagenet phase failed at b{args.in_batch} "
                f"({type(e).__name__}); retrying at b{args.in_batch // 2}")
            run_config(f"resnet50 224px C=1000 b{args.in_batch // 2}",
                       "resnet50", 1000, "Imagenet1000", 224,
                       args.in_batch // 2, args.in_size,
                       FWD_GFLOPS["resnet50"], eval_too=True)

    # --- ImageNet-scale ablation ladder ------------------------------------
    # The first imagenet measurement (b256: 23% MFU, vs 64-69% for the CIFAR
    # recipes) needs a cause. Candidates, one axis at a time: HBM pressure
    # (224px b256 resnet50 train activations overflow 16 GB -> XLA spills;
    # probe smaller batches + remat), the in-jit augment at 224px, and BN
    # stats at 224px spatial extents.
    if "imagenet-ablate" in phases:
        gf = FWD_GFLOPS["resnet50"]
        common = dict(arch="resnet50", num_classes=1000,
                      dataset="Imagenet1000", image=224, size=args.in_size,
                      fwd_gflops=gf)
        run_config("r50 b64", batch=64, **common)
        run_config("r50 b128", batch=128, **common)
        run_config("r50 b128 remat", batch=128, remat=True, **common)
        run_config("r50 b256 remat", batch=256, remat=True, **common)
        run_config("r50 b128 no-augment", batch=128, augment=False, **common)
        run_config("r50 b128 bn-bf16", batch=128, bn_impl="bf16", **common)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
