"""ViT-B/16 serving ladder: A/B the 55%-MFU candidates on the chip.

Round-3 left ViT-B/16 at ~3.1k imgs/s (≈55% MFU) blaming the f32
LayerNorms and 197-token attention (docs/PERFORMANCE.md) — nobody tried
the named fixes. This runs them all in ONE session (tunnel bandwidth
varies; only same-session ratios are honest):

    baseline   bf16 stream, f32 flax LayerNorm, flax attention (the
               zoo-table config)
    ln-bf16    LayerNorm computed in the bf16 stream dtype
    attn-jax   jax.nn.dot_product_attention (fused SDPA lowering,
               f32 softmax internally)
    ln-pallas  ops/layernorm.py fused kernel (stats f32, 1 read+1 write)
    combos     ln-bf16+attn-jax, ln-pallas+attn-jax

Each variant is argmax-parity-checked against the baseline on the same
batch BEFORE timing; a JSON line is flushed after every measurement so a
stall keeps completed numbers. Usage:

    python tools/probe_vit.py [--batch 256] [--image 224] [--iters 6]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.time() - T0:7.1f}s]", *a, file=sys.stderr, flush=True)


T0 = time.time()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--batches", default=None,
                    help="comma-separated batch sizes measured in ONE "
                         "session (overrides --batch); the round-5 "
                         "batch-scaling rung")
    ap.add_argument("--image", type=int, default=224)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--arch", default="vit_b16")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset of the ladder")
    args = ap.parse_args()

    from nbdt_tpu.utils import enable_compilation_cache, maybe_set_platform

    if args.platform:
        maybe_set_platform(args.platform)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nbdt_tpu.assets import get_dataset_wnids
    from nbdt_tpu.hierarchy.build import build_induced_graph
    from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
    from nbdt_tpu.models import get_model, init_model
    from nbdt_tpu.rules import soft_forward, to_device_tree
    from nbdt_tpu.tree import Tree

    log(f"backend: {jax.default_backend()}")
    px = args.image
    batches = ([int(b) for b in args.batches.split(",")]
               if args.batches else [args.batch])

    module, variables = init_model(args.arch, 10, (px, px, 3))
    wnids = get_dataset_wnids("CIFAR10")
    centers = get_centers_from_flax_params(variables["params"])
    tree = Tree.from_graph(build_induced_graph(wnids, centers), wnids,
                           classes=[f"c{i}" for i in range(10)])
    jt = to_device_tree(tree.arrays)
    log("model+tree built")

    LADDER = [
        ("baseline", {}),
        ("ln-bf16", {"ln_impl": "bf16"}),
        ("attn-jax", {"attention_impl": "jax"}),
        ("ln-pallas", {"ln_impl": "pallas"}),
        ("ln-bf16+attn-jax", {"ln_impl": "bf16", "attention_impl": "jax"}),
        ("ln-pallas+attn-jax", {"ln_impl": "pallas",
                                "attention_impl": "jax"}),
    ]
    if args.variants:
        want = set(args.variants.split(","))
        LADDER = [(n, kw) for n, kw in LADDER if n in want]

    results = {}
    for batch in batches:
      xs = [jnp.asarray(np.random.RandomState(s).randn(
          batch, px, px, 3).astype(np.float32)) for s in range(2)]
      for x in xs:
          float(x.sum())
      log(f"inputs materialized (batch {batch})")

      ref_arg = None
      for name, kw in LADDER:
        key = name if len(batches) == 1 else f"{name}@b{batch}"
        try:
            m16 = get_model(args.arch, 10, dtype=jnp.bfloat16, **kw)

            @jax.jit
            def fwd(variables, x, m16=m16):
                logits = m16.apply(variables, x.astype(jnp.bfloat16),
                                   train=False)
                return soft_forward(logits.astype(jnp.float32), jt)

            t0 = time.time()
            out0 = np.asarray(fwd(variables, xs[0]))
            log(f"{name}: compiled in {time.time() - t0:.0f}s")
            arg = out0.argmax(1)
            if ref_arg is None:
                ref_arg = arg
                parity = 1.0
            else:
                parity = float((arg == ref_arg).mean())
            log(f"{name}: argmax parity vs baseline {parity:.4f}")

            def one_pass():
                t = time.perf_counter()
                outs = [fwd(variables, xs[i % 2])
                        for i in range(args.iters)]
                s = outs[0].sum()
                for o in outs[1:]:
                    s = s + o.sum()
                float(s)
                return time.perf_counter() - t

            one_pass()  # warm
            dt = min(one_pass(), one_pass(), one_pass())
            ips = batch * args.iters / dt
            results[key] = {"ips": round(ips, 1), "parity": parity}
            log(f"{key}: {ips:,.0f} imgs/s")
            print(json.dumps({key: results[key]}), flush=True)
        except Exception as e:
            log(f"{key} FAILED: {type(e).__name__}: {e}")
            results[key] = {"error": f"{type(e).__name__}: {e}"}
            print(json.dumps({key: results[key]}), flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
