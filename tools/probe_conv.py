"""Late-stage conv tiling probe: verify-or-break the 72%-MFU cap.

The headline bench (ResNet18/CIFAR10, bf16 folded, batch 8192) has sat at
~72% MFU for two rounds on an unverified explanation: "the small spatial
tiles of the late stages (8x8, 4x4) underfill MXU tiles"
(docs/PERFORMANCE.md). This decomposes the cap with data, in ONE session:

1. per-shape conv rates: each distinct conv shape in the network, timed
   standalone (bf16, bias+relu fused) -> achieved TFLOP/s and MFU, plus
   the whole model as the cross-check that per-stage numbers add up.
2. matmul ceiling: a plain [M,K]x[K,N] matmul with the SAME FLOPs as each
   late conv — the roofline the conv could reach if lowering were free.
3. im2col reformulation: the late 3x3 convs as explicit
   patch-extract + one matmul (lax.conv_general_dilated_patches), timed
   against the native conv on identical shapes.

A JSON line flushes after every measurement. Usage:

    python tools/probe_conv.py [--batch 8192] [--iters 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(*a):
    print(f"[{time.time() - T0:7.1f}s]", *a, file=sys.stderr, flush=True)


# ResNet18/CIFAR conv inventory: (tag, H, Cin, Cout, stride, count_in_model)
# — spatial is square, kernel 3x3 except the 1x1 shortcuts (listed).
CONVS = [
    ("stem 32px 3->64", 32, 3, 64, 1, 1),
    ("L1 32px 64->64", 32, 64, 64, 1, 4),
    ("L2a 32->16px 64->128 s2", 32, 64, 128, 2, 1),
    ("L2 16px 128->128", 16, 128, 128, 1, 3),
    ("L3a 16->8px 128->256 s2", 16, 128, 256, 2, 1),
    ("L3 8px 256->256", 8, 256, 256, 1, 3),
    ("L4a 8->4px 256->512 s2", 8, 256, 512, 2, 1),
    ("L4 4px 512->512", 4, 512, 512, 1, 3),
]

PEAK_TFLOPS = 197.0  # v5e bf16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--skip-model", action="store_true")
    args = ap.parse_args()

    from nbdt_tpu.utils import enable_compilation_cache, maybe_set_platform

    if args.platform:
        maybe_set_platform(args.platform)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    log(f"backend: {jax.default_backend()}")
    B = args.batch

    def measure(fn, xs, flops):
        float(fn(xs[0]).sum())  # compile

        def one_pass():
            t = time.perf_counter()
            outs = [fn(xs[i % 2]) for i in range(args.iters)]
            s = outs[0].sum()
            for o in outs[1:]:
                s = s + o.sum()
            float(s)
            return time.perf_counter() - t

        one_pass()
        dt = min(one_pass(), one_pass())
        tflops = flops * args.iters / dt / 1e12
        return tflops

    results = {}

    # --- 1. per-shape native conv rates --------------------------------
    import flax.linen as nn

    for tag, h, cin, cout, stride, count in CONVS:
        conv = nn.Conv(cout, (3, 3), strides=(stride, stride), padding=1,
                       use_bias=True, dtype=jnp.bfloat16)
        v = conv.init(jax.random.PRNGKey(0), jnp.zeros((1, h, h, cin),
                                                       jnp.bfloat16))

        @jax.jit
        def fwd(x, conv=conv, v=v):
            return nn.relu(conv.apply(v, x))

        xs = [jnp.asarray(np.random.RandomState(s).randn(B, h, h, cin)
                          .astype(jnp.bfloat16)) for s in range(2)]
        for x in xs:
            float(x.sum())
        ho = h // stride
        flops = 2 * B * ho * ho * 9 * cin * cout
        tf = measure(fwd, xs, flops)
        results[tag] = {"tflops": round(tf, 1),
                        "mfu": round(tf / PEAK_TFLOPS, 3),
                        "model_count": count,
                        "model_flops": flops * count}
        log(f"{tag}: {tf:.1f} TFLOP/s ({tf / PEAK_TFLOPS:.0%} MFU)")
        print(json.dumps({tag: results[tag]}), flush=True)

    # --- 2. matmul ceiling at the late convs' FLOPs ---------------------
    for tag, h, cin, cout in (("mm-L3 (8px 256)", 8, 256, 256),
                              ("mm-L4 (4px 512)", 4, 512, 512)):
        M, K, N = B * h * h, 9 * cin, cout

        @jax.jit
        def mm(a, w=jnp.asarray(
            np.random.RandomState(1).randn(K, N).astype(jnp.bfloat16))):
            return jax.nn.relu(
                jnp.dot(a, w, preferred_element_type=jnp.float32)
            ).astype(jnp.bfloat16)

        xs = [jnp.asarray(np.random.RandomState(s).randn(M, K)
                          .astype(jnp.bfloat16)) for s in range(2)]
        for x in xs:
            float(x.sum())
        tf = measure(mm, xs, 2 * M * K * N)
        results[tag] = {"tflops": round(tf, 1),
                        "mfu": round(tf / PEAK_TFLOPS, 3)}
        log(f"{tag}: {tf:.1f} TFLOP/s ({tf / PEAK_TFLOPS:.0%} MFU)")
        print(json.dumps({tag: results[tag]}), flush=True)

    # --- 3. im2col reformulation of the late convs ----------------------
    for tag, h, c in (("im2col-L3 8px 256", 8, 256),
                      ("im2col-L4 4px 512", 4, 512)):
        w = jnp.asarray(np.random.RandomState(1).randn(9 * c, c)
                        .astype(jnp.bfloat16))
        b = jnp.asarray(np.zeros(c, jnp.bfloat16))

        @jax.jit
        def im2col_conv(x, w=w, b=b, c=c, h=h):
            # patches: [B, H, W, 9*C] (NHWC, 3x3, SAME)
            p = jax.lax.conv_general_dilated_patches(
                x, (3, 3), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = jnp.dot(p.reshape(-1, 9 * c), w,
                          preferred_element_type=jnp.float32)
            return jax.nn.relu(out + b).astype(jnp.bfloat16).reshape(
                -1, h, h, c)

        xs = [jnp.asarray(np.random.RandomState(s).randn(B, h, h, c)
                          .astype(jnp.bfloat16)) for s in range(2)]
        for x in xs:
            float(x.sum())
        flops = 2 * B * h * h * 9 * c * c
        tf = measure(im2col_conv, xs, flops)
        results[tag] = {"tflops": round(tf, 1),
                        "mfu": round(tf / PEAK_TFLOPS, 3)}
        log(f"{tag}: {tf:.1f} TFLOP/s ({tf / PEAK_TFLOPS:.0%} MFU)")
        print(json.dumps({tag: results[tag]}), flush=True)

    # --- 4. whole-model cross-check -------------------------------------
    if not args.skip_model:
        from nbdt_tpu.models import init_model
        from nbdt_tpu.models.fold import fold_batchnorm

        module, variables = init_model("ResNet18", 10, (32, 32, 3))
        fmod, fvars = fold_batchnorm(module, variables)
        fmod16 = fmod.clone(dtype=jnp.bfloat16)

        @jax.jit
        def model_fwd(x):
            return fmod16.apply(fvars, x.astype(jnp.bfloat16), train=False)

        xs = [jnp.asarray(np.random.RandomState(s).randn(B, 32, 32, 3)
                          .astype(np.float32)) for s in range(2)]
        for x in xs:
            float(x.sum())
        model_flops = B * 1.111e9
        tf = measure(model_fwd, xs, model_flops)
        results["model bf16-folded"] = {
            "tflops": round(tf, 1), "mfu": round(tf / PEAK_TFLOPS, 3),
            "ips": round(tf * 1e12 / 1.111e9, 0),
        }
        log(f"model: {tf:.1f} TFLOP/s ({tf / PEAK_TFLOPS:.0%} MFU)")
        print(json.dumps({"model": results["model bf16-folded"]}),
              flush=True)

        # FLOPs-weighted expectation from the per-shape table (does the
        # decomposition explain the whole?)
        tot_flops = sum(r["model_flops"] for r in results.values()
                        if "model_flops" in r)
        tot_time = sum(r["model_flops"] / (r["tflops"] * 1e12)
                       for r in results.values() if "model_flops" in r)
        pred = tot_flops / tot_time / 1e12
        results["flops-weighted-prediction"] = {
            "tflops": round(pred, 1),
            "note": "conv-only; excludes shortcut 1x1s, pools, head",
        }
        log(f"per-shape FLOPs-weighted prediction: {pred:.1f} TFLOP/s")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
