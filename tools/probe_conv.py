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
3. shift-and-matmul reformulation: the late 3x3 convs as 9 accumulated
   [BHW,C]x[C,C] matmuls over shifted views (the TPU-native "im2col":
   no patch materialization — a naive conv_general_dilated_patches
   tensor gets its trailing 9 lane-padded to 128 and allocates 32 GiB
   at batch 8192, measured the hard way).

Measurement discipline: per-dispatch overhead through the axon tunnel is
~4-6 ms even pipelined — at 3 ms/conv that drowns the signal (a first
draft of this probe measured every stage at 34-42% "MFU" while the whole
net runs at 72%; its FLOPs-weighted prediction said 59k imgs/s vs 127.7k
measured). Every op here therefore runs K iterations inside ONE jit via
lax.scan, with a weight-scalar data dependency between iterations so XLA
cannot hoist the loop-invariant op out of the scan. Dispatch overhead
amortizes to <1%.

A JSON line flushes after every measurement. Usage:

    python tools/probe_conv.py [--batch 8192] [--scan-k 24] [--iters 3]
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
# — spatial is square, kernel 3x3 (the 1x1 shortcuts are <2% of FLOPs and
# ride the transition rows' residual).
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
HBM_GBPS = 819.0  # v5e


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--scan-k", type=int, default=24)
    ap.add_argument("--iters", type=int, default=3)
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
    from jax import lax

    log(f"backend: {jax.default_backend()}")
    B, K = args.batch, args.scan_k

    def dep_scalar(arr):
        # A data dependency on one element of the previous iteration's
        # output: forces sequential execution without measurable work.
        return arr.reshape(-1)[0].astype(jnp.float32) * 1e-30 + 1.0

    def measure(step_fn, init_carry, xargs, flops_per_iter):
        """Time K iterations of step_fn inside one lax.scan dispatch."""

        @jax.jit
        def scanned(carry, *xa):
            def body(c, _):
                return step_fn(c, *xa), None

            out, _ = lax.scan(body, carry, None, length=K)
            return out

        scanned(init_carry, *xargs).block_until_ready()  # compile

        def one_pass():
            t = time.perf_counter()
            for _ in range(args.iters):
                out = scanned(init_carry, *xargs)
            out.block_until_ready()
            return time.perf_counter() - t

        one_pass()
        dt = min(one_pass(), one_pass())
        return flops_per_iter * K * args.iters / dt / 1e12

    results = {}

    # --- 1. per-shape native conv rates ---------------------------------
    import flax.linen as nn

    for tag, h, cin, cout, stride, count in CONVS:
        conv = nn.Conv(cout, (3, 3), strides=(stride, stride), padding=1,
                       use_bias=True, dtype=jnp.bfloat16)
        v = conv.init(jax.random.PRNGKey(0), jnp.zeros((1, h, h, cin),
                                                       jnp.bfloat16))
        ho = h // stride
        x = jnp.asarray(np.random.RandomState(0).randn(B, h, h, cin)
                        .astype(jnp.bfloat16))
        x.block_until_ready()

        def step(carry, x, conv=conv, v=v):
            s = dep_scalar(carry).astype(jnp.bfloat16)
            w = jax.tree.map(lambda p: p * s, v)
            return nn.relu(conv.apply(w, x))

        init = jnp.zeros((B, ho, ho, cout), jnp.bfloat16)
        flops = 2 * B * ho * ho * 9 * cin * cout
        # roofline: read x + write out + weights, bf16
        byts = 2 * (B * h * h * cin + B * ho * ho * cout + 9 * cin * cout)
        bound = min(PEAK_TFLOPS, flops / byts * HBM_GBPS / 1e3)
        tf = measure(step, init, (x,), flops)
        results[tag] = {"tflops": round(tf, 1),
                        "mfu": round(tf / PEAK_TFLOPS, 3),
                        "roofline_tflops": round(bound, 1),
                        "pct_of_roofline": round(tf / bound, 3),
                        "model_count": count,
                        "model_flops": flops * count}
        log(f"{tag}: {tf:.1f} TFLOP/s ({tf / PEAK_TFLOPS:.0%} MFU, "
            f"{tf / bound:.0%} of roofline {bound:.0f})")
        print(json.dumps({tag: results[tag]}), flush=True)
        del x, init

    # --- 2. matmul ceiling at the late convs' FLOPs ---------------------
    for tag, h, cin, cout in (("mm-L1 (32px 64)", 32, 64, 64),
                              ("mm-L3 (8px 256)", 8, 256, 256),
                              ("mm-L4 (4px 512)", 4, 512, 512)):
        M, Kd, N = B * h * h, 9 * cin, cout
        w = jnp.asarray(np.random.RandomState(1).randn(Kd, N)
                        .astype(jnp.bfloat16))
        a = jnp.asarray(np.random.RandomState(0).randn(M, Kd)
                        .astype(jnp.bfloat16))
        a.block_until_ready()

        def step(carry, a, w=w):
            s = dep_scalar(carry).astype(jnp.bfloat16)
            out = jnp.dot(a, w * s, preferred_element_type=jnp.float32)
            return jax.nn.relu(out).astype(jnp.bfloat16)

        init = jnp.zeros((M, N), jnp.bfloat16)
        flops = 2 * M * Kd * N
        byts = 2 * (M * Kd + M * N + Kd * N)
        bound = min(PEAK_TFLOPS, flops / byts * HBM_GBPS / 1e3)
        tf = measure(step, init, (a,), flops)
        results[tag] = {"tflops": round(tf, 1),
                        "mfu": round(tf / PEAK_TFLOPS, 3),
                        "roofline_tflops": round(bound, 1),
                        "pct_of_roofline": round(tf / bound, 3)}
        log(f"{tag}: {tf:.1f} TFLOP/s ({tf / PEAK_TFLOPS:.0%} MFU, "
            f"{tf / bound:.0%} of roofline {bound:.0f})")
        print(json.dumps({tag: results[tag]}), flush=True)
        del a, init

    # --- 3. shift-and-matmul reformulation of the late convs ------------
    for tag, h, c in (("shiftmm-L3 8px 256", 8, 256),
                      ("shiftmm-L4 4px 512", 4, 512)):
        ws = jnp.asarray(np.random.RandomState(1).randn(9, c, c)
                         .astype(jnp.bfloat16))
        b = jnp.zeros((c,), jnp.float32)
        x = jnp.asarray(np.random.RandomState(0).randn(B, h, h, c)
                        .astype(jnp.bfloat16))
        x.block_until_ready()

        def step(carry, x, ws=ws, b=b, c=c, h=h):
            s = dep_scalar(carry).astype(jnp.bfloat16)
            acc = jnp.zeros((B, h, h, c), jnp.float32)
            for k in range(9):
                dy, dx = k // 3 - 1, k % 3 - 1
                # shifted view of x, zero-padded (SAME 3x3 tap (dy,dx))
                xs = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))[
                    :, 1 + dy:1 + dy + h, 1 + dx:1 + dx + h, :]
                acc = acc + jnp.dot(
                    xs.reshape(-1, c), ws[k] * s,
                    preferred_element_type=jnp.float32,
                ).reshape(B, h, h, c)
            return jax.nn.relu(acc + b).astype(jnp.bfloat16)

        init = jnp.zeros((B, h, h, c), jnp.bfloat16)
        flops = 2 * B * h * h * 9 * c * c
        tf = measure(step, init, (x,), flops)
        results[tag] = {"tflops": round(tf, 1),
                        "mfu": round(tf / PEAK_TFLOPS, 3)}
        log(f"{tag}: {tf:.1f} TFLOP/s ({tf / PEAK_TFLOPS:.0%} MFU)")
        print(json.dumps({tag: results[tag]}), flush=True)
        del x, init

    # --- 4. whole-model cross-check --------------------------------------
    if not args.skip_model:
        from nbdt_tpu.models import init_model
        from nbdt_tpu.models.fold import fold_batchnorm

        module, variables = init_model("ResNet18", 10, (32, 32, 3))
        fmod, fvars = fold_batchnorm(module, variables)
        fmod16 = fmod.clone(dtype=jnp.bfloat16)
        x = jnp.asarray(np.random.RandomState(0).randn(B, 32, 32, 3)
                        .astype(jnp.bfloat16))
        x.block_until_ready()

        def step(carry, x):
            s = dep_scalar(carry).astype(jnp.bfloat16)
            return fmod16.apply(fvars, x * s,
                                train=False).astype(jnp.bfloat16)

        init = jnp.zeros((B, 10), jnp.bfloat16)
        model_flops = B * 1.111e9
        tf = measure(step, init, (x,), model_flops)
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
        tot_time = sum(r["model_flops"] / (max(r["tflops"], 1e-4) * 1e12)
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
