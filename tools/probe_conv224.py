"""224px per-stage conv decomposition: locate the ImageNet-scale MFU cap.

docs/PERFORMANCE.md's ImageNet ladder left one open frontier recorded:
ResNet50/224px trains at 23-29% MFU and *evals* at only ~34%, far below
the CIFAR stages' 84-87%, with "the early 56x56 stages' thin channels and
the strided transitions" as the suspected drag — unmeasured. This probe is
the 224px analog of tools/probe_conv.py (same scan-amortized measurement
discipline: K iterations inside ONE jit with a data dependency, because
per-dispatch tunnel overhead ~4-6 ms drowns per-op timings):

1. every distinct conv shape of torchvision ResNet50 at 224px, timed
   standalone (bf16, bias+relu fused) -> achieved TFLOP/s, MFU, and its
   own bandwidth roofline;
2. the 3x3/s2 maxpool (the only non-conv op with real bytes);
3. a space-to-depth stem reformulation — the classic TPU fix for the
   7x7/s2 Cin=3 stem (pad to blocks of 2, reshape to [112+pad]^2 x 12,
   conv 4x4/s1): exact-same math (asserted on-chip against the native
   stem before timing), 12 input channels instead of 3;
4. the whole folded-bf16 model as the cross-check, plus the
   FLOPs-weighted per-stage prediction.

A JSON line flushes after every measurement. Usage:

    python tools/probe_conv224.py [--batch 256] [--scan-k 12] [--iters 3]
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


# torchvision ResNet50 conv inventory at 224px input (eval forward):
# (tag, H_in, Cin, Cout, kernel, stride, count_in_model).
CONVS = [
    ("stem 224px 7x7s2 3->64", 224, 3, 64, 7, 2, 1),
    # L1 @56px (3 bottleneck blocks)
    ("L1 56px 1x1 64->64", 56, 64, 64, 1, 1, 1),
    ("L1 56px 1x1 256->64", 56, 256, 64, 1, 1, 2),
    ("L1 56px 3x3 64->64", 56, 64, 64, 3, 1, 3),
    ("L1 56px 1x1 64->256", 56, 64, 256, 1, 1, 4),  # 3 expand + shortcut
    # L2: 56->28 transition + 4 blocks @28px
    ("L2 56px 1x1 256->128", 56, 256, 128, 1, 1, 1),
    ("L2 56->28px 3x3s2 128->128", 56, 128, 128, 3, 2, 1),
    ("L2 56->28px 1x1s2 256->512 (sc)", 56, 256, 512, 1, 2, 1),
    ("L2 28px 1x1 512->128", 28, 512, 128, 1, 1, 3),
    ("L2 28px 3x3 128->128", 28, 128, 128, 3, 1, 3),
    ("L2 28px 1x1 128->512", 28, 128, 512, 1, 1, 4),
    # L3: 28->14 transition + 6 blocks @14px
    ("L3 28px 1x1 512->256", 28, 512, 256, 1, 1, 1),
    ("L3 28->14px 3x3s2 256->256", 28, 256, 256, 3, 2, 1),
    ("L3 28->14px 1x1s2 512->1024 (sc)", 28, 512, 1024, 1, 2, 1),
    ("L3 14px 1x1 1024->256", 14, 1024, 256, 1, 1, 5),
    ("L3 14px 3x3 256->256", 14, 256, 256, 3, 1, 5),
    ("L3 14px 1x1 256->1024", 14, 256, 1024, 1, 1, 6),
    # L4: 14->7 transition + 3 blocks @7px
    ("L4 14px 1x1 1024->512", 14, 1024, 512, 1, 1, 1),
    ("L4 14->7px 3x3s2 512->512", 14, 512, 512, 3, 2, 1),
    ("L4 14->7px 1x1s2 1024->2048 (sc)", 14, 1024, 2048, 1, 2, 1),
    ("L4 7px 1x1 2048->512", 7, 2048, 512, 1, 1, 2),
    ("L4 7px 3x3 512->512", 7, 512, 512, 3, 1, 2),
    ("L4 7px 1x1 512->2048", 7, 512, 2048, 1, 1, 3),
]

PEAK_TFLOPS = 197.0  # v5e bf16
HBM_GBPS = 819.0  # v5e


def space_to_depth_stem_kernel(w7):
    """Re-express the 7x7/s2/pad3 stem kernel as a 4x4/s1 kernel over a
    2x2 space-to-depth input: w4[P,Q,(u,v,c),o] = w7[2P+u-1, 2Q+v-1, c, o]
    (zero where the source index leaves [0,7)). Exact — same math."""
    import numpy as np

    w7 = np.asarray(w7)
    cin, cout = w7.shape[2], w7.shape[3]
    w4 = np.zeros((4, 4, 2 * 2 * cin, cout), w7.dtype)
    for P in range(4):
        for Q in range(4):
            for u in range(2):
                for v in range(2):
                    a, b = 2 * P + u - 1, 2 * Q + v - 1
                    if 0 <= a < 7 and 0 <= b < 7:
                        w4[P, Q, (u * 2 + v) * cin:(u * 2 + v + 1) * cin] = \
                            w7[a, b]
    return w4


def space_to_depth_nhwc(x):
    """[B, 2H, 2W, C] -> [B, H, W, 4C] with channel order (u, v, c)
    matching space_to_depth_stem_kernel."""
    b, h2, w2, c = x.shape
    x = x.reshape(b, h2 // 2, 2, w2 // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h2 // 2, w2 // 2, 4 * c)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--scan-k", type=int, default=12)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--skip-model", action="store_true")
    ap.add_argument("--only-model", action="store_true",
                    help="skip the per-shape scan/maxpool/s2d parts; time "
                         "just the whole folded model (batch-scaling runs)")
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
        return arr.reshape(-1)[0].astype(jnp.float32) * 1e-30 + 1.0

    def measure(step_fn, init_carry, xargs, flops_per_iter):
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

    import flax.linen as nn

    # --- 1. per-shape native conv rates ---------------------------------
    for tag, h, cin, cout, k, stride, count in ([] if args.only_model
                                                else CONVS):
        conv = nn.Conv(cout, (k, k), strides=(stride, stride), padding=k // 2,
                       use_bias=True, dtype=jnp.bfloat16)
        v = conv.init(jax.random.PRNGKey(0), jnp.zeros((1, h, h, cin),
                                                       jnp.bfloat16))
        ho = (h + stride - 1) // stride
        x = jnp.asarray(np.random.RandomState(0).randn(B, h, h, cin)
                        .astype(jnp.bfloat16))
        x.block_until_ready()

        def step(carry, x, conv=conv, v=v):
            s = dep_scalar(carry).astype(jnp.bfloat16)
            w = jax.tree.map(lambda p: p * s, v)
            return nn.relu(conv.apply(w, x))

        init = jnp.zeros((B, ho, ho, cout), jnp.bfloat16)
        flops = 2 * B * ho * ho * k * k * cin * cout
        byts = 2 * (B * h * h * cin + B * ho * ho * cout
                    + k * k * cin * cout)
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

    if args.only_model:
        from nbdt_tpu.models import init_model
        from nbdt_tpu.models.fold import fold_batchnorm

        module, variables = init_model("resnet50", 1000, (224, 224, 3))
        fmod, fvars = fold_batchnorm(module, variables)
        fmod16 = fmod.clone(dtype=jnp.bfloat16)
        x = jnp.asarray(np.random.RandomState(0).randn(B, 224, 224, 3)
                        .astype(jnp.bfloat16))
        x.block_until_ready()

        def step(carry, x):
            s = dep_scalar(carry).astype(jnp.bfloat16)
            return fmod16.apply(fvars, x * s,
                                train=False).astype(jnp.bfloat16)

        init = jnp.zeros((B, 1000), jnp.bfloat16)
        conv_flops = sum(
            2 * B * ((h + s - 1) // s) ** 2 * k * k * ci * co * cnt
            for _, h, ci, co, k, s, cnt in CONVS
        )
        model_flops = conv_flops + 2 * B * 2048 * 1000
        tf = measure(step, init, (x,), model_flops)
        r = {"tflops": round(tf, 1), "mfu": round(tf / PEAK_TFLOPS, 3),
             "ips": round(tf * 1e12 / (model_flops / B), 0), "batch": B}
        log(f"model b{B}: {tf:.1f} TFLOP/s ({tf / PEAK_TFLOPS:.0%} MFU, "
            f"{r['ips']:.0f} imgs/s)")
        print(json.dumps({f"model bf16-folded b{B}": r}), flush=True)
        return

    # --- 2. the stem-side maxpool (bytes, not FLOPs) ---------------------
    x = jnp.asarray(np.random.RandomState(0).randn(B, 112, 112, 64)
                    .astype(jnp.bfloat16))
    x.block_until_ready()

    def pool_step(carry, x):
        s = dep_scalar(carry).astype(jnp.bfloat16)
        return nn.max_pool(x * s, (3, 3), strides=(2, 2), padding="SAME")

    init = jnp.zeros((B, 56, 56, 64), jnp.bfloat16)
    byts = 2 * (B * 112 * 112 * 64 + B * 56 * 56 * 64)

    @jax.jit
    def scanned_pool(carry, x):
        def body(c, _):
            return pool_step(c, x), None

        out, _ = lax.scan(body, carry, None, length=K)
        return out

    scanned_pool(init, x).block_until_ready()
    t = time.perf_counter()
    for _ in range(args.iters):
        out = scanned_pool(init, x)
    out.block_until_ready()
    dt = (time.perf_counter() - t)
    ms = dt / (K * args.iters) * 1e3
    results["maxpool 112->56px 3x3s2 C64"] = {
        "ms_per_call": round(ms, 3),
        "gbps": round(byts / (dt / (K * args.iters)) / 1e9, 1),
        "pct_of_hbm": round(byts / (dt / (K * args.iters)) / 1e9 / HBM_GBPS,
                            3),
        "note": "bytes assume pool-in + pool-out only; the x*s loop "
                "dependency may materialize an extra 112px copy if XLA "
                "does not fuse it into reduce_window, understating GB/s "
                "by up to ~1.5x",
    }
    log(f"maxpool: {ms:.3f} ms "
        f"({results['maxpool 112->56px 3x3s2 C64']['gbps']} GB/s)")
    print(json.dumps(
        {"maxpool": results["maxpool 112->56px 3x3s2 C64"]}), flush=True)
    del x, init

    # --- 3. space-to-depth stem reformulation ---------------------------
    # Exactness first: compare against the native stem on-chip.
    rng = np.random.RandomState(1)
    w7 = rng.randn(7, 7, 3, 64).astype(np.float32) * 0.05
    bias = rng.randn(64).astype(np.float32) * 0.01
    xs = jnp.asarray(rng.randn(2, 224, 224, 3).astype(np.float32))
    native = lax.conv_general_dilated(
        xs, jnp.asarray(w7), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    w4 = jnp.asarray(space_to_depth_stem_kernel(w7))
    xp = jnp.pad(xs, ((0, 0), (4, 2), (4, 2), (0, 0)))
    s2d = lax.conv_general_dilated(
        space_to_depth_nhwc(xp), w4, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    err = float(jnp.max(jnp.abs(native - s2d)))
    scale = float(jnp.max(jnp.abs(native)))
    assert err <= 1e-4 * max(scale, 1.0), (err, scale)
    log(f"s2d stem exactness: max|diff|={err:.2e} (max|native|={scale:.1f})")

    w4b = w4.astype(jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).randn(B, 230, 230, 3)
                    .astype(jnp.bfloat16))  # pre-padded
    x.block_until_ready()
    # bf16 bias so both stem variants fuse the same dtype chain (an f32
    # bias here upcast the whole [B,112,112,64] activation before relu,
    # penalizing exactly the variant this probe exists to evaluate).
    bias16 = jnp.asarray(bias, jnp.bfloat16)

    def s2d_step(carry, x, w4b=w4b):
        s = dep_scalar(carry).astype(jnp.bfloat16)
        xx = space_to_depth_nhwc(x * s)
        out = lax.conv_general_dilated(
            xx, w4b, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return nn.relu(out + bias16).astype(jnp.bfloat16)

    init = jnp.zeros((B, 112, 112, 64), jnp.bfloat16)
    # Report EFFECTIVE rate at the ORIGINAL stem FLOPs so rows compare
    # apples-to-apples (the 4x4x12 kernel does 192/147x the raw MACs).
    flops_orig = 2 * B * 112 * 112 * 49 * 3 * 64
    tf = measure(s2d_step, init, (x,), flops_orig)
    results["stem-s2d 4x4s1 12->64 (effective)"] = {
        "tflops": round(tf, 1), "mfu": round(tf / PEAK_TFLOPS, 3),
        "note": "effective rate at the native stem's FLOPs; exact same math",
    }
    log(f"s2d stem: {tf:.1f} effective TFLOP/s ({tf / PEAK_TFLOPS:.0%} MFU)")
    print(json.dumps(
        {"stem-s2d": results["stem-s2d 4x4s1 12->64 (effective)"]}),
        flush=True)
    del x, init

    # --- 4. whole-model cross-check --------------------------------------
    if not args.skip_model:
        from nbdt_tpu.models import init_model
        from nbdt_tpu.models.fold import fold_batchnorm

        module, variables = init_model("resnet50", 1000, (224, 224, 3))
        fmod, fvars = fold_batchnorm(module, variables)
        fmod16 = fmod.clone(dtype=jnp.bfloat16)
        x = jnp.asarray(np.random.RandomState(0).randn(B, 224, 224, 3)
                        .astype(jnp.bfloat16))
        x.block_until_ready()

        def step(carry, x):
            s = dep_scalar(carry).astype(jnp.bfloat16)
            return fmod16.apply(fvars, x * s,
                                train=False).astype(jnp.bfloat16)

        init = jnp.zeros((B, 1000), jnp.bfloat16)
        conv_flops = sum(r["model_flops"] for r in results.values()
                         if "model_flops" in r)
        model_flops = conv_flops + 2 * B * 2048 * 1000  # + fc head
        tf = measure(step, init, (x,), model_flops)
        results["model bf16-folded"] = {
            "tflops": round(tf, 1), "mfu": round(tf / PEAK_TFLOPS, 3),
            "ips": round(tf * 1e12 / (model_flops / B), 0),
        }
        log(f"model: {tf:.1f} TFLOP/s ({tf / PEAK_TFLOPS:.0%} MFU, "
            f"{results['model bf16-folded']['ips']:.0f} imgs/s)")
        print(json.dumps({"model": results["model bf16-folded"]}),
              flush=True)

    # FLOPs-weighted prediction needs only the per-shape rows (parts 1-3),
    # so report it even under --skip-model.
    conv_flops = sum(r["model_flops"] for r in results.values()
                     if "model_flops" in r)
    tot_time = sum(r["model_flops"] / (max(r["tflops"], 1e-4) * 1e12)
                   for r in results.values() if "model_flops" in r)
    if tot_time:
        pred = conv_flops / tot_time / 1e12
        results["flops-weighted-prediction"] = {
            "tflops": round(pred, 1),
            "note": "conv-only; excludes maxpool, residual adds, head",
        }
        log(f"per-shape FLOPs-weighted prediction: {pred:.1f} TFLOP/s")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
