"""Bounded hand-kernel attempt at the measured-worst headline conv shape.

docs/PERFORMANCE.md ("The 72% cap, decomposed") pins the flagship
ResNet18/CIFAR10 serving drag on L1: 32px, 64->64, 3x3/s1 — the largest
FLOPs block (2.47 of 9.0 TFLOP) running at 65% MFU, with every XLA-level
reformulation measured strictly worse (im2col is provably memory-bound;
shift-and-matmul re-streams the activation 9x from HBM). The one untried
lever is a Pallas kernel that keeps the activation slab VMEM-RESIDENT so
the 9 shifted reads never touch HBM, and reshapes the contraction to feed
the 128x128 MXU:

  A. "dy-packed": dx-im2col in VMEM -> ONE matmul [rows,192]x[192,192]
     (chunks dy=0,1,2) -> shifted VPU add. Every MAC useful (only the
     34/32 halo rows are overhead) but K=N=192 misaligns the 128-slabs
     (ceiling 56% if Mosaic pads each 1.5-slab dim, 94% if it doesn't).
  B. "row-pair aligned": output rows in pairs -> [rows,768]x[768,128],
     perfectly slab-aligned (768=6x128, 128=1x128) at the cost of 25%
     zero-MACs in the packed weights (ceiling 75% x 32/34 halo).
  C. full dx+dy im2col -> [rows,576]x[576,64]: the classic form, K pads
     576->640 (90%) but N=64 wastes half the MXU lanes (ceiling ~45%) —
     included as the control that the N-dim matters.

All candidates are bf16 in / f32 accumulate / bias+relu fused / bf16 out —
identical to the native row in tools/probe_conv.py — and parity-asserted
against lax.conv_general_dilated on-chip before timing. Timing uses the
scan-amortized discipline (K iterations in one jit with a weight-scalar
data dependency; per-dispatch tunnel overhead otherwise drowns the op).

MEASURED OUTCOME (round 5, v5e, batch 8192): recorded NEGATIVE — see
docs/PERFORMANCE.md "The hand-written Mosaic conv at L1". A/B compile and
hit exact parity on-chip but reach only 32%/34% MFU vs native XLA's 60%
in the same session (tb=8 within 2 points of tb=4); C OOMs VMEM at tb=4
(18.3M/16M). The in-kernel window assembly (rotate+concat+casts) is VPU
work serialized against the MXU and costs more than the HBM re-reads it
saves. The five Mosaic restrictions that shaped the surviving code are
documented in _pad_hw/_im2col_dx and the kernel-body comments.

Usage: python tools/probe_pallas_conv.py [--batch 8192] [--scan-k 12]
"""

import argparse
import json
import os
import sys
import time

INTERPRET = os.environ.get("NBDT_PALLAS_INTERPRET", "") == "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(*a):
    print(f"[{time.time() - T0:7.1f}s]", *a, file=sys.stderr, flush=True)


PEAK_TFLOPS = 197.0  # v5e bf16

H = W = 32
C = 64
KH = KW = 3


def pack_w_dy(w):
    """w [3,3,64,64] -> [192,192]: rows (dx,ci), column chunk dy holds
    W[dy] reshaped [(dx,ci),co]."""
    import numpy as np

    w = np.asarray(w, np.float32)
    cols = [w[dy].reshape(KW * C, C) for dy in range(KH)]  # (dx,ci) x co
    return np.concatenate(cols, axis=1)  # [192, 192]


def pack_w_rowpair(w):
    """w [3,3,64,64] -> [768,128]: rows (j in 0..3 pack rows)x(dx,ci);
    columns = [out row parity 0 | parity 1] x co. Zero where the pack row
    is outside the 3-tap window of that output row."""
    import numpy as np

    w = np.asarray(w, np.float32)
    w4 = np.zeros((4, KW * C, 2 * C), np.float32)
    for j in range(4):
        if j < 3:  # parity 0: out[2g] uses xp rows 2g+dy, dy=j
            w4[j, :, :C] = w[j].reshape(KW * C, C)
        if j >= 1:  # parity 1: out[2g+1] uses xp rows 2g+1+dy, dy=j-1
            w4[j, :, C:] = w[j - 1].reshape(KW * C, C)
    return w4.reshape(4 * KW * C, 2 * C)  # [768, 128]


def pack_w_full(w):
    """w [3,3,64,64] -> [576,64]: rows (dy,dx,ci)."""
    import numpy as np

    return np.asarray(w, np.float32).reshape(KH * KW * C, C)


WPAD = 40  # padded W: dynamic rotate needs the rotated dim 8-sublane-aligned


def _pad_hw(x, jnp):
    """[TB,32,32,64] -> [TB,34,WPAD,64] zero-padded (VMEM-local).

    W pads to WPAD=40, not 34: Mosaic's tpu.dynamic_rotate rejects a
    34-wide sublane dim ("unsupported unaligned shape") — the rotated dim
    must be a multiple of the 8-sublane f32 tile. The extra 6 columns are
    sliced away before the matmul."""
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1 + WPAD - H - 2), (0, 0)))


def _im2col_dx(xp, shifts_ref, jnp, pltpu):
    """[TB,34,34,64] -> [TB,34,32,192]: per padded row, the 3 dx shifts.

    Mosaic cannot concatenate along lanes when the operands sit at different
    sublane offsets (xp[:, :, dx:dx+W] has offset dx) — "result/input offset
    mismatch on non-concat dimension". Realign first: a circular roll by -dx
    along W brings every window to offset 0, then all three slices start at
    row 0 and the lane-dim concat is legal. The wrapped-around halo rows land
    at W..33 and are sliced away.

    Three Mosaic restrictions measured on-chip shape this code:
    1. rotate is 32-bit only ("Rotate with non-32-bit data" on bf16) — so
       the rolls happen on an f32 upcast, downcast after the concat (exact:
       bf16->f32->bf16 round-trips);
    2. a STATIC roll+slice is canonicalized straight back into the offset
       slice it replaces (attempt 3/5 errors show the identical
       {0,0},{1,64},{2,0} in_layouts with and without the roll) — so the
       shift amount comes from SMEM at runtime, which the folder cannot see
       through, and every rotate output genuinely lands at offset (0,0);
    3. the lane concat itself only rejects offset mismatches on NON-concat
       dims, which all-zero offsets satisfy."""
    xp32 = xp.astype(jnp.float32)
    shifts = [xp32 if dx == 0 else
              pltpu.roll(xp32, shift=shifts_ref[0, dx], axis=2)
              for dx in range(KW)]
    p32 = jnp.concatenate([s[:, :, 0:W] for s in shifts], axis=-1)
    return p32.astype(jnp.bfloat16)


def make_kernel_a(tb):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(s_ref, x_ref, w_ref, b_ref, o_ref):
        xp = _pad_hw(x_ref[...], jnp)
        p = _im2col_dx(xp, s_ref, jnp, pltpu).reshape(
            tb * (H + 2) * W, KW * C)
        q = jnp.dot(p, w_ref[...], preferred_element_type=jnp.float32)
        # Keep lanes=192 (the 5-D reshape splitting 192 -> 3x64 is an
        # "unsupported shape cast" in Mosaic); dy chunks come off as lane
        # slices, realigned by 32-bit f32 lane rotates in the adds.
        q = q.reshape(tb, H + 2, W, KH * C)
        out = (q[:, 0:H, :, 0:C] + q[:, 1:H + 1, :, C:2 * C]
               + q[:, 2:H + 2, :, 2 * C:3 * C])
        out = jnp.maximum(out + b_ref[...], 0.0)
        o_ref[...] = out.astype(jnp.bfloat16)

    def call(x, wpk, b):
        n = x.shape[0]
        shifts = jnp.asarray(
            [[0] + [WPAD - k for k in range(1, KW)],     # axis 2 (W, padded)
             [0] + [H + 2 - k for k in range(1, KW)]],   # axis 1 (H)
            dtype=jnp.int32)
        return pl.pallas_call(
            kernel,
            grid=(n // tb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tb, H, W, C), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KW * C, KH * C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb, H, W, C), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, H, W, C), jnp.bfloat16),
            interpret=INTERPRET,
            cost_estimate=pl.CostEstimate(
                flops=2 * n * (H + 2) * W * (KW * C) * (KH * C),
                bytes_accessed=2 * 2 * n * H * W * C,
                transcendentals=0,
            ),
        )(shifts, x, wpk, b)

    return call


def make_kernel_b(tb):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = (H + 2) // 2  # 17 row pairs of padded rows
    NP = H // 2  # 16 output row pairs

    def kernel(s_ref, x_ref, w_ref, b_ref, o_ref):
        xp = _pad_hw(x_ref[...], jnp)
        p = _im2col_dx(xp, s_ref, jnp, pltpu)  # [tb, 34, 32, 192]
        # pack rows j=0..3 for output pair g: padded rows 2g..2g+3
        # (even-strided row pick expressed as reshape+take — Mosaic-safe)
        def pick_even(j):
            # rows 2g+j for g in 0..NP-1; j=3 reuses the j=2 window's odd
            # rows (p has only 34 rows, so a j=3 window would run past it)
            base, par = (j, 0) if j < 3 else (2, 1)
            return p[:, base:base + 2 * NP].reshape(
                tb, NP, 2, W, KW * C)[:, :, par]

        p4 = jnp.concatenate(
            [pick_even(j) for j in range(4)], axis=-1,
        )  # [tb, 16, 32, 768] — row j chunk = p[:, 2g+j]
        # Keep lanes=128 post-dot (5-D lane-splitting reshape is an
        # unsupported Mosaic shape cast); the two parities come off as lane
        # slices and go out through indexed stores — the (g,parity)->h=2g+p
        # interleave is a host-side reshape of the (n,NP,2,W,C) output.
        q = jnp.dot(
            p4.reshape(tb * NP * W, 4 * KW * C), w_ref[...],
            preferred_element_type=jnp.float32,
        ).reshape(tb, NP, W, 2 * C)
        e0 = jnp.maximum(q[..., 0:C] + b_ref[...], 0.0)
        e1 = jnp.maximum(q[..., C:2 * C] + b_ref[...], 0.0)
        o_ref[:, :, 0] = e0.astype(jnp.bfloat16)
        o_ref[:, :, 1] = e1.astype(jnp.bfloat16)

    def call(x, wpk, b):
        n = x.shape[0]
        shifts = jnp.asarray(
            [[0] + [WPAD - k for k in range(1, KW)],     # axis 2 (W, padded)
             [0] + [H + 2 - k for k in range(1, KW)]],   # axis 1 (H)
            dtype=jnp.int32)
        out = pl.pallas_call(
            kernel,
            grid=(n // tb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tb, H, W, C), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * KW * C, 2 * C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb, NP, 2, W, C),
                                   lambda i: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, NP, 2, W, C), jnp.bfloat16),
            interpret=INTERPRET,
            cost_estimate=pl.CostEstimate(
                flops=2 * n * NP * W * (4 * KW * C) * (2 * C),
                bytes_accessed=2 * 2 * n * H * W * C,
                transcendentals=0,
            ),
        )(shifts, x, wpk, b)
        # (g, parity) -> h = 2g + parity: plain row-major collapse
        return out.reshape(n, H, W, C)

    return call, G


def make_kernel_c(tb):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(s_ref, x_ref, w_ref, b_ref, o_ref):
        xp = _pad_hw(x_ref[...], jnp)
        # Full dy+dx im2col in ONE 9-operand concat: every window is
        # realigned to offset (0,0) first — f32 rolls (32-bit-only rotate)
        # by RUNTIME shifts from SMEM (static roll+slice is canonicalized
        # back into the offset slice; see _im2col_dx) — then sliced from
        # the origin.
        xp32 = xp.astype(jnp.float32)

        def window(dy, dx):
            s = xp32 if dx == 0 else pltpu.roll(
                xp32, shift=s_ref[0, dx], axis=2)
            if dy:
                s = pltpu.roll(s, shift=s_ref[1, dy], axis=1)
            return s[:, 0:H, 0:W]

        # concat in f32 (lane-only offset staggering), downcast after —
        # a bf16 lane concat is rejected by layout inference (see
        # _im2col_dx docstring).
        p9 = jnp.concatenate(
            [window(dy, dx) for dy in range(KH) for dx in range(KW)],
            axis=-1,
        ).astype(jnp.bfloat16)  # [tb, 32, 32, 576]
        q = jnp.dot(
            p9.reshape(tb * H * W, KH * KW * C), w_ref[...],
            preferred_element_type=jnp.float32,
        ).reshape(tb, H, W, C)
        o_ref[...] = jnp.maximum(q + b_ref[...], 0.0).astype(jnp.bfloat16)

    def call(x, wpk, b):
        n = x.shape[0]
        shifts = jnp.asarray(
            [[0] + [WPAD - k for k in range(1, KW)],     # axis 2 (W, padded)
             [0] + [H + 2 - k for k in range(1, KW)]],   # axis 1 (H)
            dtype=jnp.int32)
        return pl.pallas_call(
            kernel,
            grid=(n // tb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tb, H, W, C), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KH * KW * C, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb, H, W, C), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, H, W, C), jnp.bfloat16),
            interpret=INTERPRET,
            cost_estimate=pl.CostEstimate(
                flops=2 * n * H * W * (KH * KW * C) * C,
                bytes_accessed=2 * 2 * n * H * W * C,
                transcendentals=0,
            ),
        )(shifts, x, wpk, b)

    return call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--scan-k", type=int, default=12)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--tb", type=int, default=4, help="batch tile per grid cell")
    ap.add_argument("--parity-batch", type=int, default=64)
    ap.add_argument("--platform", default="cpu" if INTERPRET else None)
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

    rng = np.random.RandomState(0)
    w = (rng.randn(KH, KW, C, C) * 0.05).astype(np.float32)
    bias = (rng.randn(C) * 0.01).astype(np.float32)

    def native(x, w16, b16):
        out = lax.conv_general_dilated(
            x, w16, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(out + b16, 0.0).astype(jnp.bfloat16)

    w16 = jnp.asarray(w, jnp.bfloat16)
    b16f = jnp.asarray(bias, jnp.float32)

    # --- parity (small batch, on-chip) -----------------------------------
    xs = jnp.asarray(
        rng.randn(args.parity_batch, H, W, C).astype(np.float32)
    ).astype(jnp.bfloat16)
    ref = np.asarray(jax.jit(native)(xs, w16, b16f), np.float32)

    cand = {}
    cand["A dy-packed 192x192"] = (
        make_kernel_a(args.tb), jnp.asarray(pack_w_dy(w), jnp.bfloat16),
        jnp.asarray(bias, jnp.float32).reshape(1, C),
        2 * (H + 2) * W * (KW * C) * (KH * C),
    )
    kb, _ = make_kernel_b(args.tb)
    cand["B row-pair 768x128"] = (
        kb, jnp.asarray(pack_w_rowpair(w), jnp.bfloat16),
        jnp.asarray(bias, jnp.float32).reshape(1, C),
        2 * (H // 2) * W * (4 * KW * C) * (2 * C),
    )
    cand["C full-im2col 576x64"] = (
        make_kernel_c(args.tb), jnp.asarray(pack_w_full(w), jnp.bfloat16),
        jnp.asarray(bias, jnp.float32).reshape(1, C),
        2 * H * W * (KH * KW * C) * C,
    )

    useful_flops_per_img = 2 * H * W * KH * KW * C * C
    results = {}

    alive = {}
    for name, (call, wpk, b, _mac) in cand.items():
        try:
            got = np.asarray(
                jax.jit(call)(xs, wpk, b), np.float32
            )
            err = float(np.max(np.abs(got - ref)))
            scale = float(np.max(np.abs(ref)))
            ok = err <= 2e-2 * max(scale, 1.0)  # bf16 sum-order tolerance
            log(f"{name}: parity max|diff|={err:.3e} (scale {scale:.2f}) "
                f"{'OK' if ok else 'FAIL'}")
            results[name] = {"parity_maxdiff": err, "parity_ok": ok}
            if ok:
                alive[name] = (call, wpk, b)
        except Exception as e:
            log(f"{name}: COMPILE/RUN FAILED: {type(e).__name__}: {e}")
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(json.dumps({name: results[name]}), flush=True)

    # --- timing (scan-amortized, same discipline as probe_conv.py) -------
    def dep_scalar(arr):
        return arr.reshape(-1)[0].astype(jnp.float32) * 1e-30 + 1.0

    def measure(step_fn, init_carry, xargs):
        @jax.jit
        def scanned(carry, *xa):
            def body(c, _):
                return step_fn(c, *xa), None

            out, _ = lax.scan(body, carry, None, length=K)
            return out

        scanned(init_carry, *xargs).block_until_ready()

        def one_pass():
            t = time.perf_counter()
            for _ in range(args.iters):
                out = scanned(init_carry, *xargs)
            out.block_until_ready()
            return time.perf_counter() - t

        one_pass()
        return min(one_pass(), one_pass())

    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(
        jnp.bfloat16
    )
    x.block_until_ready()
    init = jnp.zeros((B, H, W, C), jnp.bfloat16)
    useful = useful_flops_per_img * B

    def native_step(carry, x):
        s = dep_scalar(carry).astype(jnp.bfloat16)
        return native(x, w16 * s, b16f)

    dt = measure(native_step, init, (x,))
    tf = useful * K * args.iters / dt / 1e12
    results["native XLA conv"] = {
        "tflops": round(tf, 1), "mfu": round(tf / PEAK_TFLOPS, 3),
    }
    log(f"native XLA conv: {tf:.1f} TFLOP/s ({tf / PEAK_TFLOPS:.0%} MFU)")
    print(json.dumps({"native": results["native XLA conv"]}), flush=True)

    for name, (call, wpk, b) in alive.items():
        def step(carry, x, call=call, wpk=wpk, b=b):
            s = dep_scalar(carry).astype(jnp.bfloat16)
            return call(x, wpk * s, b)

        try:
            dt = measure(step, init, (x,))
        except Exception as e:
            log(f"{name}: timing failed: {type(e).__name__}: {e}")
            results[name]["timing_error"] = f"{type(e).__name__}: {str(e)[:300]}"
            print(json.dumps({name: results[name]}), flush=True)
            continue
        tf = useful * K * args.iters / dt / 1e12
        results[name].update(
            tflops=round(tf, 1), mfu=round(tf / PEAK_TFLOPS, 3),
            vs_native=round(tf / max(results["native XLA conv"]["tflops"],
                                     1e-9), 3),
        )
        log(f"{name}: {tf:.1f} effective TFLOP/s "
            f"({tf / PEAK_TFLOPS:.0%} MFU, "
            f"{results[name]['vs_native']:.2f}x native)")
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
