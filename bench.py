"""NBDT inference benchmark: TPU (this repo) vs PyTorch-CPU (reference-style).

Measures single-chip soft-NBDT inference throughput for the flagship config
(ResNet18, CIFAR10 shapes, induced binary hierarchy over 10 classes):

  ours:     one jitted XLA program — Flax ResNet18 features + soft-NBDT
            traversal head (optionally the fused Pallas kernel), f32.
  baseline: torch-CPU ResNet18 + reference-style NBDT soft rules (per-node
            Python loop doing stack-of-means then the prob-product walk,
            transcribing nbdt/model.py:84-242 semantics).

Measurement notes (axon TPU tunnel): ``block_until_ready`` does not reliably
block, so execution is forced by summing outputs on device and pulling one
scalar; inputs are pre-materialized; N dispatches are pipelined and synced
once — per-call RTT (~30ms) amortizes away. Pallas compilation through the
tunnel can stall in native RPC (uninterruptible by signals), so the fused
path is probed in a SUBPROCESS with a hard timeout (``--fused-only``), and
the benchmark falls back to the jnp head when the probe dies.

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec, "unit": ..., "vs_baseline": ratio}
Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# Serving batch for the JAX paths: throughput rises ~10% from 512 to 8192
# (the late stages' small spatial maps tile the MXU better with more batch),
# measured 112k -> 125k imgs/s on v5e. The torch-CPU baseline keeps the
# reference-style 512 (larger batches don't help torch-CPU and would blow
# its 7.6 s/batch wall time); both sides are throughput, so the ratio holds.
BATCH = int(os.environ.get("NBDT_BENCH_BATCH", "8192"))
ITERS = int(os.environ.get("NBDT_BENCH_ITERS", "16"))
TORCH_BATCH = 512
TORCH_ITERS = 3
# Round-2 postmortem (BENCH_r02): the probe's 240 s budget was consumed by the
# axon session-handoff stall in its FIRST device op (the probe log shows the
# xla_bridge banner and then silence — it never reached a Mosaic compile; the
# parent's own init stalled 453 s the same way). The budget must absorb a
# worst-case handoff stall (~8 min observed) PLUS the compile+measure work.
FUSED_SUBPROCESS_BUDGET_S = int(os.environ.get("NBDT_FUSED_BUDGET_S", "780"))
# Whole-run watchdog (round-5 postmortem): the PARENT session's first device
# op can also wedge — observed >30 min stuck in model+tree init with the
# probe's numbers already banked, which would have ended a driver run with
# rc!=0 and NO metric line at all (the tunnel stall is native RPC,
# uninterruptible by signals, so try/except never fires). A daemon thread
# ends the run from outside after this budget, emitting the best salvaged
# result (probe JSON lines are written after each completed measurement for
# exactly this reason). Default absorbs a clean worst case (~28 min
# end-to-end observed) with margin.
TOTAL_BUDGET_S = int(os.environ.get("NBDT_BENCH_BUDGET_S", "2400"))
# Historical same-session torch-CPU control (58-62 imgs/s across r1-r5
# runs) — used for vs_baseline ONLY in the watchdog salvage path, where the
# in-session control never got to run.
TORCH_CPU_FALLBACK_IPS = 60.0

_T0 = time.time()


def log(*a):
    print(f"[{time.time() - _T0:7.1f}s]", *a, file=sys.stderr, flush=True)


def _flagship_jax():
    from nbdt_tpu.models import init_model
    from nbdt_tpu.hierarchy.build import build_induced_graph
    from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
    from nbdt_tpu.tree import Tree
    from nbdt_tpu.assets import get_dataset_wnids

    module, variables = init_model("ResNet18", 10, (32, 32, 3))
    wnids = get_dataset_wnids("CIFAR10")
    centers = get_centers_from_flax_params(variables["params"])
    G = build_induced_graph(wnids, centers)
    tree = Tree.from_graph(G, wnids, classes=[f"c{i}" for i in range(10)])
    return module, variables, tree


def _measure(fn, variables, xs, name) -> float:
    t0 = time.time()
    float(fn(variables, xs[0]).sum())
    log(f"{name}: compiled in {time.time() - t0:.0f}s")

    def one_pass():
        t0 = time.perf_counter()
        outs = [fn(variables, xs[i % len(xs)]) for i in range(ITERS)]
        total = outs[0].sum()
        for o in outs[1:]:
            total = total + o.sum()
        float(total)  # forces execution of the whole chain
        return time.perf_counter() - t0

    # Warm pass absorbs the axon session-handoff stall (a fresh tunnel
    # session can run minutes-slow in its first device ops); then best of
    # two timed passes.
    one_pass()
    dt = min(one_pass(), one_pass())
    ips = BATCH * ITERS / dt
    log(f"{name}: {ips:,.0f} imgs/sec ({dt / ITERS * 1e3:.2f} ms/batch)")
    return ips


def _make_inputs():
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.randn(BATCH, 32, 32, 3).astype(np.float32))
          for _ in range(4)]
    for x in xs:  # materialize inputs before timing
        float(x.sum())
    return xs


def bench_jax_fused_only() -> None:
    """Subprocess entry: measure ONLY the fused-pallas paths.

    Two variants share the same fused traversal head (f32 inside the kernel):
    f32 feature extractor, and bf16 feature extractor (the serving config —
    conv compute on the MXU in bf16, the head's node decisions in f32).

    Robustness contract with the parent (see probe_fused_subprocess): a JSON
    result line is printed and FLUSHED after each successful measurement, so
    the parent keeps the best completed number even if a later stage stalls
    past the kill budget. Every stage logs a timestamp so a post-mortem can
    tell a tunnel-handoff stall from a Mosaic compile stall. Before any
    timing, fused argmax is checked on-chip against the jnp rules path
    (CLAUDE.md decision-path invariant) and reported as "parity".
    """
    import jax
    import jax.numpy as jnp

    from nbdt_tpu.models import get_model
    from nbdt_tpu.ops.soft_traversal import fused_soft_head, prepare_head_constants
    from nbdt_tpu.rules import soft_forward, to_device_tree

    log(f"probe: jax backend {jax.default_backend()} "
        f"(platform init may stall minutes in a session handoff)")
    module, variables, tree = _flagship_jax()
    log("probe: model+tree built")
    params = variables["params"]
    kernel = np.asarray(params["linear"]["kernel"])
    bias = np.asarray(params["linear"]["bias"])
    hc = prepare_head_constants(tree.arrays, kernel, bias)
    hc16 = prepare_head_constants(tree.arrays, kernel, bias,
                                  dtype=jnp.bfloat16)
    jt = to_device_tree(tree.arrays)
    on_tpu = jax.default_backend() == "tpu"

    @jax.jit
    def forward_fused(variables, x):
        feats = module.apply(variables, x, train=False, features_only=True)
        (leaf,) = fused_soft_head(feats, hc, block_b=512, want_aux=False,
                                  interpret=not on_tpu)
        return leaf

    @jax.jit
    def forward_jnp(variables, x):
        logits = module.apply(variables, x, train=False)
        return soft_forward(logits, jt)

    xs = _make_inputs()
    log("probe: inputs materialized; compiling fused kernel")

    # On-chip argmax parity vs the jnp rules path, asserted BEFORE timing:
    # a fast-but-wrong kernel must not enter the record.
    fused_arg = np.argmax(np.asarray(forward_fused(variables, xs[0])), -1)
    log("probe: fused kernel compiled+ran; compiling jnp reference")
    ref_arg = np.argmax(np.asarray(forward_jnp(variables, xs[0])), -1)
    parity = float((fused_arg == ref_arg).mean())
    log(f"probe: on-chip fused-vs-jnp argmax parity: {parity:.4f}")
    assert parity == 1.0, f"fused head argmax parity {parity} != 1.0"

    ips = _measure(forward_fused, variables, xs, "jax fused-pallas-head")
    print(json.dumps({"fused_ips": ips, "parity": parity}), flush=True)

    module_bf16 = get_model("ResNet18", 10, dtype=jnp.bfloat16)

    @jax.jit
    def forward_fused_bf16(variables, x):
        feats = module_bf16.apply(variables, x.astype(jnp.bfloat16),
                                  train=False, features_only=True)
        # bf16 classifier inside the kernel (f32 accumulate); the node
        # decisions stay f32 — same contract as the jnp bf16 serving path.
        (leaf,) = fused_soft_head(feats, hc16, block_b=512, want_aux=False,
                                  interpret=not on_tpu)
        return leaf

    try:
        arg16 = np.argmax(np.asarray(forward_fused_bf16(variables, xs[0])), -1)
        parity16 = float((arg16 == ref_arg).mean())
        log(f"probe: bf16-fused argmax parity vs f32 jnp: {parity16:.4f}")
        if parity16 == 1.0:
            ips2 = _measure(forward_fused_bf16, variables, xs,
                            "jax bf16-backbone+fused-head")
            ips = max(ips, ips2)
        else:
            log("probe: bf16-fused skipped from headline (argmax drift)")
    except Exception as e:
        log(f"bf16+fused failed: {type(e).__name__}: {e}")
    print(json.dumps({"fused_ips": ips, "parity": parity}), flush=True)

    # The full serving stack: BN folded into conv weights (bf16 end-to-end
    # backbone) + the fused traversal head — the two wins composed.
    try:
        from nbdt_tpu.models.fold import fold_batchnorm

        fmod, fvars = fold_batchnorm(module, variables)
        fmod16 = fmod.clone(dtype=jnp.bfloat16)

        @jax.jit
        def forward_folded_fused(fvars, x):
            feats = fmod16.apply(fvars, x.astype(jnp.bfloat16),
                                 train=False, features_only=True)
            (leaf,) = fused_soft_head(feats, hc16, block_b=512,
                                      want_aux=False, interpret=not on_tpu)
            return leaf

        argff = np.argmax(np.asarray(forward_folded_fused(fvars, xs[0])), -1)
        parityff = float((argff == ref_arg).mean())
        log(f"probe: folded+fused argmax parity vs f32 jnp: {parityff:.4f}")
        if parityff == 1.0:
            ips3 = _measure(lambda _v, x: forward_folded_fused(fvars, x),
                            variables, xs, "jax bf16-folded+fused-head")
            ips = max(ips, ips3)
        else:
            log("probe: folded+fused skipped from headline (argmax drift)")
    except Exception as e:
        log(f"folded+fused failed: {type(e).__name__}: {e}")
    print(json.dumps({"fused_ips": ips, "parity": parity}), flush=True)


def bench_jax() -> float:
    import jax
    import jax.numpy as jnp

    from nbdt_tpu.rules import soft_forward, to_device_tree

    log(f"jax backend: {jax.default_backend()}, devices: {jax.devices()}")
    t0 = time.time()
    module, variables, tree = _flagship_jax()
    log(f"model+tree init: {time.time() - t0:.0f}s")
    jt = to_device_tree(tree.arrays)

    @jax.jit
    def forward_jnp(variables, x):
        logits = module.apply(variables, x, train=False)
        return soft_forward(logits, jt)

    xs = _make_inputs()
    plain = _measure(forward_jnp, variables, xs, "jax jnp-rules")

    # bf16 backbone + f32 traversal head: the standard TPU serving config.
    # Conv/matmul compute in bf16 on the MXU (params stay f32); logits are
    # cast back to f32 before the NBDT rules so node decisions keep full
    # precision. Typically ~2x the f32 path at negligible accuracy cost.
    from nbdt_tpu.models import get_model

    module_bf16 = get_model("ResNet18", 10, dtype=jnp.bfloat16)

    @jax.jit
    def forward_bf16(variables, x):
        logits = module_bf16.apply(variables, x.astype(jnp.bfloat16),
                                   train=False)
        return soft_forward(logits.astype(jnp.float32), jt)

    try:
        bf16 = _measure(forward_bf16, variables, xs, "jax bf16-backbone")
    except Exception as e:
        log(f"bf16 path failed: {type(e).__name__}: {e}")
        bf16 = None

    # bf16 + BatchNorm folded into the conv weights (models/fold.py): pure
    # conv+bias+ReLU graph, activations stay bf16 end-to-end (no f32 norm
    # round-trip). Argmax is checked against the unfolded f32 path.
    folded = None
    try:
        from nbdt_tpu.models.fold import fold_batchnorm

        fmod, fvars = fold_batchnorm(module, variables)
        fmod16 = fmod.clone(dtype=jnp.bfloat16)

        @jax.jit
        def forward_folded(fvars, x):
            logits = fmod16.apply(fvars, x.astype(jnp.bfloat16), train=False)
            return soft_forward(logits.astype(jnp.float32), jt)

        ref_arg = np.argmax(np.asarray(forward_jnp(variables, xs[0])), -1)
        fold_arg = np.argmax(np.asarray(forward_folded(fvars, xs[0])), -1)
        agree = float((ref_arg == fold_arg).mean())
        log(f"bf16-folded argmax agreement vs f32: {agree:.4f}")
        # The README/docs claim for this path is EXACT argmax parity, so
        # the gate is exact — any drift and the headline falls back to the
        # unfolded bf16 path.
        if agree == 1.0:
            folded = _measure(lambda _v, x: forward_folded(fvars, x),
                              variables, xs, "jax bf16-folded-bn")
        else:
            log("bf16-folded path skipped (argmax drift)")
    except Exception as e:
        log(f"bf16-folded path failed: {type(e).__name__}: {e}")

    candidates = [v for v in (folded, bf16, plain) if v]
    assert candidates, "no JAX path succeeded"
    return max(candidates)


def probe_fused_subprocess() -> float | None:
    """Measure the fused-pallas path in a subprocess with a hard timeout.

    MUST run before this process initializes JAX: the axon tunnel serves one
    client session at a time, so a child probe deadlocks if the parent
    already holds the device. Pallas compiles through the tunnel can also
    stall in native RPC (uninterruptible by signals) — hence the subprocess
    + kill, not an in-process attempt. The probe prints a JSON line after
    EACH completed measurement, so a kill mid-run still yields the best
    number measured so far (the last line wins); fused counts only with
    parity == 1.0 asserted on-chip by the probe itself.
    """
    if os.environ.get("NBDT_SKIP_FUSED"):
        log("fused-pallas probe skipped (NBDT_SKIP_FUSED)")
        return None
    fused = None
    err_path = "/tmp/nbdt_fused_probe.log"
    try:
        with open(err_path, "w") as err, open(err_path + ".out", "w") as out:
            proc = subprocess.Popen(
                [sys.executable, __file__, "--fused-only"],
                stdout=out, stderr=err, text=True,
            )
            try:
                proc.wait(timeout=FUSED_SUBPROCESS_BUDGET_S)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
                log(f"fused-pallas probe exceeded {FUSED_SUBPROCESS_BUDGET_S}s; "
                    f"using any partial result (log: {err_path})")
        sys.stderr.write(open(err_path).read())
        for line in open(err_path + ".out").read().splitlines():
            line = line.strip()
            if line.startswith("{"):
                rec = json.loads(line)
                if rec.get("parity") == 1.0:
                    fused = rec.get("fused_ips")
                else:
                    log(f"probe line without parity=1.0 ignored: {line}")
    except Exception as e:
        log(f"fused-pallas probe failed: {type(e).__name__}: {e}")
    return fused


def bench_torch() -> float:
    import os

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.set_num_threads(os.cpu_count() or 4)

    class BasicBlock(nn.Module):
        def __init__(self, in_planes, planes, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(in_planes, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.short = None
            if stride != 1 or in_planes != planes:
                self.short = nn.Sequential(
                    nn.Conv2d(in_planes, planes, 1, stride, bias=False),
                    nn.BatchNorm2d(planes),
                )

        def forward(self, x):
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            out = out + (self.short(x) if self.short else x)
            return F.relu(out)

    class R18(nn.Module):
        def __init__(self, num_classes=10):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 3, 1, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            layers = []
            in_p = 64
            for planes, stride in zip((64, 128, 256, 512), (1, 2, 2, 2)):
                for s in (stride, 1):
                    layers.append(BasicBlock(in_p, planes, s))
                    in_p = planes
            self.body = nn.Sequential(*layers)
            self.linear = nn.Linear(512, num_classes)

        def forward(self, x):
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.body(out)
            out = F.adaptive_avg_pool2d(out, 1).flatten(1)
            return self.linear(out)

    _, _, tree = _flagship_jax()
    inodes = tree.inodes

    def soft_rules_reference_style(outputs):
        """Per-inode Python loop transcribing reference model.py:84-242."""
        node_probs = {}
        for node in inodes:
            cols = [
                outputs[:, node.child_index_to_class_index[k]].mean(dim=1)
                for k in range(node.num_classes)
            ]
            node_probs[node.wnid] = F.softmax(torch.stack(cols, dim=1), dim=1)
        class_probs = torch.ones(outputs.shape[0], len(tree.classes))
        for node in inodes:
            old_idx, new_idx = [], []
            for k in range(node.num_children):
                old = node.child_index_to_class_index[k]
                old_idx.extend(old)
                new_idx.extend([k] * len(old))
            class_probs[:, old_idx] *= node_probs[node.wnid][:, new_idx]
        return class_probs

    model = R18().eval()
    x = torch.randn(TORCH_BATCH, 3, 32, 32)
    with torch.no_grad():
        soft_rules_reference_style(model(x))  # warmup
        t0 = time.perf_counter()
        for _ in range(TORCH_ITERS):
            soft_rules_reference_style(model(x))
        dt = time.perf_counter() - t0
    ips = TORCH_BATCH * TORCH_ITERS / dt
    log(f"torch-cpu reference-style: {ips:,.0f} imgs/sec "
        f"({dt / TORCH_ITERS * 1e3:.1f} ms/batch)")
    return ips


def _arm_watchdog(state: dict) -> None:
    """Bound the whole run: after TOTAL_BUDGET_S, print the best salvaged
    result and hard-exit (os._exit works while the main thread is wedged in
    uninterruptible tunnel RPC; sys.exit/exceptions would not)."""
    import threading

    def fire():
        remaining = TOTAL_BUDGET_S - (time.time() - _T0)
        if remaining > 0:
            time.sleep(remaining)
        if state.get("done"):
            return
        fused = state.get("fused")
        if fused:
            log(f"WATCHDOG: run exceeded {TOTAL_BUDGET_S}s; emitting the "
                f"salvaged fused-probe result (vs_baseline uses the "
                f"historical torch-cpu control {TORCH_CPU_FALLBACK_IPS} "
                f"imgs/s — the in-session control never ran)")
            print(json.dumps({
                "metric": "NBDT soft inference images/sec/chip "
                          "(ResNet18 CIFAR10)",
                "value": round(fused, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(fused / TORCH_CPU_FALLBACK_IPS, 2),
            }), flush=True)
            os._exit(0)
        log(f"WATCHDOG: run exceeded {TOTAL_BUDGET_S}s with nothing "
            f"salvageable; exiting")
        os._exit(1)

    threading.Thread(target=fire, daemon=True).start()


def main():
    from nbdt_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # cuts cross-session backbone recompiles
    if "--fused-only" in sys.argv:
        bench_jax_fused_only()
        return
    state: dict = {}
    _arm_watchdog(state)
    fused = probe_fused_subprocess()  # before jax init (single-client tunnel)
    state["fused"] = fused
    if fused:
        # settle: the tunnel stalls when a new session connects immediately
        # after the previous client disconnects
        time.sleep(20)
    plain = None
    try:
        plain = bench_jax()
    except Exception as e:
        log(f"parent jax paths failed: {type(e).__name__}: {e}")
    if plain:  # keep the salvage result current for a torch-phase stall too
        state["fused"] = max(plain, fused or 0.0)
    candidates = [v for v in (fused, plain) if v]
    assert candidates, "no JAX path succeeded"
    ours = max(candidates)
    baseline = bench_torch()
    state["done"] = True  # disarm the watchdog: the real result wins
    result = {
        "metric": "NBDT soft inference images/sec/chip (ResNet18 CIFAR10)",
        "value": round(ours, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ours / baseline, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
