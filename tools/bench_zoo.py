"""Zoo serving rates: NBDT soft inference imgs/s per backbone on the chip.

For each arch: induce a CIFAR10 hierarchy from its own classifier rows,
jit bf16-backbone + f32 soft rules (the standard serving split), measure
warm best-of-N pipelined throughput. One process, one session (tunnel
bandwidth varies between sessions); a JSON line is flushed after EVERY
arch so a timeout keeps the completed measurements.

Usage: python tools/bench_zoo.py [--archs a,b,c] [--iters 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# (arch, input px, batch) — px respects each topology's minimum (AlexNet's
# conv stack needs >=63, Inception v3's stem >=75); batch keeps the
# activation footprint in HBM across the size range.
DEFAULTS = (
    ("alexnet", 64, 2048),
    ("googlenet", 64, 1024),
    ("inception_v3", 96, 512),
    ("mnasnet1_0", 64, 1024),
    ("squeezenet1_1", 64, 2048),
    ("shufflenet_v2_x1_0", 64, 1024),
    ("densenet121", 32, 1024),
    ("vgg16", 32, 1024),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--archs", default=None,
                    help="comma-separated subset of the default table")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--platform", default=None)
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
    table = DEFAULTS
    if args.archs:
        want = set(args.archs.split(","))
        table = [t for t in DEFAULTS if t[0] in want]

    wnids = get_dataset_wnids("CIFAR10")
    results = {}
    for arch, px, batch in table:
        try:
            t0 = time.time()
            module, variables = init_model(arch, 10, (px, px, 3))
            centers = get_centers_from_flax_params(variables["params"])
            tree = Tree.from_graph(build_induced_graph(wnids, centers),
                                   wnids,
                                   classes=[f"c{i}" for i in range(10)])
            jt = to_device_tree(tree.arrays)
            m16 = get_model(arch, 10, dtype=jnp.bfloat16)

            @jax.jit
            def fwd(variables, x, m16=m16, jt=jt):
                logits = m16.apply(variables, x.astype(jnp.bfloat16),
                                   train=False)
                return soft_forward(logits.astype(jnp.float32), jt)

            xs = [jnp.asarray(np.random.RandomState(s).randn(
                batch, px, px, 3).astype(np.float32)) for s in range(2)]
            for x in xs:
                float(x.sum())
            float(fwd(variables, xs[0]).sum())  # compile
            log(f"{arch}: built+compiled in {time.time() - t0:.0f}s")

            def one_pass():
                t = time.perf_counter()
                outs = [fwd(variables, xs[i % 2]) for i in range(args.iters)]
                s = outs[0].sum()
                for o in outs[1:]:
                    s = s + o.sum()
                float(s)
                return time.perf_counter() - t

            one_pass()  # warm
            dt = min(one_pass(), one_pass())
            ips = batch * args.iters / dt
            results[arch] = round(ips, 1)
            log(f"{arch}@{px}px b{batch}: {ips:,.0f} imgs/s")
            print(json.dumps({arch: results[arch]}), flush=True)
        except Exception as e:
            log(f"{arch} FAILED: {type(e).__name__}: {e}")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
