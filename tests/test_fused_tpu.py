"""On-chip fused-head correctness, decoupled from bench.py (the round-3
gap: kernel parity evidence lived only inside the bench harness).

Auto-skipped off-chip: requires NBDT_TEST_TPU=1 AND a reachable TPU
backend. Run standalone in a TPU session:

    NBDT_TEST_TPU=1 python -m pytest tests/test_fused_tpu.py -q -s

The pytest process itself stays on CPU (repo conftest forces it); the TPU
work runs in ONE subprocess on the ambient backend — the axon tunnel
serves a single client at a time, so never run this concurrently with
another TPU process (CLAUDE.md).

Asserts fused-vs-jnp argmax parity == 1.0 for all three serving variants
(f32, bf16-backbone + bf16-constants head, folded-BN + fused) on the
flagship ResNet18/CIFAR10 induced-tree config — the semantics of reference
model.py:208-242 under the fused Pallas kernel (ops/soft_traversal.py).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SUBPROCESS = r"""
import json, sys
sys.path.insert(0, %(repo)r)
import numpy as np
import jax
import jax.numpy as jnp

if jax.default_backend() != "tpu":
    print(json.dumps({"skip": jax.default_backend()}))
    sys.exit(0)

from nbdt_tpu.assets import get_dataset_wnids
from nbdt_tpu.hierarchy.build import build_induced_graph
from nbdt_tpu.hierarchy.generate import get_centers_from_flax_params
from nbdt_tpu.models import get_model, init_model
from nbdt_tpu.models.fold import fold_batchnorm
from nbdt_tpu.ops.soft_traversal import fused_soft_head, prepare_head_constants
from nbdt_tpu.rules import soft_forward, to_device_tree
from nbdt_tpu.tree import Tree

module, variables = init_model("ResNet18", 10, (32, 32, 3))
wnids = get_dataset_wnids("CIFAR10")
centers = get_centers_from_flax_params(variables["params"])
tree = Tree.from_graph(build_induced_graph(wnids, centers), wnids,
                       classes=[f"c{i}" for i in range(10)])
params = variables["params"]
kernel = np.asarray(params["linear"]["kernel"])
bias = np.asarray(params["linear"]["bias"])
hc = prepare_head_constants(tree.arrays, kernel, bias)
hc16 = prepare_head_constants(tree.arrays, kernel, bias, dtype=jnp.bfloat16)
jt = to_device_tree(tree.arrays)
x = jnp.asarray(np.random.RandomState(0).randn(512, 32, 32, 3)
                .astype(np.float32))

ref = np.argmax(np.asarray(jax.jit(
    lambda v, x: soft_forward(module.apply(v, x, train=False), jt)
)(variables, x)), -1)

out = {}

f32_arg = np.argmax(np.asarray(jax.jit(
    lambda v, x: fused_soft_head(
        module.apply(v, x, train=False, features_only=True), hc,
        block_b=512, want_aux=False)[0]
)(variables, x)), -1)
out["parity_f32"] = float((f32_arg == ref).mean())

module16 = get_model("ResNet18", 10, dtype=jnp.bfloat16)
bf16_arg = np.argmax(np.asarray(jax.jit(
    lambda v, x: fused_soft_head(
        module16.apply(v, x.astype(jnp.bfloat16), train=False,
                       features_only=True), hc16,
        block_b=512, want_aux=False)[0]
)(variables, x)), -1)
out["parity_bf16"] = float((bf16_arg == ref).mean())

fmod, fvars = fold_batchnorm(module, variables)
fmod16 = fmod.clone(dtype=jnp.bfloat16)
folded_arg = np.argmax(np.asarray(jax.jit(
    lambda v, x: fused_soft_head(
        fmod16.apply(v, x.astype(jnp.bfloat16), train=False,
                     features_only=True), hc16,
        block_b=512, want_aux=False)[0]
)(fvars, x)), -1)
out["parity_folded"] = float((folded_arg == ref).mean())

print(json.dumps(out))
"""


@pytest.mark.tpu
@pytest.mark.skipif(
    os.environ.get("NBDT_TEST_TPU") != "1",
    reason="on-chip kernel test: set NBDT_TEST_TPU=1 in a TPU session "
    "(the axon tunnel serves one client — opt-in so the CPU suite never "
    "touches it)",
)
def test_fused_head_onchip_argmax_parity():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # ambient platform resolution (axon/tpu)
    env.pop("NBDT_PLATFORM", None)
    r = subprocess.run(
        [sys.executable, "-c", _SUBPROCESS % {"repo": REPO}],
        capture_output=True, text=True, timeout=780, env=env,
    )
    assert r.returncode == 0, f"subprocess failed:\n{r.stdout}\n{r.stderr}"
    result = json.loads(r.stdout.strip().splitlines()[-1])
    if "skip" in result:
        pytest.skip(f"no TPU backend (got {result['skip']})")
    assert result["parity_f32"] == 1.0, result
    assert result["parity_bf16"] == 1.0, result
    assert result["parity_folded"] == 1.0, result
