"""Profiling utilities (SURVEY §5 tracing plan)."""

import os

import numpy as np


def test_step_timer():
    from nbdt_tpu.profiling import StepTimer

    t = StepTimer()
    t.tick()
    for _ in range(5):
        t.tick()
    s = t.summary()
    assert s["steps"] == 5
    assert s["mean_s"] >= 0 and s["p90_s"] >= s["p50_s"] >= 0


def test_trace_writes_profile(tmp_path):
    import jax
    import jax.numpy as jnp

    from nbdt_tpu.profiling import annotate_step, trace

    log_dir = str(tmp_path / "trace")
    with trace(log_dir):
        with annotate_step("train", 0):
            float(jnp.ones((32, 32)).sum())
    # a plugins/profile/<run>/ dir with trace artifacts must exist
    hits = []
    for root, dirs, files in os.walk(log_dir):
        hits.extend(f for f in files if "trace" in f or f.endswith(".pb"))
    assert hits, f"no trace artifacts under {log_dir}"
