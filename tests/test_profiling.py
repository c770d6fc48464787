"""Profiling/observability helper tests (SURVEY.md §5 tracing analog)."""

import jax.numpy as jnp

from wgpu_3dgs_core_tpu.utils.profiling import (
    annotate,
    block_and_time,
    named_scope,
    timed,
    trace,
)


def test_named_scope_and_annotate():
    @annotate("double")
    def double(x):
        return x * 2

    with named_scope("outer"):
        out = double(jnp.ones(4))
    assert float(out.sum()) == 8.0


def test_timed_records():
    results = {}
    with timed("block", results):
        _ = sum(range(100))
    assert "block" in results and results["block"] >= 0.0


def test_block_and_time():
    import jax

    f = jax.jit(lambda x: x + 1)
    dt = block_and_time("add", f, jnp.ones(8), iters=2, warmup=1)
    assert dt > 0


def test_trace(tmp_path):
    import numpy as np

    with trace(str(tmp_path)):
        _ = np.asarray(jnp.arange(16) * 2)
    # a trace directory should have been produced
    assert any(tmp_path.iterdir())
