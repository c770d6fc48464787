"""Segment-reduction kernels (ops/segreduce.py) vs naive numpy sums."""

import numpy as np
import jax.numpy as jnp
import pytest

from wgpu_3dgs_core_tpu.ops.expand import build_segment_table
from wgpu_3dgs_core_tpu.ops.segreduce import (
    SEG_BLOCK,
    gid_column,
    segment_sums_sorted,
    split_grad_rows,
    uncompact_columns,
)


def _setup(n, counts, f_pad, seed=0, drop=0):
    """Build a sorted gradient stream for gaussians with given counts.

    ``drop``: randomly drop this many live fragments (simulates
    saturation/truncation — equality matching must not misattribute).
    """
    rng = np.random.default_rng(seed)
    counts = np.asarray(counts, np.int32)
    assert counts.shape == (n,)
    offsets = np.cumsum(counts) - counts
    total = int(counts.sum())
    assert total <= f_pad

    # keys: gid repeated counts[g] times, already sorted; invalid tail.
    keys = np.repeat(np.arange(n), counts)
    if drop:
        keep = rng.permutation(total)[: total - drop]
        keep.sort()
        keys = keys[keep]
    live = keys.shape[0]
    key_full = np.concatenate(
        [keys, n + np.arange(live, f_pad)]
    ).astype(np.int64)

    grads = rng.normal(size=(9, f_pad)).astype(np.float32)
    grads[:, live:] = 0.0

    dg_split = split_grad_rows([jnp.asarray(grads[i]) for i in range(9)])
    keys_f = jnp.asarray(key_full.astype(np.float32))

    # expected per-gaussian sums
    exp = np.zeros((n, 9), np.float32)
    np.add.at(exp, keys, grads[:, :live].T)

    # compacted table (scatter-based builder, N-scale)
    span_x = np.maximum(counts, 1)
    tab_t = build_segment_table(
        jnp.asarray(offsets), jnp.asarray(counts), jnp.asarray(span_x),
        jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
        jnp.arange(n, dtype=jnp.int32), k=SEG_BLOCK,
    )
    n_live = int((counts > 0).sum())
    gid_mono = gid_column(tab_t, jnp.int32(n_live))
    return (dg_split, keys_f), gid_mono, jnp.int32(live), exp


@pytest.mark.parametrize("seed", [0, 1])
def test_segsum_uncompact_matches_naive(seed):
    n = 700
    rng = np.random.default_rng(seed + 100)
    counts = rng.integers(0, 7, n).astype(np.int32)
    counts[rng.random(n) < 0.3] = 0  # plenty of empty gaussians
    f_pad = 4 * SEG_BLOCK
    (dgs, keys), gid_mono, total, exp = _setup(n, counts, f_pad, seed=seed)

    d_comp = segment_sums_sorted(dgs, keys, gid_mono, total)
    d_full = uncompact_columns(d_comp, gid_mono, n)
    np.testing.assert_allclose(
        np.asarray(d_full[:9]).T, exp, rtol=1e-6, atol=1e-6
    )


def test_segsum_single_gaussian_spans_blocks():
    """One gaussian owning more fragments than a block: sums must cross
    grid steps through the panel accumulator."""
    n = 600
    counts = np.zeros(n, np.int32)
    counts[3] = SEG_BLOCK + 37  # spans 2+ blocks
    counts[4] = 5
    counts[n - 1] = 2
    f_pad = 4 * SEG_BLOCK
    (dgs, keys), gid_mono, total, exp = _setup(n, counts, f_pad, seed=7)

    d_comp = segment_sums_sorted(dgs, keys, gid_mono, total)
    d_full = uncompact_columns(d_comp, gid_mono, n)
    np.testing.assert_allclose(
        np.asarray(d_full[:9]).T, exp, rtol=1e-5, atol=1e-5
    )


def test_segsum_missing_fragments_no_misattribution():
    """Dropped fragments (saturation/truncation analog) only lose their own
    contribution — equality matching never shifts other segments."""
    n = 900
    rng = np.random.default_rng(3)
    counts = rng.integers(0, 5, n).astype(np.int32)
    f_pad = 4 * SEG_BLOCK
    # Build dropped stream; expected sums computed from the DROPPED stream.
    (dgs, keys), gid_mono, total, exp = _setup(n, counts, f_pad, seed=3,
                                               drop=200)

    d_comp = segment_sums_sorted(dgs, keys, gid_mono, total)
    d_full = uncompact_columns(d_comp, gid_mono, n)
    np.testing.assert_allclose(
        np.asarray(d_full[:9]).T, exp, rtol=1e-6, atol=1e-6
    )


def test_segsum_empty_stream():
    n = 520
    counts = np.zeros(n, np.int32)
    f_pad = 2 * SEG_BLOCK
    (dgs, keys), gid_mono, total, exp = _setup(n, counts, f_pad)
    d_comp = segment_sums_sorted(dgs, keys, gid_mono, total)
    d_full = uncompact_columns(d_comp, gid_mono, n)
    assert np.all(np.asarray(d_full) == 0.0)
