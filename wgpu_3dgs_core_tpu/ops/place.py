"""Counting-sort fragment placement: a Pallas replacement for lax.sort.

The tile sort in binning is a stable partition of the gaussian-major
fragment stream into ~8K tile buckets. A comparison sort is overkill for
that: the destination slot of every fragment is

    dst = tile_start[tile] + (#earlier fragments with the same tile)

which a single *sequential* Pallas pass computes with per-tile running
counters held in VMEM (TPU grid steps execute in order on a core, so the
counter state threads through the grid). The remaining XLA work is one
row-scatter at fragment scale (apply the permutation) — versus a
multi-pass O(F log^2 F) sort.

TPU-idiomatic tricks (no in-kernel gather/scatter exists):
- counters live as a [H, 128] grid addressed by (tile >> 7, tile & 127);
  per-fragment counter reads/updates become one-hot matmuls on the MXU:
  read = colsum(oh_lo * (C^T @ oh_hi)), update C += oh_hi @ oh_lo^T.
- same-tile-within-block ranks come from the one-hot Gram matrices:
  eq = (oh_hi^T oh_hi) * (oh_lo^T oh_lo), intra = colsum(strict_lower * eq).
- counter values reach fragment scale (> 2^16), past MXU-exact range even
  at HIGHEST precision, so counters are stored as 12-bit-split hi/lo
  planes with an explicit carry after each block (see ops/expand.py for
  the hardware-measured exactness bounds).

tile_start itself comes from an N-scale corner-difference histogram
(``tile_histogram``), folded into the counter init — so the counting path
has exactly ONE fragment-scale XLA op (the scatter), and none of sort /
searchsorted / scan.

Overflow semantics: when total > capacity, placements past the capacity
are dropped, leaving flagged-invalid holes (callers must honor
``FragmentStream.overflow`` exactly as with the sort path).

STATUS: FROZEN (round 3). The hardware A/B (PERF_NOTES.md) measured the
counting path at 828 ms vs 634 ms for the default sort at bench shapes —
the per-block one-hot + two [K, K] Gram matmuls cost more than the sort
saves. Its original fusion rationale (piggyback the attribute fetch on
the one-hot) was landed separately in ops/expand.py's fused expand, which
removed the gather this kernel was meant to amortize. Kept as a correct,
tested reference implementation of sequential stateful Pallas counters
(reachable via GS_TPU_SORT_IMPL=counting or ``sort_impl="counting"``);
not a perf candidate unless the Gram-rank trick is replaced by something
cheaper. Do not extend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .expand import EXPAND_BLOCK, TAB_ROWS, _HIGH, expand_math
from .kernel_bundle import interpret_mode

_LO_LANES = 128  # counter grid lanes: tile & 127
_SPLIT = 4096.0  # 12-bit counter split (hi/lo planes)


def counter_rows(t_total: int) -> int:
    """Counter-grid rows for a tile count, padded to a sublane multiple."""
    rows = -(-t_total // _LO_LANES)
    return max(8, -(-rows // 8) * 8)


def _place_kernel(win0_ref, total_ref, t0_ref, t1_ref, ts_ref, out_ref,
                  chi_ref, clo_ref, *, k: int, tiles_x: int, t_total: int,
                  h_rows: int):
    b = pl.program_id(0)
    del win0_ref

    @pl.when(b == 0)
    def _():
        ts = ts_ref[...]
        hi = jnp.floor(ts / _SPLIT)
        chi_ref[...] = hi
        clo_ref[...] = ts - hi * _SPLIT

    tile, gid, valid, fi_row = expand_math(
        b, total_ref, t0_ref, t1_ref, k=k, tiles_x=tiles_x
    )
    vf = valid.astype(jnp.float32)  # [1, K]

    hi_row = jnp.floor(tile / float(_LO_LANES))  # [1, K]
    lo_row = tile - hi_row * float(_LO_LANES)

    # Mosaic cannot lower a float iota (tpu.iota -> vector<...xf32> fails
    # on hardware; interpret mode accepts it) — generate int32 and cast.
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (h_rows, 1), 0).astype(
        jnp.float32
    )
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (_LO_LANES, 1), 0).astype(
        jnp.float32
    )
    oh_hi = ((iota_h == hi_row) & valid).astype(jnp.float32)  # [H, K]
    oh_lo = ((iota_l == lo_row) & valid).astype(jnp.float32)  # [128, K]

    # Counter read by one-hot contraction: tmp[lo, f] = sum_hi C[hi, lo]
    # oh_hi[hi, f]; then select the fragment's lo lane. Counter planes are
    # < 2^13, exact under HIGHEST (bf16x3).
    def read(c):
        tmp = jax.lax.dot_general(
            c, oh_hi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HIGH,
        )  # [128, K]
        return jnp.sum(tmp * oh_lo, axis=0, keepdims=True)  # [1, K]

    running = read(chi_ref[...]) * _SPLIT + read(clo_ref[...])

    # Same-tile-within-block rank via one-hot Grams (0/1 products are
    # exact at any precision; sums <= K accumulate exactly in f32).
    gram_hi = jax.lax.dot_general(
        oh_hi, oh_hi, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [K, K]
    gram_lo = jax.lax.dot_general(
        oh_lo, oh_lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    jj = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    strict = (jj < kk).astype(jnp.float32)
    intra = jnp.sum(gram_hi * gram_lo * strict, axis=0, keepdims=True)

    dst = running + intra  # [1, K] f32, exact ints < 2^24
    f_row = fi_row.astype(jnp.float32)
    dst = jnp.where(valid, dst, f_row)  # padding -> identity (>= total)

    out_ref[...] = jnp.concatenate(
        [
            dst.astype(jnp.int32),
            jnp.where(valid, gid.astype(jnp.int32), 0),
            jnp.where(valid, tile.astype(jnp.int32), t_total),
            jnp.zeros((1, k), jnp.int32),
        ],
        axis=0,
    )

    # Advance counters; normalize the 12-bit split with an explicit carry.
    d_lo = jax.lax.dot_general(
        oh_hi, oh_lo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H, 128], block counts <= K
    new_lo = clo_ref[...] + d_lo
    carry = jnp.floor(new_lo / _SPLIT)
    chi_ref[...] += carry
    clo_ref[...] = new_lo - carry * _SPLIT


def place_fragments(tab_t: jnp.ndarray, total: jnp.ndarray,
                    tile_start: jnp.ndarray, f_cap: int, tiles_x: int,
                    t_total: int, k: int = EXPAND_BLOCK):
    """Expand + compute destination slots in one sequential Pallas pass.

    ``tile_start``: [t_total] int32 exclusive per-tile offsets (from
    :func:`tile_histogram`). Returns (dst, gid, tile) int32 [f_cap] in
    gaussian-major order; ``dst`` is the stable-by-depth tile-major slot.
    """
    assert f_cap % k == 0
    n_blocks = f_cap // k
    n_win = tab_t.shape[1] // k
    h_rows = counter_rows(t_total)

    from .expand import ROW_OFF_HI, ROW_OFF_LO, _SPLIT as _OSPLIT

    off_full = tab_t[ROW_OFF_HI] * _OSPLIT + tab_t[ROW_OFF_LO]
    block_first = (
        jnp.searchsorted(
            off_full,
            (jnp.arange(n_blocks, dtype=jnp.int32) * k).astype(jnp.float32),
            side="right",
        ).astype(jnp.int32)
        - 1
    )
    win0 = jnp.clip(block_first // k, 0, n_win - 2).astype(jnp.int32)
    total32 = jnp.reshape(total.astype(jnp.int32), (1,))

    ts2d = jnp.zeros((h_rows * _LO_LANES,), jnp.float32)
    ts2d = ts2d.at[:t_total].set(tile_start.astype(jnp.float32))
    ts2d = ts2d.reshape(h_rows, _LO_LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((TAB_ROWS, k), lambda b, w0, tt: (0, w0[b])),
            pl.BlockSpec((TAB_ROWS, k), lambda b, w0, tt: (0, w0[b] + 1)),
            pl.BlockSpec((h_rows, _LO_LANES), lambda b, w0, tt: (0, 0)),
        ],
        out_specs=pl.BlockSpec((4, k), lambda b, w0, tt: (0, b)),
        scratch_shapes=[
            pltpu.VMEM((h_rows, _LO_LANES), jnp.float32),
            pltpu.VMEM((h_rows, _LO_LANES), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_place_kernel, k=k, tiles_x=tiles_x,
                          t_total=t_total, h_rows=h_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, f_cap), jnp.int32),
        interpret=interpret_mode(),
    )(win0, total32, tab_t, tab_t, ts2d)
    return out[0], out[1], out[2]


def tile_histogram(x0, y0, x1, y1, live, tiles_x: int, tiles_y: int):
    """Per-tile fragment counts without touching fragment scale.

    2D corner-difference trick: each live gaussian adds +-1 at its bbox
    corners of a (tiles_y+1) x (tiles_x+1) grid; a 2D inclusive prefix sum
    recovers per-tile coverage counts. One N-scale scatter-add + an
    O(tiles) cumsum.
    """
    w1 = tiles_x + 1
    v = live.astype(jnp.int32)
    idx = jnp.concatenate(
        [y0 * w1 + x0, y0 * w1 + x1, y1 * w1 + x0, y1 * w1 + x1]
    )
    val = jnp.concatenate([v, -v, -v, v])
    d = jnp.zeros(((tiles_y + 1) * w1,), jnp.int32).at[idx].add(val)
    hist2 = jnp.cumsum(
        jnp.cumsum(d.reshape(tiles_y + 1, w1), axis=0), axis=1
    )
    return hist2[:tiles_y, :tiles_x].reshape(-1)
