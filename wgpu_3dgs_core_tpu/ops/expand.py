"""Pallas fragment expansion: gaussian segments -> (tile, gid) stream.

Replaces the fragment-scale XLA ops in the expansion half of binning
(``associative_scan`` owner search + the [F, 5] segment-table row gather;
see ops/binning.py) with one Pallas kernel built on a bounded one-hot MXU
contraction (PERF_NOTES.md item 2):

- Gaussians with zero fragments are compacted out of the segment table, so
  every table row owns >= 1 fragment and the owners of any K consecutive
  fragments occupy <= K *contiguous* table rows.
- Each grid step therefore only needs a 2-block aligned window of the
  (transposed) segment table. The owner of each fragment is found by
  comparing the fragment index against the window's [offset, offset+count)
  ranges, and the owner's attributes are fetched with a single
  [R, 2K] x [2K, K] one-hot matmul on the MXU — a gather with no gather.

MXU exactness at native bf16 rate: every table row is stored bf16 such
that the bf16 contraction is EXACT (each fetched value has exactly one
nonzero one-hot term, and one-hot entries are 0/1):

- integer fields (fragment offsets, counts, gaussian ids, bbox fields)
  are stored as base-256 digits — each digit <= 255 is bf16-exact — and
  recombined after the contraction (f32 adds of values < 2^24, exact);
- f32 attribute values are stored as THREE bf16 rows b1+b2+b3 with
  b1 = rn(x), b2 = rn(x - b1), b3 = x - b1 - b2 (the residual after two
  rounds fits bf16's 8 mantissa bits, so b3 is exact and the in-kernel
  f32 reconstruction (b1 + b2) + b3 returns x BIT-EXACTLY — the same
  decomposition XLA's own HIGHEST = bf16x3 emulation uses).

Versus the previous layout (f32 rows contracted at HIGHEST), this runs
one bf16 MXU pass instead of three and halves the window DMA bytes,
at identical results (round-5 item; VERDICT r4 "what's weak" #1/item 4).

All remaining host-side work (cumsum, compaction sort, window index
searchsorted) is at gaussian (N) or block (F/K) scale, never fragment
scale.

The reference crate has no analog (its binning lives downstream of
wgpu-3dgs-core); this implements SURVEY.md §7 M4/M7 hard part #1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_bundle import interpret_mode

# Fragment block size: one grid step expands this many fragments. The
# one-hot contraction cost is linear in the block size (2K MACs/fragment)
# and stays far below the per-grid-step dispatch overhead, so bigger
# blocks win, but the one-hot MAC cost is linear in the block: 512
# measured ~18 ms/pass vs 1024's ~30+. 512 is the sweet spot.
EXPAND_BLOCK = 512

# Segment-table rows (attribute-major, transposed for lane-major access).
# Every row value is <= 255 (bf16-exact): integers are base-256 digits.
ROW_OFF0 = 0  # exclusive fragment offset & 0xff
ROW_OFF1 = 1  # (offset >> 8) & 0xff
ROW_OFF2 = 2  # offset >> 16 (offset < 2^24)
ROW_CNT0 = 3  # fragment count & 0xff
ROW_CNT1 = 4  # count >> 8 (count < 2^16)
ROW_SPAN = 5  # bbox tile width, max(span_x, 1) — requires tiles_x < 256
ROW_X0 = 6  # first tile column (< 256)
ROW_Y0 = 7  # first (strip-local) tile row (< 256)
ROW_GID0 = 8  # original gaussian index & 0xff
ROW_GID1 = 9  # (gid >> 8) & 0xff
ROW_GID2 = 10  # gid >> 16 (gid < 2^24)
TAB_ROWS = 16  # padded to the bf16 sublane tile (16 rows)

# f32 holds integers exactly up to 2^24; recombined digit sums stay below.
_F32_EXACT = float(1 << 24)
_HIGH = jax.lax.Precision.HIGHEST


def _digits3(x):
    """Base-256 digits of an int32 array (values < 2^24), as f32 rows."""
    x = x.astype(jnp.int32)
    return (
        (x & 0xFF).astype(jnp.float32),
        ((x >> 8) & 0xFF).astype(jnp.float32),
        (x >> 16).astype(jnp.float32),
    )


def split3(x):
    """Exact 3-term bf16 decomposition of f32: b1 + b2 + b3 == x bitwise.

    The in-kernel reconstruction (b1 + b2) + b3 in f32 is exact: b1 + b2
    fits 17 significand bits, and the true sum is the representable x.
    Inputs must be finite (sanitize NaN/inf first — a NaN row entry would
    poison the whole one-hot contraction window, since NaN * 0 = NaN).
    """
    b1 = x.astype(jnp.bfloat16)
    r1 = x - b1.astype(jnp.float32)
    b2 = r1.astype(jnp.bfloat16)
    b3 = (r1 - b2.astype(jnp.float32)).astype(jnp.bfloat16)
    return b1, b2, b3


def live_grid(total, n_blocks, k):
    """Live-bound dynamic grid for F-capacity kernels on hardware.

    Runs only the blocks holding live items (Mosaic dynamic grid bounds;
    see ops/rasterize._grid_steps / CLAUDE.md). Callers MUST mask the
    never-executed output tail XLA-side (unwritten memory can be NaN).
    Interpret mode keeps the static capacity grid.
    """
    if interpret_mode():
        return n_blocks
    t = jnp.minimum(total.astype(jnp.int32), n_blocks * k)
    return jnp.clip(jax.lax.div(t + k - 1, k), 1, n_blocks)


def _recombine_off_cnt(win):
    """f32 (off, cnt) rows [1, W] from a bf16 int-table window [16, W]."""
    off = (
        win[ROW_OFF0 : ROW_OFF0 + 1, :].astype(jnp.float32)
        + win[ROW_OFF1 : ROW_OFF1 + 1, :].astype(jnp.float32) * 256.0
        + win[ROW_OFF2 : ROW_OFF2 + 1, :].astype(jnp.float32) * 65536.0
    )
    cnt = (
        win[ROW_CNT0 : ROW_CNT0 + 1, :].astype(jnp.float32)
        + win[ROW_CNT1 : ROW_CNT1 + 1, :].astype(jnp.float32) * 256.0
    )
    return off, cnt


def _owner_onehot(b, t0_ref, t1_ref, k):
    """[K, 2K] one-hot owner-membership matrix for fragment block ``b``.

    off <= f < off + cnt (VPU compare, exact f32). Rows are compacted
    (cnt >= 1), so exactly one column matches per in-range fragment.
    """
    win = jnp.concatenate([t0_ref[...], t1_ref[...]], axis=1)  # [16, 2K]
    off, cnt = _recombine_off_cnt(win)
    f_col = (b * k + jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)).astype(
        jnp.float32
    )
    oh = (off <= f_col) & (f_col < off + cnt)
    return win, oh.astype(jnp.bfloat16)


def _decode_ints(ints, fi_row, tiles_x):
    """Per-fragment (tile, gid) f32 rows from the fetched digit rows."""
    f_row = fi_row.astype(jnp.float32)
    off_o = (
        ints[ROW_OFF0 : ROW_OFF0 + 1, :]
        + ints[ROW_OFF1 : ROW_OFF1 + 1, :] * 256.0
        + ints[ROW_OFF2 : ROW_OFF2 + 1, :] * 65536.0
    )
    gid = (
        ints[ROW_GID0 : ROW_GID0 + 1, :]
        + ints[ROW_GID1 : ROW_GID1 + 1, :] * 256.0
        + ints[ROW_GID2 : ROW_GID2 + 1, :] * 65536.0
    )
    rank = f_row - off_o
    span = jnp.maximum(ints[ROW_SPAN : ROW_SPAN + 1, :], 1.0)
    dy = jnp.floor(rank / span)
    dx = rank - dy * span
    tile = (ints[ROW_Y0 : ROW_Y0 + 1, :] + dy) * float(tiles_x) + (
        ints[ROW_X0 : ROW_X0 + 1, :] + dx
    )
    return tile, gid


def expand_math(b, total_ref, t0_ref, t1_ref, *, k: int, tiles_x: int):
    """Shared per-block expansion: owner lookup + (tile, gid) rows.

    Returns f32 rows ``tile`` [1, K] (exact integers), ``gid`` [1, K], and
    bool ``valid`` [1, K].
    """
    win, oh = _owner_onehot(b, t0_ref, t1_ref, k)
    # Gather-by-matmul: [16, 2K] x [2K, K] -> the owner's digit column per
    # fragment. bf16 digits (<= 255) x 0/1 one-hot: exact at DEFAULT.
    ints = jax.lax.dot_general(
        win, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [16, K]
    ints = jnp.round(ints)
    fi_row = b * k + jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    tile, gid = _decode_ints(ints, fi_row, tiles_x)
    valid = fi_row < total_ref[0]
    return tile, gid, valid, fi_row


def _expand_kernel(win0_ref, total_ref, t0_ref, t1_ref, out_ref, *,
                   k: int, tiles_x: int, t_total: int):
    del win0_ref  # only consumed by the index maps
    tile, gid, valid, _ = expand_math(
        pl.program_id(0), total_ref, t0_ref, t1_ref, k=k, tiles_x=tiles_x
    )
    tile_i = jnp.where(valid, tile.astype(jnp.int32), t_total)
    gid_i = jnp.where(valid, gid.astype(jnp.int32), 0)
    out_ref[...] = jnp.concatenate([tile_i, gid_i], axis=0)


def _expand_attr_kernel(win0_ref, total_ref, t0_ref, t1_ref, a0_ref, a1_ref,
                        out_ref, attr_ref, *,
                        k: int, tiles_x: int, t_total: int):
    """Expansion + per-fragment attribute fetch in one pass.

    The same one-hot owner matrix that resolves (tile, gid) contracts the
    split-bf16 attribute window on the MXU: a gather with no gather
    (PERF_NOTES item 2), BIT-EXACT at native bf16 rate (see module doc).
    """
    del win0_ref
    b = pl.program_id(0)
    win, oh = _owner_onehot(b, t0_ref, t1_ref, k)

    # ONE joint contraction for the integer digits and the split
    # attributes: [16 + 32, 2K] x [2K, K], single bf16 pass.
    awin = jnp.concatenate([a0_ref[...], a1_ref[...]], axis=1)
    joint = jnp.concatenate([win, awin], axis=0)
    fetched = jax.lax.dot_general(
        joint, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [48, K] f32
    ints = jnp.round(fetched[:TAB_ROWS])

    fi_row = b * k + jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    tile, gid = _decode_ints(ints, fi_row, tiles_x)
    valid = fi_row < total_ref[0]

    # Exact f32 reconstruction: value i = sum of its 3 bf16 term rows.
    vals = fetched[TAB_ROWS:]
    rec = [
        (vals[3 * i : 3 * i + 1, :] + vals[3 * i + 1 : 3 * i + 2, :])
        + vals[3 * i + 2 : 3 * i + 3, :]
        for i in range(ATTR_VALS)
    ]
    # The owning gaussian id also rides as an f32 attribute row (exact
    # below 2^24): the renderer's sorted-stream matrix keys the backward
    # reorder by it, so no fragment-scale int<->float casts downstream.
    rec.append(jnp.where(valid, gid, 0.0))
    pad = jnp.zeros((ATTR_OUT_ROWS - ATTR_VALS - 1, k), jnp.float32)
    attr_ref[...] = jnp.concatenate(rec + [pad], axis=0)

    tile_i = jnp.where(valid, tile.astype(jnp.int32), t_total)
    gid_i = jnp.where(valid, gid.astype(jnp.int32), 0)
    out_ref[...] = jnp.concatenate([tile_i, gid_i], axis=0)


def _int_digit_cols(offsets, counts, span_x, x0, y0, gid):
    """The 11 live digit rows of the int table, as f32 [11, N]."""
    o0, o1, o2 = _digits3(offsets)
    c0 = (counts & 0xFF).astype(jnp.float32)
    c1 = (counts >> 8).astype(jnp.float32)
    g0, g1, g2 = _digits3(gid)
    return [
        o0, o1, o2, c0, c1,
        jnp.maximum(span_x, 1).astype(jnp.float32),
        x0.astype(jnp.float32),
        y0.astype(jnp.float32),
        g0, g1, g2,
    ]


def _check_limits(n, tiles_x=None):
    if n >= (1 << 24):
        raise ValueError("expand kernel requires N < 2^24 (f32-exact ids)")
    if tiles_x is not None and tiles_x >= 256:
        raise ValueError(
            "expand kernel requires tiles_x < 256 (base-256 digit rows); "
            "render wider images in horizontal strips"
        )


def _pack_tab(rows_f32, n_pad):
    """Stack 11 digit rows + pad guard into the bf16 [16, n_pad] table."""
    n = rows_f32[0].shape[0]
    tab = jnp.stack(
        rows_f32 + [jnp.zeros((n,), jnp.float32)] * (TAB_ROWS - 11), axis=0
    )
    pad = jnp.zeros((TAB_ROWS, n_pad - n), jnp.float32)
    # Never-match guard columns: count 0 (matches nothing) and maximal
    # offset digits so the offset row stays monotone for searchsorted.
    pad = pad.at[ROW_OFF0].set(255.0)
    pad = pad.at[ROW_OFF1].set(255.0)
    pad = pad.at[ROW_OFF2].set(255.0)
    return jnp.concatenate([tab, pad], axis=1).astype(jnp.bfloat16)


def table_offsets(tab_t: jnp.ndarray) -> jnp.ndarray:
    """Monotone f32 offset column recombined from the digit rows."""
    return (
        tab_t[ROW_OFF0].astype(jnp.float32)
        + tab_t[ROW_OFF1].astype(jnp.float32) * 256.0
        + tab_t[ROW_OFF2].astype(jnp.float32) * 65536.0
    )


def table_counts(tab_t: jnp.ndarray) -> jnp.ndarray:
    """f32 fragment-count column recombined from the digit rows."""
    return (
        tab_t[ROW_CNT0].astype(jnp.float32)
        + tab_t[ROW_CNT1].astype(jnp.float32) * 256.0
    )


def table_gids(tab_t: jnp.ndarray) -> jnp.ndarray:
    """f32 gaussian-id column recombined from the digit rows."""
    return (
        tab_t[ROW_GID0].astype(jnp.float32)
        + tab_t[ROW_GID1].astype(jnp.float32) * 256.0
        + tab_t[ROW_GID2].astype(jnp.float32) * 65536.0
    )


def build_segment_table(offsets: jnp.ndarray, counts: jnp.ndarray,
                        span_x: jnp.ndarray, x0: jnp.ndarray, y0: jnp.ndarray,
                        gid: jnp.ndarray, k: int = EXPAND_BLOCK):
    """Compact nonzero-count gaussians into a transposed segment table.

    Returns ``tabT`` [16, n_pad + k] bf16 with pad rows that never match
    (count 0, offset 2^24 - 1). All ops here are N-scale (one cumsum + one
    scatter row-set). Scatter-based variant for the XLA fallback path and
    tests; the production path is :func:`build_tables`.
    """
    n = counts.shape[0]
    _check_limits(n)
    n_pad = -(-max(n, 1) // k) * k + k

    nz = counts > 0
    dst = jnp.cumsum(nz.astype(jnp.int32)) - 1
    dst = jnp.where(nz, dst, n_pad + k)  # OOB -> dropped by the scatter

    cols = jnp.stack(
        _int_digit_cols(offsets, counts, span_x, x0, y0, gid), axis=0
    )  # [11, N]

    init = jnp.zeros((TAB_ROWS, n_pad), jnp.float32)
    init = init.at[ROW_OFF0].set(255.0)
    init = init.at[ROW_OFF1].set(255.0)
    init = init.at[ROW_OFF2].set(255.0)
    pad_rows = jnp.zeros((TAB_ROWS - 11, n), jnp.float32)
    tab_t = init.at[:, dst].set(
        jnp.concatenate([cols, pad_rows], axis=0), mode="drop"
    )
    return tab_t.astype(jnp.bfloat16)


def _window_starts(tab_t, n_blocks, k):
    """Aligned table-window index per fragment block (block-scale)."""
    n_win = tab_t.shape[1] // k
    off_full = table_offsets(tab_t)
    block_first = (
        jnp.searchsorted(
            off_full,
            (jnp.arange(n_blocks, dtype=jnp.int32) * k).astype(jnp.float32),
            side="right",
        ).astype(jnp.int32)
        - 1
    )
    return jnp.clip(block_first // k, 0, n_win - 2).astype(jnp.int32)


def expand_fragments(tab_t: jnp.ndarray, total: jnp.ndarray, f_cap: int,
                     tiles_x: int, t_total: int,
                     k: int = EXPAND_BLOCK):
    """Expand the compacted segment table into (tile, gid) streams.

    ``tab_t``: [16, n_pad] bf16 from :func:`build_segment_table`.
    ``total``: scalar int32 live-fragment count (= offsets[-1] + counts[-1]).
    Returns ``tile`` [f_cap] int32 (== t_total on padding slots) and
    ``gid`` [f_cap] int32, in gaussian-major (depth) order.
    """
    assert f_cap % k == 0, "fragment capacity must be a block multiple"
    n_blocks = f_cap // k
    win0 = _window_starts(tab_t, n_blocks, k)
    total32 = jnp.reshape(total.astype(jnp.int32), (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(live_grid(total, n_blocks, k),),
        in_specs=[
            pl.BlockSpec((TAB_ROWS, k), lambda b, w0, tt: (0, w0[b])),
            pl.BlockSpec((TAB_ROWS, k), lambda b, w0, tt: (0, w0[b] + 1)),
        ],
        out_specs=pl.BlockSpec((2, k), lambda b, w0, tt: (0, b)),
    )
    out = pl.pallas_call(
        functools.partial(_expand_kernel, k=k, tiles_x=tiles_x,
                          t_total=t_total),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, f_cap), jnp.int32),
        interpret=interpret_mode(),
    )(win0, total32, tab_t, tab_t)
    return out[0], out[1]


# Attribute values carried through the fused expand: x, y, conic a/b/c,
# r, g, b, opacity. (No depth: the table is compacted in DEPTH order, so
# expansion emits depth-major and the fragment sort needs only the tile
# key.) Each value is stored as 3 bf16 rows (exact split); the kernel
# reconstructs f32 and appends the owning gaussian id as output row 9.
ATTR_VALS = 9
ATTR_TAB_ROWS = 32  # 9 * 3 = 27 split rows, padded to a bf16 tile
ATTR_OUT_ROWS = 16  # f32 output rows: 9 values + gid + 6 pad
GID_ATTR_ROW = 9


def expand_fragments_with_attrs(tab_t: jnp.ndarray, attr_t: jnp.ndarray,
                                total: jnp.ndarray, f_cap: int,
                                tiles_x: int, t_total: int,
                                k: int = EXPAND_BLOCK):
    """Expansion fused with the one-hot attribute fetch.

    ``attr_t``: [32, n_pad] bf16 split-attribute table (build_tables).
    Returns (tile [f_cap] i32, gid [f_cap] i32, attrs [ATTR_OUT_ROWS,
    f_cap] f32) in gaussian-major order — the per-fragment attribute fetch
    without any fragment-scale gather (PERF_NOTES item 2).
    """
    assert f_cap % k == 0, "fragment capacity must be a block multiple"
    n_blocks = f_cap // k
    win0 = _window_starts(tab_t, n_blocks, k)
    total32 = jnp.reshape(total.astype(jnp.int32), (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(live_grid(total, n_blocks, k),),
        in_specs=[
            pl.BlockSpec((TAB_ROWS, k), lambda b, w0, tt: (0, w0[b])),
            pl.BlockSpec((TAB_ROWS, k), lambda b, w0, tt: (0, w0[b] + 1)),
            pl.BlockSpec((ATTR_TAB_ROWS, k), lambda b, w0, tt: (0, w0[b])),
            pl.BlockSpec((ATTR_TAB_ROWS, k),
                         lambda b, w0, tt: (0, w0[b] + 1)),
        ],
        out_specs=[
            pl.BlockSpec((2, k), lambda b, w0, tt: (0, b)),
            pl.BlockSpec((ATTR_OUT_ROWS, k), lambda b, w0, tt: (0, b)),
        ],
    )
    ints, attrs = pl.pallas_call(
        functools.partial(_expand_attr_kernel, k=k, tiles_x=tiles_x,
                          t_total=t_total),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((2, f_cap), jnp.int32),
            jax.ShapeDtypeStruct((ATTR_OUT_ROWS, f_cap), jnp.float32),
        ],
        interpret=interpret_mode(),
    )(win0, total32, tab_t, tab_t, attr_t, attr_t)
    return ints[0], ints[1], attrs


def build_attr_table(attr_cols: jnp.ndarray, counts: jnp.ndarray,
                     k: int = EXPAND_BLOCK) -> jnp.ndarray:
    """Compact per-gaussian f32 attributes [A, N] into the split-bf16
    attribute-table layout (same dst scatter/padding as
    :func:`build_segment_table`). Scatter-based variant for tests."""
    n = counts.shape[0]
    n_pad = -(-max(n, 1) // k) * k + k
    nz = counts > 0
    dst = jnp.cumsum(nz.astype(jnp.int32)) - 1
    dst = jnp.where(nz, dst, n_pad + k)
    a = attr_cols.shape[0]
    rows = []
    for i in range(a):
        rows.extend(split3(attr_cols[i]))
    rows.extend(
        jnp.zeros((attr_cols.shape[1],), jnp.bfloat16)
        for _ in range(ATTR_TAB_ROWS - 3 * a)
    )
    init = jnp.zeros((ATTR_TAB_ROWS, n_pad), jnp.bfloat16)
    return init.at[:, dst].set(jnp.stack(rows, axis=0), mode="drop")


def build_tables(counts, span_x, x0, y0, gid, attr_rows, depth,
                 k: int = EXPAND_BLOCK):
    """Compact BOTH tables in DEPTH order with one N-scale sort.

    The compaction (nonzero-count gaussians first, then ascending depth,
    stable over the original order — exactly the reference renderer's
    stable depth argsort semantics) is a stable 2-key sort with every
    table column riding as a payload — measured ~10x cheaper than the
    per-column `at[:, dst].set` scatters it replaces (~118 ms at N=1M).
    Because the table is depth-ordered, expansion emits fragments
    depth-major and the downstream fragment-scale sort needs only the
    tile key (round-5: one key + one fewer payload column at F scale).
    Fragment offsets are recomputed from the sorted counts (the exclusive
    cumsum must follow emission order). Integer columns ride the sort at
    full width (f32-exact < 2^24) and are digitized after; attribute
    columns ride f32 and are exact-split to bf16 after. Returns
    (tab_t [16, n_pad] bf16, attr_t [32, n_pad] bf16); tail columns past
    the live count are rewritten to never-match defaults so the window
    searchsorted stays monotone.
    """
    n = counts.shape[0]
    _check_limits(n)
    n_pad = -(-max(n, 1) // k) * k + k

    int_cols = (
        counts.astype(jnp.float32),
        jnp.maximum(span_x, 1).astype(jnp.float32),
        x0.astype(jnp.float32),
        y0.astype(jnp.float32),
        gid.astype(jnp.float32),
    )
    a = attr_rows.shape[0]
    assert 3 * a <= ATTR_TAB_ROWS, "attr table holds at most 10 split values"
    key = (counts == 0).astype(jnp.int32)  # zeros last, stable
    # Masked gaussians carry inf depth but sort by the zero-count key
    # first, so inf never decides an order among live rows.
    out = jax.lax.sort(
        (key, depth, *int_cols, *(attr_rows[i] for i in range(a))),
        num_keys=2, is_stable=True,
    )
    n_live = jnp.sum(counts > 0)
    tail = jnp.arange(n, dtype=jnp.int32) >= n_live

    cnt_s = jnp.where(tail, 0.0, out[2]).astype(jnp.int32)
    # Exclusive offsets in emission (depth) order; tail -> never-match.
    off_sorted = jnp.cumsum(cnt_s) - cnt_s
    off_s = jnp.where(tail, jnp.int32(_F32_EXACT - 1.0), off_sorted)
    span_s = out[3].astype(jnp.int32)
    x0_s = out[4].astype(jnp.int32)
    y0_s = out[5].astype(jnp.int32)
    gid_s = out[6].astype(jnp.int32)
    tab_t = _pack_tab(
        _int_digit_cols(off_s, cnt_s, span_s, x0_s, y0_s, gid_s), n_pad
    )

    attr_split = []
    for i in range(a):
        # Tail sanitization: an inf/NaN bf16 entry would poison the whole
        # contraction window (NaN * 0 = NaN in the fetch matmul).
        col = jnp.where(tail, 0.0, out[7 + i])
        attr_split.extend(split3(col))
    attr_split.extend(
        jnp.zeros((n,), jnp.bfloat16)
        for _ in range(ATTR_TAB_ROWS - 3 * a)
    )
    attr = jnp.stack(attr_split, axis=0)  # [32, N] bf16
    attr_t = jnp.concatenate(
        [attr, jnp.zeros((ATTR_TAB_ROWS, n_pad - n), jnp.bfloat16)], axis=1
    )
    return tab_t, attr_t


# ---------------------------------------------------------------------------
# Two-level expansion: gaussians -> tile ROWS -> fragments (round 5).
#
# The bbox rectangle over-counts tiles the cutoff ellipse never touches
# (~26% of fragments on the bench scene, ~15% on the heavy scene — measured
# by tools/probe_rowtrim.py). Exact per-tile-row x-intervals need per-row
# segment granularity, which the window machinery above already supports:
# a (gaussian, tile-row) entry with span == count is just a segment whose
# rank decode has dy == 0. Level 1 expands gaussians into their bbox rows
# (every bbox row intersects the ellipse, so every row owns >= 1 fragment
# and no compaction is needed); level 2 is expand_fragments_with_attrs
# UNCHANGED, fed a per-row table built elementwise at row scale
# (build_row_tables). The per-gaussian depth-ordered table (build_tables
# with counts = span_y) keeps the backward segment reduction's unique-gid
# column exactly as before.
#
# Row-stream layout emitted by the level-1 kernel ([16, r_cap] f32):
ROWS_X0 = 0  # bbox first tile column
ROWS_ROW = 1  # strip-local tile row (y0 + rank)
ROWS_SPANX = 2  # bbox tile width
ROWS_RY = 3  # extent[:, 1]: the cutoff ellipse's pixel half-extent in y
ROWS_ATTR0 = 4  # rows 4..12: the 9 blend attributes (x y conic3 rgb op)
ROWS_GID = 13  # owning gaussian id (f32-exact)
ROW_ATTR_VALS = 10  # level-1 attr table: 9 blend values + ry


def _expand_row_kernel(win0_ref, total_ref, t0_ref, t1_ref, a0_ref, a1_ref,
                       out_ref, *, k: int):
    """Level-1 expansion: one output column per (gaussian, bbox tile row).

    The per-gaussian table stores counts = span_y (rows per gaussian) and
    keeps span_x/x0/y0 as passthrough digit rows, so the same one-hot
    owner match yields rank == dy and every bbox field directly.
    """
    del win0_ref
    b = pl.program_id(0)
    win, oh = _owner_onehot(b, t0_ref, t1_ref, k)
    awin = jnp.concatenate([a0_ref[...], a1_ref[...]], axis=1)
    joint = jnp.concatenate([win, awin], axis=0)
    fetched = jax.lax.dot_general(
        joint, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [48, K]
    ints = jnp.round(fetched[:TAB_ROWS])
    off = (
        ints[ROW_OFF0:ROW_OFF0 + 1, :]
        + ints[ROW_OFF1:ROW_OFF1 + 1, :] * 256.0
        + ints[ROW_OFF2:ROW_OFF2 + 1, :] * 65536.0
    )
    gid = (
        ints[ROW_GID0:ROW_GID0 + 1, :]
        + ints[ROW_GID1:ROW_GID1 + 1, :] * 256.0
        + ints[ROW_GID2:ROW_GID2 + 1, :] * 65536.0
    )
    fi_row = b * k + jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    rank = fi_row.astype(jnp.float32) - off
    vals = fetched[TAB_ROWS:]
    rec = [
        (vals[3 * i:3 * i + 1, :] + vals[3 * i + 1:3 * i + 2, :])
        + vals[3 * i + 2:3 * i + 3, :]
        for i in range(ROW_ATTR_VALS)
    ]  # 9 blend attrs + ry, bit-exact f32
    valid = fi_row < total_ref[0]
    gid = jnp.where(valid, gid, 0.0)
    out_ref[...] = jnp.concatenate(
        [
            ints[ROW_X0:ROW_X0 + 1, :],
            ints[ROW_Y0:ROW_Y0 + 1, :] + rank,
            ints[ROW_SPAN:ROW_SPAN + 1, :],
            rec[9],  # ry
        ]
        + rec[:9]
        + [gid, jnp.zeros((2, k), jnp.float32)],
        axis=0,
    )


def expand_rows(tab_t: jnp.ndarray, attr_t: jnp.ndarray,
                total_rows: jnp.ndarray, r_cap: int,
                k: int = EXPAND_BLOCK) -> jnp.ndarray:
    """Expand the per-gaussian (counts = span_y) table into the row stream.

    Returns [16, r_cap] f32 (layout: ROWS_* above). Slots past
    ``total_rows`` are NEVER WRITTEN on hardware (live-bound grid) —
    callers must mask the tail before consuming it.
    """
    assert r_cap % k == 0, "row capacity must be a block multiple"
    n_blocks = r_cap // k
    win0 = _window_starts(tab_t, n_blocks, k)
    total32 = jnp.reshape(total_rows.astype(jnp.int32), (1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(live_grid(total_rows, n_blocks, k),),
        in_specs=[
            pl.BlockSpec((TAB_ROWS, k), lambda b, w0, tt: (0, w0[b])),
            pl.BlockSpec((TAB_ROWS, k), lambda b, w0, tt: (0, w0[b] + 1)),
            pl.BlockSpec((ATTR_TAB_ROWS, k), lambda b, w0, tt: (0, w0[b])),
            pl.BlockSpec((ATTR_TAB_ROWS, k),
                         lambda b, w0, tt: (0, w0[b] + 1)),
        ],
        out_specs=pl.BlockSpec((16, k), lambda b, w0, tt: (0, b)),
    )
    return pl.pallas_call(
        functools.partial(_expand_row_kernel, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, r_cap), jnp.float32),
        interpret=interpret_mode(),
    )(win0, total32, tab_t, tab_t, attr_t, attr_t)


def build_row_tables(off_r, cnt_r, tx0_r, row_r, gid_r, attr9_f32, live_r,
                     k: int = EXPAND_BLOCK):
    """Per-row segment + attribute tables for level-2 expansion.

    All elementwise at row scale (no sort: the row stream is already
    depth-major and fully live — every row owns >= 1 fragment). ``off_r``
    must already be the exclusive cumsum of ``cnt_r`` with dead rows
    masked to a monotone never-match tail. ``attr9_f32`` is [9, r_cap]
    (bit-exact f32 values from the level-1 fetch).
    Returns (tab2 [16, r_pad] bf16, attr2 [32, r_pad] bf16).
    """
    r_cap = cnt_r.shape[0]
    assert r_cap % k == 0
    r_pad = r_cap + k
    off_i = jnp.where(live_r, off_r, _F32_EXACT - 1.0).astype(jnp.int32)
    cnt_i = jnp.where(live_r, cnt_r, 0.0).astype(jnp.int32)
    # span == count: the level-2 rank decode becomes dy = 0, dx = rank.
    tab2 = _pack_tab(
        _int_digit_cols(
            off_i, cnt_i, cnt_i, tx0_r.astype(jnp.int32),
            row_r.astype(jnp.int32), gid_r.astype(jnp.int32),
        ),
        r_pad,
    )
    attr_split = []
    for i in range(9):
        col = jnp.where(live_r, attr9_f32[i], 0.0)
        attr_split.extend(split3(col))
    attr_split.extend(
        jnp.zeros((r_cap,), jnp.bfloat16)
        for _ in range(ATTR_TAB_ROWS - 27)
    )
    attr2 = jnp.concatenate(
        [
            jnp.stack(attr_split, axis=0),
            jnp.zeros((ATTR_TAB_ROWS, r_pad - r_cap), jnp.bfloat16),
        ],
        axis=1,
    )
    return tab2, attr2
