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
  [8, 2K] x [2K, K] one-hot matmul on the MXU — a gather with no gather.

MXU exactness: the TPU contracts f32 as bf16 multi-pass. Even at
``precision=HIGHEST`` (fp32 contract = bf16x3) a product a*1 is exact only
while ``a`` fits in 16 mantissa bits (hi8 + lo8); measured on hardware,
DEFAULT precision corrupts 2^22-scale integers by ~24k and HIGHEST by ~1.
Values that can exceed 2^16 (fragment offsets, gaussian ids, up to 2^24)
are therefore stored as hi/lo 12-bit halves in separate table rows — each
half is exact under bf16x3 — and recombined after the contraction.

All remaining host-side work (cumsum, compaction scatter, window index
searchsorted) is at gaussian (N) or block (F/K) scale, never fragment scale.

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
# blocks win (measured: bin_splats was dominated by expand grid steps at
# 256), but the one-hot MAC cost is linear in the block: 512 measured
# ~18 ms/pass vs 1024's ~30+ (and 1024 with two separate contractions
# blew the 16 MB scoped-vmem budget). 512 is the sweet spot.
EXPAND_BLOCK = 512

# Segment-table rows (attribute-major, transposed for lane-major access).
# offset/gid are split into 12-bit halves for MXU-exact contraction.
ROW_OFF_HI = 0  # exclusive fragment offset >> 12
ROW_OFF_LO = 1  # exclusive fragment offset & 0xfff
ROW_COUNT = 2  # fragment count (>= 1 after compaction, <= tiles)
ROW_SPAN = 3  # bbox tile width, max(span_x, 1)
ROW_X0 = 4  # first tile column
ROW_Y0 = 5  # first tile row
ROW_GID_HI = 6  # original gaussian index >> 12
ROW_GID_LO = 7  # original gaussian index & 0xfff
TAB_ROWS = 8

_SPLIT = 4096.0  # 12-bit split base
# f32 holds integers exactly up to 2^24: offsets/gids are compared (VPU,
# exact) at full width and contracted (MXU) as 12-bit halves.
_F32_EXACT = float(1 << 24)
_HIGH = jax.lax.Precision.HIGHEST


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


def expand_math(b, total_ref, t0_ref, t1_ref, *, k: int, tiles_x: int):
    """Shared per-block expansion: owner lookup + (tile, gid) rows.

    Returns f32 rows ``tile`` [1, K] (exact integers), ``gid`` [1, K], and
    bool ``valid`` [1, K].
    """
    win = jnp.concatenate([t0_ref[...], t1_ref[...]], axis=1)  # [8, 2K]
    off = win[ROW_OFF_HI : ROW_OFF_HI + 1, :] * _SPLIT + (
        win[ROW_OFF_LO : ROW_OFF_LO + 1, :]
    )
    cnt = win[ROW_COUNT : ROW_COUNT + 1, :]

    fi_row = b * k + jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    f_col = (b * k + jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)).astype(
        jnp.float32
    )

    # One-hot owner membership: off <= f < off + cnt (VPU compare, exact
    # f32). Rows are compacted (cnt >= 1), so exactly one column matches
    # per in-range fragment.
    oh = ((off <= f_col) & (f_col < off + cnt)).astype(jnp.float32)  # [K,2K]

    # Gather-by-matmul: [8, 2K] x [2K, K] -> the owner's attribute column
    # per fragment. Row values < 2^13, exact under bf16x3 (HIGHEST).
    attrs = jax.lax.dot_general(
        win, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGH,
    )  # [8, K]
    attrs = jnp.round(attrs)

    f_row = fi_row.astype(jnp.float32)
    off_o = attrs[ROW_OFF_HI : ROW_OFF_HI + 1, :] * _SPLIT + (
        attrs[ROW_OFF_LO : ROW_OFF_LO + 1, :]
    )
    gid = attrs[ROW_GID_HI : ROW_GID_HI + 1, :] * _SPLIT + (
        attrs[ROW_GID_LO : ROW_GID_LO + 1, :]
    )
    rank = f_row - off_o
    span = jnp.maximum(attrs[ROW_SPAN : ROW_SPAN + 1, :], 1.0)
    dy = jnp.floor(rank / span)
    dx = rank - dy * span
    tile = (attrs[ROW_Y0 : ROW_Y0 + 1, :] + dy) * float(tiles_x) + (
        attrs[ROW_X0 : ROW_X0 + 1, :] + dx
    )
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
    f32 attribute window [A_ROWS, 2K] on the MXU: a gather with no gather
    (PERF_NOTES item 2). Attribute values ride at <= 1 ulp under the
    HIGHEST-precision bf16x3 contraction (one-hot rows select a single
    column), measured exact enough for the renderer's 1e-4 parity bars.
    """
    del win0_ref
    b = pl.program_id(0)
    win = jnp.concatenate([t0_ref[...], t1_ref[...]], axis=1)  # [8, 2K]
    off = win[ROW_OFF_HI: ROW_OFF_HI + 1, :] * _SPLIT + (
        win[ROW_OFF_LO: ROW_OFF_LO + 1, :]
    )
    cnt = win[ROW_COUNT: ROW_COUNT + 1, :]
    f_col = (b * k + jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)).astype(
        jnp.float32
    )
    oh = ((off <= f_col) & (f_col < off + cnt)).astype(jnp.float32)  # [K,2K]

    # ONE joint contraction for the integer fields and the attributes:
    # [8 + A, 2K] x [2K, K] (two separate dots doubled the one-hot's VMEM
    # footprint and blew the scoped-vmem budget).
    awin = jnp.concatenate([a0_ref[...], a1_ref[...]], axis=1)
    joint = jnp.concatenate([win, awin], axis=0)
    fetched = jax.lax.dot_general(
        joint, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGH,
    )
    ints = jnp.round(fetched[:TAB_ROWS])

    fi_row = b * k + jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    f_row = fi_row.astype(jnp.float32)
    off_o = ints[ROW_OFF_HI: ROW_OFF_HI + 1, :] * _SPLIT + (
        ints[ROW_OFF_LO: ROW_OFF_LO + 1, :]
    )
    gid = ints[ROW_GID_HI: ROW_GID_HI + 1, :] * _SPLIT + (
        ints[ROW_GID_LO: ROW_GID_LO + 1, :]
    )
    rank = f_row - off_o
    span = jnp.maximum(ints[ROW_SPAN: ROW_SPAN + 1, :], 1.0)
    dy = jnp.floor(rank / span)
    dx = rank - dy * span
    tile = (ints[ROW_Y0: ROW_Y0 + 1, :] + dy) * float(tiles_x) + (
        ints[ROW_X0: ROW_X0 + 1, :] + dx
    )
    valid = fi_row < total_ref[0]

    # The owning gaussian id also rides as an f32 attribute row (exact
    # below 2^24): the renderer's sorted-stream matrix keys the backward
    # reorder by it, so no fragment-scale int<->float casts downstream.
    attrs = fetched[TAB_ROWS:]
    attr_ref[...] = jnp.concatenate(
        [
            attrs[:GID_ATTR_ROW],
            jnp.where(valid, gid, 0.0),
            attrs[GID_ATTR_ROW + 1:],
        ],
        axis=0,
    )

    tile_i = jnp.where(valid, tile.astype(jnp.int32), t_total)
    gid_i = jnp.where(valid, gid.astype(jnp.int32), 0)
    out_ref[...] = jnp.concatenate([tile_i, gid_i], axis=0)


def build_segment_table(offsets: jnp.ndarray, counts: jnp.ndarray,
                        span_x: jnp.ndarray, x0: jnp.ndarray, y0: jnp.ndarray,
                        gid: jnp.ndarray, k: int = EXPAND_BLOCK):
    """Compact nonzero-count gaussians into a transposed segment table.

    Returns ``tabT`` [8, n_pad + k] f32 with pad rows that never match
    (offset 2^24, count 0). All ops here are N-scale (one cumsum + one
    scatter row-set).
    """
    n = counts.shape[0]
    if n >= (1 << 24):
        raise ValueError("expand kernel requires N < 2^24 (f32-exact ids)")
    n_pad = -(-max(n, 1) // k) * k + k

    nz = counts > 0
    dst = jnp.cumsum(nz.astype(jnp.int32)) - 1
    dst = jnp.where(nz, dst, n_pad + k)  # OOB -> dropped by the scatter

    split = jnp.int32(1 << 12)
    cols = jnp.stack(
        [
            (offsets // split).astype(jnp.float32),
            (offsets % split).astype(jnp.float32),
            counts.astype(jnp.float32),
            jnp.maximum(span_x, 1).astype(jnp.float32),
            x0.astype(jnp.float32),
            y0.astype(jnp.float32),
            (gid // split).astype(jnp.float32),
            (gid % split).astype(jnp.float32),
        ],
        axis=0,
    )  # [8, N]

    init = jnp.zeros((TAB_ROWS, n_pad), jnp.float32)
    init = init.at[ROW_OFF_HI].set(_F32_EXACT / _SPLIT)
    tab_t = init.at[:, dst].set(cols, mode="drop")
    return tab_t


def expand_fragments(tab_t: jnp.ndarray, total: jnp.ndarray, f_cap: int,
                     tiles_x: int, t_total: int,
                     k: int = EXPAND_BLOCK):
    """Expand the compacted segment table into (tile, gid) streams.

    ``tab_t``: [8, n_pad] from :func:`build_segment_table`.
    ``total``: scalar int32 live-fragment count (= offsets[-1] + counts[-1]).
    Returns ``tile`` [f_cap] int32 (== t_total on padding slots) and
    ``gid`` [f_cap] int32, in gaussian-major (depth) order.
    """
    assert f_cap % k == 0, "fragment capacity must be a block multiple"
    n_blocks = f_cap // k
    n_win = tab_t.shape[1] // k

    # Window base per fragment block: the aligned table block containing the
    # owner of the block's first fragment. Block-scale searchsorted (F/K
    # queries into the offset row).
    off_full = tab_t[ROW_OFF_HI] * _SPLIT + tab_t[ROW_OFF_LO]
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


# Attribute rows carried through the fused expand (row 0 = depth used as
# the second sort key; rows 1..9 = x, y, conic a/b/c, r, g, b, opacity;
# row 10 = owning gaussian id as exact f32, written by the kernel).
# Padded to a sublane-tile multiple for aligned windows.
ATTR_TAB_ROWS = 16
GID_ATTR_ROW = 10


def build_attr_table(attr_cols: jnp.ndarray, counts: jnp.ndarray,
                     k: int = EXPAND_BLOCK) -> jnp.ndarray:
    """Compact per-gaussian f32 attributes [A, N] into the same layout as
    :func:`build_segment_table` (same dst scatter, same padding)."""
    n = counts.shape[0]
    n_pad = -(-max(n, 1) // k) * k + k
    nz = counts > 0
    dst = jnp.cumsum(nz.astype(jnp.int32)) - 1
    dst = jnp.where(nz, dst, n_pad + k)
    a = attr_cols.shape[0]
    pad = jnp.zeros((ATTR_TAB_ROWS - a, attr_cols.shape[1]),
                    attr_cols.dtype)
    cols = jnp.concatenate([attr_cols, pad], axis=0)
    init = jnp.zeros((ATTR_TAB_ROWS, n_pad), jnp.float32)
    return init.at[:, dst].set(cols, mode="drop")


def expand_fragments_with_attrs(tab_t: jnp.ndarray, attr_t: jnp.ndarray,
                                total: jnp.ndarray, f_cap: int,
                                tiles_x: int, t_total: int,
                                k: int = EXPAND_BLOCK):
    """Expansion fused with the one-hot attribute fetch.

    Returns (tile [f_cap] i32, gid [f_cap] i32, attrs [ATTR_TAB_ROWS,
    f_cap] f32) in gaussian-major order — the per-fragment attribute fetch
    without any fragment-scale gather (PERF_NOTES item 2).
    """
    assert f_cap % k == 0, "fragment capacity must be a block multiple"
    n_blocks = f_cap // k
    n_win = tab_t.shape[1] // k

    off_full = tab_t[ROW_OFF_HI] * _SPLIT + tab_t[ROW_OFF_LO]
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
            pl.BlockSpec((ATTR_TAB_ROWS, k), lambda b, w0, tt: (0, b)),
        ],
    )
    ints, attrs = pl.pallas_call(
        functools.partial(_expand_attr_kernel, k=k, tiles_x=tiles_x,
                          t_total=t_total),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((2, f_cap), jnp.int32),
            jax.ShapeDtypeStruct((ATTR_TAB_ROWS, f_cap), jnp.float32),
        ],
        interpret=interpret_mode(),
    )(win0, total32, tab_t, tab_t, attr_t, attr_t)
    return ints[0], ints[1], attrs


def build_tables(offsets, counts, span_x, x0, y0, gid, attr_rows,
                 k: int = EXPAND_BLOCK):
    """Compact BOTH tables with one N-scale sort instead of scatters.

    The compaction (nonzero-count gaussians first, stable) is a stable
    1-key sort with every table column riding as a payload — measured
    ~10x cheaper than the two `at[:, dst].set` column scatters it
    replaces (~118 ms at N=1M). Returns (tab_t [TAB_ROWS, n_pad],
    attr_t [ATTR_TAB_ROWS, n_pad]); tail columns past the live count are
    rewritten to never-match defaults so the window searchsorted stays
    monotone.
    """
    n = counts.shape[0]
    if n >= (1 << 24):
        raise ValueError("expand kernel requires N < 2^24 (f32-exact ids)")
    n_pad = -(-max(n, 1) // k) * k + k
    split = jnp.int32(1 << 12)

    int_cols = (
        (offsets // split).astype(jnp.float32),
        (offsets % split).astype(jnp.float32),
        counts.astype(jnp.float32),
        jnp.maximum(span_x, 1).astype(jnp.float32),
        x0.astype(jnp.float32),
        y0.astype(jnp.float32),
        (gid // split).astype(jnp.float32),
        (gid % split).astype(jnp.float32),
    )
    a = attr_rows.shape[0]
    key = (counts == 0).astype(jnp.int32)  # zeros last, stable
    out = jax.lax.sort(
        (key, *int_cols, *(attr_rows[i] for i in range(a))),
        num_keys=1, is_stable=True,
    )
    n_live = jnp.sum(counts > 0)
    tail = jnp.arange(n, dtype=jnp.int32) >= n_live

    o_hi = jnp.where(tail, _F32_EXACT / _SPLIT, out[1])
    o_lo = jnp.where(tail, 0.0, out[2])
    cnt = jnp.where(tail, 0.0, out[3])
    tab = jnp.stack([o_hi, o_lo, cnt, *out[4:9]], axis=0)  # [8, N]
    attr = jnp.stack(out[9:9 + a], axis=0)  # [A, N]

    pad_tab = jnp.zeros((TAB_ROWS, n_pad - n), jnp.float32)
    pad_tab = pad_tab.at[ROW_OFF_HI].set(_F32_EXACT / _SPLIT)
    tab_t = jnp.concatenate([tab, pad_tab], axis=1)
    attr_t = jnp.concatenate(
        [
            attr,
            jnp.zeros((ATTR_TAB_ROWS - a, n), jnp.float32),
        ],
        axis=0,
    )
    attr_t = jnp.concatenate(
        [attr_t, jnp.zeros((ATTR_TAB_ROWS, n_pad - n), jnp.float32)], axis=1
    )
    return tab_t, attr_t
