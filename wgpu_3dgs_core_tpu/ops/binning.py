"""Depth-key sort, tile binning, and the tile/chunk work schedule.

Renderer extension (SURVEY.md §7 M4, hard part #1): TPU has no efficient
random scatter, so binning is formulated as bulk sort/segment ops — the
duplicate-into-(tile, depth)-keys-and-sort design of the original 3DGS,
built from static-capacity jnp primitives so everything jits:

1. per-gaussian tile bboxes -> fragment counts -> exclusive offsets
2. fragment expansion into a fixed-capacity stream (a Pallas one-hot MXU
   kernel that also fetches each fragment's blend attributes)
3. ONE stable (tile, depth) 2-key sort; attributes ride as payload
   columns (measured ~0.15 ms per column vs 30+ ms per fragment-scale
   gather)
4. per-tile [start, end) ranges by binary search
5. a tile-padded block schedule (pad_schedule): every chunk-sized block
   belongs to exactly one tile; the rasterizer reads blocks in place
   from the sorted stream through window pairs

Capacity overflow is detected and returned, never silent (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE_SIZE = 16


class FragmentStream(NamedTuple):
    """Sorted (tile, depth) fragment stream, fixed capacity F_cap."""

    gauss_id: jnp.ndarray  # [F_cap] int32, gaussian per fragment
    tile_id: jnp.ndarray  # [F_cap] int32, == num_tiles for padding slots
    num_fragments: jnp.ndarray  # scalar int32
    overflow: jnp.ndarray  # scalar bool: true fragment count > capacity
    tile_start: jnp.ndarray  # [num_tiles] int32
    tile_end: jnp.ndarray  # [num_tiles] int32


class PaddedSchedule(NamedTuple):
    """Tile-padded fragment layout for the streaming rasterizer.

    Every tile's fragment segment is padded up to a ``chunk`` multiple, so
    each chunk-sized block belongs to exactly one tile (no block sharing
    between tiles, no revisits). ``src``/``valid`` map padded slots back to
    positions in the (tile, depth)-sorted stream.
    """

    blk_tile: jnp.ndarray  # [B_cap] int32, tile owning each padded block
    pad_off: jnp.ndarray  # [T] int32, tile's first padded slot (aligned)
    tile_len: jnp.ndarray  # [T] int32, live fragments of the tile
    live_blocks: jnp.ndarray  # [1] int32, blocks holding any live fragment
    src: jnp.ndarray  # [F_pad] int32, sorted-stream index per padded slot
    valid: jnp.ndarray  # [F_pad] bool, slot holds a live fragment
    tile_written: jnp.ndarray  # [T] bool, tile's output block gets flushed
    blk_flags: jnp.ndarray  # [B_cap + 1] int32 packed per-block word for
    #   the branch-free rasterizer: tile<<2 | first<<1 | last; 0 for dead
    #   blocks (the +1 pad lets the backward kernel look one block ahead)
    truncated: jnp.ndarray  # scalar bool: padded blocks exceeded B_cap
    #   (trailing tiles dropped — callers surface this like overflow)


def num_tiles(width: int, height: int) -> tuple[int, int]:
    tx = -(-width // TILE_SIZE)
    ty = -(-height // TILE_SIZE)
    return tx, ty


def tile_bounds(xy: jnp.ndarray, extent: jnp.ndarray, tiles_x: int,
                tiles_y: int, tile_y_offset=0) -> tuple:
    """Per-gaussian tile bbox [x0, x1) x [y0, y1), clamped to the grid.

    ``extent`` is the [N, 2] per-axis pixel half-extent of the cutoff
    ellipse (exact axis-aligned bbox — see ops/projection.py).
    ``tile_y_offset`` shifts into a local window of ``tiles_y`` tile rows
    starting at that global row — used by the sharded renderer, where each
    device rasterizes a horizontal strip (may be a traced device index).
    """
    # Upper bounds are floor(edge/TILE)+1 (exclusive): the integer ceil-div
    # idiom (a + T - 1) // T under-counts for FLOAT edges landing within
    # one pixel past a tile boundary.
    rx = extent[:, 0]
    ry = extent[:, 1]
    x0 = jnp.clip(((xy[:, 0] - rx) / TILE_SIZE), 0, tiles_x).astype(jnp.int32)
    x1 = jnp.clip(
        jnp.floor((xy[:, 0] + rx) / TILE_SIZE) + 1, 0, tiles_x
    ).astype(jnp.int32)
    y0g = jnp.floor((xy[:, 1] - ry) / TILE_SIZE).astype(jnp.int32)
    y1g = (jnp.floor((xy[:, 1] + ry) / TILE_SIZE) + 1).astype(jnp.int32)
    y0 = jnp.clip(y0g - tile_y_offset, 0, tiles_y)
    y1 = jnp.clip(y1g - tile_y_offset, 0, tiles_y)
    return x0, y0, x1, y1


def bin_splats(
    xy: jnp.ndarray,
    extent: jnp.ndarray,
    depth: jnp.ndarray,
    mask: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    max_fragments: int,
    tile_y_offset=0,
    expand_impl: str = "pallas",
) -> FragmentStream:
    """Expand gaussians into a (tile, depth)-sorted fragment stream.

    With ``tile_y_offset``, bins only the ``tiles_y``-row strip starting at
    that global tile row (local tile ids), for strip-parallel rendering.
    ``expand_impl``: "pallas" (one-hot MXU window kernel, ops/expand.py) or
    "xla" (scan + fragment-scale gather) — identical outputs.
    """
    n = xy.shape[0]
    t_total = tiles_x * tiles_y
    depth_key = jnp.where(mask, depth, jnp.inf)  # original gaussian order
    gid_src = jnp.arange(n, dtype=jnp.int32)

    x0, y0, x1, y1 = tile_bounds(xy, extent, tiles_x, tiles_y, tile_y_offset)
    span_x = jnp.maximum(x1 - x0, 0)
    span_y = jnp.maximum(y1 - y0, 0)
    live = mask & (extent[:, 0] > 0) & (extent[:, 1] > 0)
    counts = jnp.where(live, span_x * span_y, 0)

    offsets = jnp.cumsum(counts) - counts  # exclusive
    total = offsets[-1] + counts[-1] if n else jnp.int32(0)
    overflow = total > max_fragments

    from .expand import EXPAND_BLOCK

    if expand_impl == "pallas" and max_fragments % EXPAND_BLOCK == 0:
        from .expand import build_segment_table, expand_fragments

        tab_t = build_segment_table(
            offsets, counts, span_x, x0, y0, gid_src
        )
        tile, gid_unsorted = expand_fragments(
            tab_t, total, max_fragments, tiles_x, t_total
        )
        # The expand kernel's live-bound grid (ops/expand.live_grid) never
        # writes slots past the live count on hardware; mask that tail
        # before it reaches the sort (unwritten memory can be NaN/garbage).
        slot = jnp.arange(max_fragments, dtype=jnp.int32)
        livem = slot < total
        tile = jnp.where(livem, tile, t_total)
        gid_unsorted = jnp.where(livem, gid_unsorted, 0)
    else:
        tile, gid_unsorted = _expand_xla(
            offsets, counts, span_x, x0, y0, gid_src, total,
            max_fragments, tiles_x, t_total, n,
        )

    # Single stable 2-key sort: (tile, depth) with the original gaussian
    # id as payload. Blend order within a tile = depth ascending, ties by
    # gaussian id (expansion emits ids ascending; the sort is stable) —
    # exactly the reference renderer's stable depth argsort semantics.
    # No gaussian-level presort means nothing N-scale is replicated
    # per-device in the sharded renderer (SURVEY.md §7 M6).
    depth_frag = depth_key[gid_unsorted]
    tile_sorted, _, gauss_id = jax.lax.sort(
        (tile, depth_frag, gid_unsorted), num_keys=2, is_stable=True
    )

    tile_ids = jnp.arange(t_total, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tile_ids, side="left").astype(
        jnp.int32
    )
    tile_end = jnp.searchsorted(tile_sorted, tile_ids, side="right").astype(
        jnp.int32
    )

    return FragmentStream(
        gauss_id=gauss_id,
        tile_id=tile_sorted,
        num_fragments=jnp.minimum(total, max_fragments).astype(jnp.int32),
        overflow=overflow,
        tile_start=tile_start,
        tile_end=tile_end,
    )


# Conservative widening (pixels) of the exact ellipse radii and per-row
# x-intervals: absorbs the f32 rounding of the interval arithmetic so a
# tile containing a blendable pixel can never be culled by a last-bit
# error (the actual rounding error at 1080p coordinate magnitudes is
# ~1e-4 px — 0.05 px is a ~500x margin and costs <1% of the trim win).
ROW_TRIM_EPS = 0.05


def exact_radii(conic, op_eff, cutoff_sq, opacity_cull):
    """Exact per-gaussian half-extents (rx, ry) of the blend support.

    The blend kernels draw a fragment's pixel iff q <= cutoff_sq AND
    alpha = op_eff * exp(-q/2) >= 1/255, i.e. iff
    q <= Q = min(cutoff_sq, 2 ln(255 op_eff)) — so the support is the
    ellipse {q <= Q} with half-extents rx = sqrt(Q c / (ac - b^2)),
    ry = sqrt(Q a / (ac - b^2)). These are the UN-ceiled, post-
    compensation counterparts of ops/projection.py's ``extent`` (always
    <= it), so binning by them is image-exact and strictly tighter.
    ``opacity_cull`` must be False for the ellipse display mode, whose
    ring alpha does not decay with q.
    """
    ca, cb_, cc = conic
    d = jnp.maximum(ca * cc - cb_ * cb_, 0.0)
    if opacity_cull:
        q = jnp.clip(
            2.0 * jnp.log(jnp.maximum(255.0 * op_eff, 1e-12)),
            0.0, cutoff_sq,
        )
    else:
        q = jnp.full_like(ca, cutoff_sq)
    inv_d = 1.0 / jnp.maximum(d, 1e-20)
    rx = jnp.sqrt(jnp.maximum(q * cc * inv_d, 0.0))
    ry = jnp.sqrt(jnp.maximum(q * ca * inv_d, 0.0))
    eps = jnp.where(q > 0.0, ROW_TRIM_EPS, 0.0)
    return rx + eps, ry + eps


def _row_tile_span(tx0_bbox, row_local, span_x, ry, cx, cy, ca, cb, cc,
                   tile_y_offset):
    """Exact tile x-interval of the cutoff ellipse within one tile row.

    Per-row inputs (f32): bbox first tile column / strip-local tile row /
    bbox tile width / support-ellipse y half-extent (:func:`exact_radii`,
    margin included), the owning gaussian's center and conic. The support
    ellipse {q <= Q} has y half-extent ry = sqrt(Q a / (ac - b^2)), so
    the x extent at height dy is -(b/a) dy +- sqrt(ac - b^2)/a *
    sqrt(ry^2 - dy^2) — no cutoff constant needed beyond what ``ry``
    encodes, so the opacity-aware per-gaussian Q is honored automatically.
    The max over a dy-interval of the concave upper edge (and min of the
    convex lower edge) is attained at the clipped strip endpoints or the
    clipped global extremum dy = -+ b ry / sqrt(ac).

    Returns (tx0, cnt) int32: first tile column and tile count (>= 1 for
    any row inside the bbox — every bbox row intersects the ellipse), both
    clamped into the bbox so the trim can only shrink the rectangle.
    Culling is image-exact: a culled tile contains no point of the
    continuous cutoff region, hence no pixel either renderer would blend.
    """
    a_safe = jnp.maximum(ca, 1e-12)
    beta = cb / a_safe
    d = jnp.maximum(ca * cc - cb * cb, 0.0)
    k = jnp.sqrt(d) / a_safe
    dyg = cb * ry / jnp.maximum(jnp.sqrt(jnp.maximum(ca * cc, 0.0)), 1e-12)

    y_px = (row_local + tile_y_offset) * TILE_SIZE
    d_lo = jnp.clip(y_px - cy, -ry, ry)
    d_hi = jnp.clip(y_px + TILE_SIZE - cy, -ry, ry)

    def width(dy):
        return k * jnp.sqrt(jnp.maximum(ry * ry - dy * dy, 0.0))

    c_max = jnp.clip(-dyg, d_lo, d_hi)
    c_min = jnp.clip(dyg, d_lo, d_hi)
    xmax = jnp.maximum(
        jnp.maximum(-beta * d_lo + width(d_lo), -beta * d_hi + width(d_hi)),
        -beta * c_max + width(c_max),
    )
    xmin = jnp.minimum(
        jnp.minimum(-beta * d_lo - width(d_lo), -beta * d_hi - width(d_hi)),
        -beta * c_min - width(c_min),
    )

    tx0 = jnp.floor((cx + xmin - ROW_TRIM_EPS) / TILE_SIZE)
    tx1 = jnp.floor((cx + xmax + ROW_TRIM_EPS) / TILE_SIZE) + 1.0
    tx0 = jnp.clip(tx0, tx0_bbox, tx0_bbox + span_x - 1.0)
    tx1 = jnp.clip(tx1, tx0 + 1.0, tx0_bbox + span_x)
    return tx0.astype(jnp.int32), (tx1 - tx0).astype(jnp.int32)


def bin_splats_attrs(
    xy: jnp.ndarray,
    extent: jnp.ndarray,
    depth: jnp.ndarray,
    mask: jnp.ndarray,
    attr_cols: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    max_fragments: int,
    tile_y_offset=0,
    expand_impl: str = "pallas",
    max_rows: int | None = None,
    cutoff_sq: float = 9.0,
    opacity_cull: bool = True,
):
    """bin_splats fused with the per-fragment attribute fetch.

    ``attr_cols``: [A, N] f32 per-gaussian attributes. They are fetched
    per fragment inside the expansion kernel (one-hot MXU contraction — a
    gather with no gather) and ride the 1-key tile sort as payloads
    (the expansion emits depth-major off the depth-ordered table, so
    stability supplies the blend order and no depth key/column reaches
    fragment scale).

    Expansion is TWO-LEVEL (round 5): gaussians -> bbox tile rows -> exact
    per-row tile intervals (see :func:`_row_tile_span`), culling the bbox
    tiles the cutoff ellipse never touches (~26% of fragments on the
    bench scene) image-exactly — every fragment-scale cost downstream
    (the tile sort, the blend kernels, the backward reorder) shrinks with
    the live count AND with the capacity callers size from
    :func:`count_fragments` (which counts the trimmed stream).
    ``max_rows`` bounds the row-stream capacity (default: max_fragments —
    always sufficient since every row holds >= 1 fragment; size it from
    :func:`count_rows` to shave row-scale work).

    Returns

      (stream, attrs_sorted [A + 1, F_cap] f32, tab_t [16, n_pad] bf16)

    where ``attrs_sorted`` row A is the owning gaussian id as exact f32
    (the backward reorder key — fetched in-kernel, so no fragment-scale
    int<->float casts), and ``tab_t`` the PER-GAUSSIAN compacted table
    (ops/expand.build_tables layout, counts = bbox rows) whose unique-gid
    column drives the backward segment reduction (ops/segreduce.py).
    """
    n = xy.shape[0]
    a = attr_cols.shape[0]
    t_total = tiles_x * tiles_y
    depth_key = jnp.where(mask, depth, jnp.inf)

    # Exact blend-support bbox (opacity-aware, un-ceiled — exact_radii),
    # clamped INTO the ceiled-extent bbox so everything sized from the
    # extent (count_fragments upper bound, the sharded renderer's strip
    # routing) stays a superset. attr_cols rows 2-4 are the conic and
    # row 8 the post-compensation opacity, per the renderer's layout.
    rx_ex, ry_ex = exact_radii(
        (attr_cols[2], attr_cols[3], attr_cols[4]), attr_cols[8],
        cutoff_sq, opacity_cull,
    )
    xb0, yb0, xb1, yb1 = tile_bounds(
        xy, extent, tiles_x, tiles_y, tile_y_offset
    )
    ex2 = jnp.stack([rx_ex, ry_ex], axis=-1)
    xe0, ye0, xe1, ye1 = tile_bounds(
        xy, ex2, tiles_x, tiles_y, tile_y_offset
    )
    x0 = jnp.clip(xe0, xb0, xb1)
    x1 = jnp.clip(xe1, x0, xb1)
    y0 = jnp.clip(ye0, yb0, yb1)
    y1 = jnp.clip(ye1, y0, yb1)
    span_x = jnp.maximum(x1 - x0, 0)
    span_y = jnp.maximum(y1 - y0, 0)
    live = mask & (extent[:, 0] > 0) & (extent[:, 1] > 0)
    # A row exists only when the bbox has nonzero WIDTH too (a clipped
    # zero-width bbox has span_y > 0 but zero fragments) — this also
    # guarantees span_x >= 1 on every emitted row, which the interval
    # clamp and the table's max(span, 1) passthrough rely on. Every
    # emitted row genuinely intersects the support ellipse (the exact
    # y-bounds above), so its x-interval is nonempty too.
    row_counts = jnp.where(live & (span_x > 0), span_y, 0)
    total_rows = jnp.sum(row_counts) if n else jnp.int32(0)
    gid_src = jnp.arange(n, dtype=jnp.int32)

    from .expand import EXPAND_BLOCK, GID_ATTR_ROW

    if max_rows is None:
        max_rows = max_fragments
    r_cap = -(-max_rows // EXPAND_BLOCK) * EXPAND_BLOCK
    row_overflow = total_rows > r_cap

    if expand_impl == "pallas" and max_fragments % EXPAND_BLOCK == 0:
        from .expand import (
            ROWS_ATTR0,
            ROWS_GID,
            ROWS_ROW,
            ROWS_RY,
            ROWS_SPANX,
            ROWS_X0,
            build_row_tables,
            build_tables,
            expand_fragments_with_attrs,
            expand_rows,
        )

        # The table compaction orders gaussians by (has-fragments, depth,
        # original id) — expansion therefore emits the stream depth-major
        # and the fragment-scale sort below needs only the tile key, with
        # stability supplying the (depth, id) blend order (the reference
        # renderer's stable depth argsort semantics). counts = bbox ROWS:
        # this table drives the level-1 row expansion, and doubles as the
        # backward reduction's per-gaussian gid source (returned tab_t).
        attr10 = jnp.concatenate([attr_cols, ry_ex[None]], axis=0)
        tab_t, attr_t = build_tables(
            row_counts, span_x, x0, y0, gid_src, attr10, depth_key,
        )
        rows = expand_rows(tab_t, attr_t, total_rows, r_cap)
        slot_r = jnp.arange(r_cap, dtype=jnp.int32)
        live_r = slot_r < jnp.minimum(total_rows, r_cap)
        # Live-tail scrub: the live-bound grid never writes the tail on
        # hardware (unwritten memory can be NaN/garbage).
        rows = jnp.where(live_r[None, :], rows, 0.0)
        tx0_r, cnt_r = _row_tile_span(
            rows[ROWS_X0], rows[ROWS_ROW], rows[ROWS_SPANX], rows[ROWS_RY],
            rows[ROWS_ATTR0], rows[ROWS_ATTR0 + 1], rows[ROWS_ATTR0 + 2],
            rows[ROWS_ATTR0 + 3], rows[ROWS_ATTR0 + 4], tile_y_offset,
        )
        cnt_r = jnp.where(live_r, cnt_r, 0)
        off_r = jnp.cumsum(cnt_r) - cnt_r
        total = (off_r[-1] + cnt_r[-1]).astype(jnp.int32) if n else (
            jnp.int32(0)
        )
        tab2, attr2 = build_row_tables(
            off_r, cnt_r, tx0_r, rows[ROWS_ROW], rows[ROWS_GID],
            rows[ROWS_ATTR0:ROWS_ATTR0 + 9], live_r,
        )
        tile, _, fetched = expand_fragments_with_attrs(
            tab2, attr2, total, max_fragments, tiles_x, t_total
        )
        # The expand kernel's live-bound grid (ops/expand.live_grid) never
        # writes slots past the live count on hardware; mask that tail
        # before it reaches the sort and the blend kernels (unwritten
        # memory can be NaN, and 0-weight matmuls don't sanitize NaN).
        slot = jnp.arange(max_fragments, dtype=jnp.int32)
        livem = slot < total
        tile = jnp.where(livem, tile, t_total)
        fetched = jnp.where(livem[None, :], fetched, 0.0)
        payload_rows = [fetched[i] for i in range(a)]
        payload_rows.append(fetched[GID_ATTR_ROW])
    else:
        from .expand import build_segment_table

        # XLA fallback: the same two-level scheme from jnp primitives,
        # bit-identical streams (the interval math runs the SAME f32
        # function on the SAME f32 values — the Pallas fetch reconstructs
        # attributes bit-exactly).
        order = jnp.lexsort(
            (jnp.arange(n), depth_key, row_counts == 0)
        ).astype(jnp.int32)
        rc_d = row_counts[order]
        offr_d = jnp.cumsum(rc_d) - rc_d
        span_d = span_x[order]
        x0_d = x0[order]
        y0_d = y0[order]
        gid_d = gid_src[order]

        # Level 1: owner scan over row slots (same idiom as _expand_xla).
        slot_r = jnp.arange(r_cap, dtype=jnp.int32)
        start_idx = jnp.where(rc_d > 0, offr_d, r_cap)
        starts = jnp.zeros(r_cap, jnp.int32).at[start_idx].max(
            jnp.arange(1, n + 1, dtype=jnp.int32), mode="drop"
        )
        g = jnp.clip(
            jax.lax.associative_scan(jnp.maximum, starts) - 1, 0,
            max(n - 1, 0),
        )
        live_r = slot_r < jnp.minimum(total_rows, r_cap)
        row_local = y0_d[g] + (slot_r - offr_d[g])
        gidf = gid_d[g]
        tx0_r, cnt_r = _row_tile_span(
            x0_d[g].astype(jnp.float32), row_local.astype(jnp.float32),
            span_d[g].astype(jnp.float32), ry_ex[gidf],
            attr_cols[0, gidf], attr_cols[1, gidf], attr_cols[2, gidf],
            attr_cols[3, gidf], attr_cols[4, gidf], tile_y_offset,
        )
        cnt_r = jnp.where(live_r, cnt_r, 0)
        off_r = jnp.cumsum(cnt_r) - cnt_r
        total = (off_r[-1] + cnt_r[-1]).astype(jnp.int32) if n else (
            jnp.int32(0)
        )
        # Level 2: per-row segments with span == count (dy = 0).
        tile, gid_unsorted = _expand_xla(
            off_r, cnt_r, cnt_r, tx0_r, row_local, gidf, total,
            max_fragments, tiles_x, t_total, r_cap,
        )
        slot = jnp.arange(max_fragments, dtype=jnp.int32)
        livem = slot < total
        payload_rows = [
            jnp.where(livem, attr_cols[i][gid_unsorted], 0.0)
            for i in range(a)
        ]
        payload_rows.append(
            jnp.where(livem, gid_unsorted, 0).astype(jnp.float32)
        )
        # Fallback path still provides the per-gaussian compacted table
        # the backward segment reduction needs (scatter-based builder over
        # the depth-permuted arrays; test-scale only).
        tab_t = build_segment_table(
            offr_d, rc_d, span_d, x0_d, y0_d, gid_d
        )
    overflow = row_overflow | (total > max_fragments)

    # Single stable 1-key sort by tile: the stream is already depth-major,
    # so stability yields (tile, depth, original id) blend order. Padding
    # slots carry tile == t_total and sort last; their all-zero attribute
    # columns are harmless.
    out = jax.lax.sort(
        (tile, *payload_rows), num_keys=1, is_stable=True,
    )
    tile_sorted = out[0]
    attrs_sorted = jnp.stack(out[1:], axis=0)  # [A + 1, F_cap]

    tile_ids = jnp.arange(t_total, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tile_ids, side="left").astype(
        jnp.int32
    )
    tile_end = jnp.searchsorted(tile_sorted, tile_ids, side="right").astype(
        jnp.int32
    )
    stream = FragmentStream(
        # Lazily derived from the f32 payload row; DCE'd when unused (the
        # renderer reads the f32 row directly).
        gauss_id=attrs_sorted[a].astype(jnp.int32),
        tile_id=tile_sorted,
        num_fragments=jnp.minimum(total, max_fragments).astype(jnp.int32),
        overflow=overflow,
        tile_start=tile_start,
        tile_end=tile_end,
    )
    return stream, attrs_sorted, tab_t


def _expand_xla(offsets, counts, span_x, x0, y0, depth_order, total,
                max_fragments, tiles_x, t_total, n):
    """Fragment expansion via XLA scan + gather (reference implementation).

    Owner gaussian of each slot: a searchsorted(offsets, slots) costs
    ~1.5 s at 8M fragments on TPU; scattering each non-empty gaussian's
    index at its segment start (non-empty starts are distinct) and
    running-maxing forward is equivalent and much cheaper.
    """
    slot = jnp.arange(max_fragments, dtype=jnp.int32)
    start_idx = jnp.where(counts > 0, offsets, max_fragments)  # OOB -> drop
    starts = jnp.zeros(max_fragments, jnp.int32).at[start_idx].max(
        jnp.arange(1, n + 1, dtype=jnp.int32), mode="drop"
    )
    g = jnp.clip(
        jax.lax.associative_scan(jnp.maximum, starts) - 1, 0, max(n - 1, 0)
    )

    # One fused row gather instead of five scalar gathers by the same index.
    seg_table = jnp.stack(
        [offsets, jnp.maximum(span_x, 1), x0, y0, depth_order], axis=1
    )
    seg = seg_table[g]
    rank = slot - seg[:, 0]
    w = seg[:, 1]
    dx = rank % w
    dy = rank // w
    tile = (seg[:, 3] + dy) * tiles_x + (seg[:, 2] + dx)
    valid = slot < total
    tile = jnp.where(valid, tile, t_total).astype(jnp.int32)
    return tile, seg[:, 4].astype(jnp.int32)


def pad_schedule(stream: FragmentStream, chunk: int,
                 f_pad_cap: int) -> PaddedSchedule:
    """Tile-padded block schedule for the streaming rasterizer.

    Empty tiles get no block at all — their (never-visited, garbage)
    output blocks are composited to the background outside the kernel
    (render/renderer.py). All work here is tile- (T) or block- (B_cap)
    scale; the only fragment-scale products are broadcasts.

    With ``f_pad_cap >= max_fragments + n_tiles * chunk`` padding can never
    overflow a stream that fit its own capacity; if a smaller cap is passed
    the trailing tiles are truncated (the kernel flushes the partial tile
    at the last live block) and ``tile_written`` marks what survived.
    """
    assert f_pad_cap % chunk == 0
    start = stream.tile_start
    end = stream.tile_end
    t_total = start.shape[0]
    b_cap = f_pad_cap // chunk

    ln = (end - start).astype(jnp.int32)
    nblk = (ln + chunk - 1) // chunk
    off_blk = jnp.cumsum(nblk) - nblk  # exclusive, in blocks
    total_blocks = off_blk[-1] + nblk[-1]
    live_blocks = jnp.minimum(total_blocks, b_cap).astype(jnp.int32)

    blk = jnp.arange(b_cap, dtype=jnp.int32)
    # side="right" maps a block landing on tied offsets (zero-width =
    # empty tiles) past every empty tile to the nonempty tile owning it.
    bt = jnp.searchsorted(off_blk, blk, side="right").astype(jnp.int32) - 1
    blk_tile = jnp.clip(bt, 0, t_total - 1)
    pad_off = (off_blk * chunk).astype(jnp.int32)

    # Per-slot source mapping: block-scale gathers broadcast over lanes.
    base_rank = blk * chunk - pad_off[blk_tile]  # [B_cap]
    src_base = start[blk_tile] + base_rank
    len_b = ln[blk_tile]
    lanes = jnp.arange(chunk, dtype=jnp.int32)
    src = (src_base[:, None] + lanes[None, :]).reshape(-1)
    rank = base_rank[:, None] + lanes[None, :]
    valid = (
        (rank < len_b[:, None]) & (blk[:, None] < live_blocks)
    ).reshape(-1)

    tile_written = (ln > 0) & (off_blk < live_blocks)

    # Packed per-block word for the branch-free rasterizer kernels:
    # first = block starts its tile's segment, last = block ends it (or is
    # the final live block of a truncated stream — the kernel flushes the
    # partial tile there). Dead blocks get 0 (no flush, no reset; their
    # lanes fail the kernels' tile-equality mask).
    first_b = base_rank == 0
    last_b = (base_rank + chunk >= len_b) | (blk == live_blocks - 1)
    livem = blk < live_blocks
    blk_flags = jnp.where(
        livem,
        (blk_tile << 2)
        | (first_b.astype(jnp.int32) << 1)
        | last_b.astype(jnp.int32),
        0,
    ).astype(jnp.int32)
    blk_flags = jnp.concatenate(
        [blk_flags, jnp.zeros((1,), jnp.int32)]
    )

    return PaddedSchedule(
        blk_tile=blk_tile,
        pad_off=pad_off,
        tile_len=ln,
        live_blocks=live_blocks.reshape(1),
        src=src,
        valid=valid,
        tile_written=tile_written,
        blk_flags=blk_flags,
        truncated=total_blocks > b_cap,
    )


def count_fragments(xy, extent, mask, tiles_x, tiles_y,
                    tile_y_offset=0) -> jnp.ndarray:
    """Bbox upper bound on the live fragment count (capacity dry pass).

    Pure N-scale bbox arithmetic; OVER-counts the trimmed stream the
    renderer actually bins (exact per-row intervals, ~26% tighter on the
    bench scene) — use :func:`count_fragments_exact` to size
    ``max_fragments`` and this only when the conic is unavailable. See
    render/renderer.measure_max_fragments for the scene-level wrapper
    (VERDICT r4 weak #7).
    """
    x0, y0, x1, y1 = tile_bounds(xy, extent, tiles_x, tiles_y, tile_y_offset)
    span_x = jnp.maximum(x1 - x0, 0)
    span_y = jnp.maximum(y1 - y0, 0)
    live = mask & (extent[:, 0] > 0) & (extent[:, 1] > 0)
    return jnp.sum(jnp.where(live, span_x * span_y, 0))


def _exact_bounds(xy, extent, conic, op_eff, mask, tiles_x, tiles_y,
                  tile_y_offset, cutoff_sq, opacity_cull):
    """Shared exact-support bounds (the same arithmetic as
    :func:`bin_splats_attrs`): returns (x0, y0, x1, y1, span_x, span_y,
    live, ry_ex)."""
    rx_ex, ry_ex = exact_radii(
        (conic[:, 0], conic[:, 1], conic[:, 2]), op_eff,
        cutoff_sq, opacity_cull,
    )
    xb0, yb0, xb1, yb1 = tile_bounds(
        xy, extent, tiles_x, tiles_y, tile_y_offset
    )
    ex2 = jnp.stack([rx_ex, ry_ex], axis=-1)
    xe0, ye0, xe1, ye1 = tile_bounds(
        xy, ex2, tiles_x, tiles_y, tile_y_offset
    )
    x0 = jnp.clip(xe0, xb0, xb1)
    x1 = jnp.clip(xe1, x0, xb1)
    y0 = jnp.clip(ye0, yb0, yb1)
    y1 = jnp.clip(ye1, y0, yb1)
    span_x = jnp.maximum(x1 - x0, 0)
    span_y = jnp.maximum(y1 - y0, 0)
    live = mask & (extent[:, 0] > 0) & (extent[:, 1] > 0)
    return x0, y0, x1, y1, span_x, span_y, live, ry_ex


def count_rows(xy, extent, conic, op_eff, mask, tiles_x, tiles_y,
               tile_y_offset=0, cutoff_sq: float = 9.0,
               opacity_cull: bool = True) -> jnp.ndarray:
    """Live (gaussian, tile-row) count — sizes ``max_rows``."""
    _, _, _, _, span_x, span_y, live, _ = _exact_bounds(
        xy, extent, conic, op_eff, mask, tiles_x, tiles_y, tile_y_offset,
        cutoff_sq, opacity_cull,
    )
    return jnp.sum(jnp.where(live & (span_x > 0), span_y, 0))


def count_fragments_exact(xy, extent, conic, op_eff, mask, tiles_x, tiles_y,
                          tile_y_offset=0, max_span_y: int = 0,
                          cutoff_sq: float = 9.0,
                          opacity_cull: bool = True):
    """Exact live count of the TRIMMED stream the renderer bins.

    Runs the same exact-support bounds + per-row interval math as
    :func:`bin_splats_attrs` on the same f32 values, so the result equals
    the production stream's live count exactly. ``op_eff`` is the
    post-compensation opacity (zero where masked). ``max_span_y`` must
    statically bound the tile row span (pass ``int(jnp.max(y1 - y0))``
    from a host-side dry pass; the N x max_span_y loop is built at trace
    time).
    """
    x0, y0, x1, y1, span_x, span_y, live, ry_ex = _exact_bounds(
        xy, extent, conic, op_eff, mask, tiles_x, tiles_y, tile_y_offset,
        cutoff_sq, opacity_cull,
    )
    live = live & (span_x > 0)
    total = jnp.int32(0)
    for r in range(max_span_y):
        has = live & (r < span_y)
        _, cnt = _row_tile_span(
            x0.astype(jnp.float32), (y0 + r).astype(jnp.float32),
            span_x.astype(jnp.float32), ry_ex,
            xy[:, 0], xy[:, 1], conic[:, 0], conic[:, 1], conic[:, 2],
            tile_y_offset,
        )
        total += jnp.sum(jnp.where(has, cnt, 0))
    return total


def default_max_fragments(n: int, tiles_x: int, tiles_y: int,
                          avg_overlap: float = 8.0) -> int:
    """Heuristic stream capacity, rounded up to a lane multiple.

    Fallback only — prefer sizing from :func:`count_fragments` (a measured
    count) in production; the heuristic either wastes fragment-scale cost
    or overflows on scenes far from ``avg_overlap``.
    """
    cap = int(max(n * avg_overlap, 1024))
    cap = min(cap, n * tiles_x * tiles_y) if n else 1024
    return -(-cap // 256) * 256
