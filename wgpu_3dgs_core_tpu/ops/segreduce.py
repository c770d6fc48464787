"""Pallas segment reduction over a gid-sorted gradient stream.

Backward half of the one-hot MXU design (PERF_NOTES item 2, the expand
kernel's transpose): after the backward blend kernel emits per-fragment
attribute gradients keyed by gaussian id and one F-scale sort groups them
gaussian-major, the per-gaussian sums are computed by two window kernels —
replacing the XLA diff-of-cumsum tail (a [F_pad, 9] stack + cumsum + two
[N, 9] boundary row-gathers, measured ~55 ms at bench shapes — the
boundary gathers alone are ~42 ms).

Design (mirrors ops/expand.py):

- The gaussian table is COMPACTED to nonzero-fragment rows (already built
  by ops/expand.build_tables for the forward), so any K consecutive sorted
  fragments' owners occupy <= K *contiguous* table rows, and each grid
  step only needs a 2-block aligned window of the compacted gid column.
- Ownership is an EQUALITY match: oh[f, r] = (key[f] == gid_row[r]) — a
  [K, 2K] one-hot built on the VPU (f32 compares, exact below 2^24) and
  contracted with the gradient block on the MXU. The gradients arrive as
  exact 3-term bf16 splits ([32, K], split_grad_rows) so the contraction
  is ONE native bf16 pass with 32 output rows instead of three HIGHEST
  passes on a row-starved 16-row output (the MXU pads outputs to 128
  rows; measured 1.16 us/block for the old form, tools/bench_segsum.py),
  and the keys ride a separate pre-transposed [K, n_blocks] operand so
  the per-block key column is a lane rotate, not an eye-matmul
  transpose. Unlike an analytic-offset diff-of-cumsum this does not
  require each live fragment to appear exactly once at its expansion
  offset — missing fragments (saturation skips, capacity truncation)
  simply contribute nothing instead of shifting every later gaussian's
  segment.
- Partials accumulate into a VMEM [16, 2K] two-panel scratch. The window
  start w0[b] is nondecreasing and advances by at most one block per grid
  step (<= K distinct owners per K fragments, every compacted row owns
  >= 1 fragment), so on each advance the retired K-column panel is
  flushed to HBM through a double-buffered DMA chain and the live panel
  shifts down — each output column is written at most once (the output
  buffer is zero-initialized via input/output aliasing, so never-flushed
  windows read as exact zeros).
- A second window kernel scatters the compacted sums back to original
  gaussian order with the same one-hot trick (compacted gids are sorted,
  so K consecutive output gaussians match <= K contiguous compacted rows)
  — replacing an [N, 16] row-gather (~21 ms XLA) with ~2 ms of MXU work.
- f32 accumulation happens entirely in MXU accumulators per block and the
  f32 VMEM panels across blocks — no running sum over the full fragment
  stream, so the top-bot cancellation risk of a full-stream cumsum
  (ADVICE r2, low) is gone by construction.

The reference crate has no analog (no renderer); this implements the
backward of SURVEY.md §7 M5 at speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .expand import EXPAND_BLOCK, _F32_EXACT, split3, table_gids
from .kernel_bundle import interpret_mode

# One grid step reduces this many sorted fragments. Reuses the expand
# kernel's block size so the compacted table (built at EXPAND_BLOCK
# granularity) is shared between the forward and backward kernels.
SEG_BLOCK = EXPAND_BLOCK

GRAD_ROWS = 16  # output panel rows: 0-8 gradient sums, 9-15 zero
SPLIT_ROWS = 32  # kernel input rows: 9 gradients x 3 exact bf16 terms + pad

_HIGH = jax.lax.Precision.HIGHEST


def _eye(k):
    return (
        jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    ).astype(jnp.float32)


def split_grad_rows(cols9):
    """[32, F] bf16 stream from 9 f32 gradient columns.

    Each column is decomposed into its exact 3-term bf16 split
    (ops/expand.split3), grouped as rows [0:9]=b1, [9:18]=b2, [18:27]=b3
    so the kernel recombines with two row-block adds; rows 27-31 are zero.
    The split exists so the segment-sum contraction runs as ONE native
    bf16 MXU pass with 32 output rows instead of three HIGHEST passes on
    a 16-row output (the MXU pads outputs to 128 rows, so row-starved
    matmuls waste proportionally — measured 1.16 us/block,
    tools/bench_segsum.py).
    """
    b1, b2, b3 = [], [], []
    for c in cols9:
        h1, h2, h3 = split3(c)
        b1.append(h1)
        b2.append(h2)
        b3.append(h3)
    f = cols9[0].shape[0]
    pad = [jnp.zeros((f,), jnp.bfloat16)] * (SPLIT_ROWS - 27)
    return jnp.stack(b1 + b2 + b3 + pad, axis=0)


def _segsum_kernel(w0_ref, total_ref, dg_ref, kt_ref, g0_ref, g1_ref,
                   out_hbm, acc_ref, stage_ref, smem, sem, *, k: int):
    """Grid step b: match block b's K sorted fragments against the gid
    window pair (w0[b], w0[b]+1), contract on the MXU, accumulate into the
    two-panel scratch, and flush the retired panel when the window
    advances.

    ``dg_ref`` holds the split-bf16 gradient rows ([32, K], see
    split_grad_rows) and ``kt_ref`` a [K, 128] slab of the PRE-TRANSPOSED
    key matrix (keys on sublanes) — block b's key column is carved by a
    lane rotate, replacing the former [K, K] eye-matmul transpose
    (+0.22 us/block, tools/bench_segsum.py).

    SMEM slots: [0] current window (w_prev), [1] flush sequence counter,
    [2]/[3] DMA-in-flight flag per staging slot.
    """
    b = pl.program_id(0)
    w = w0_ref[b]

    @pl.when(b == 0)
    def _():
        smem[0] = w
        smem[1] = 0
        smem[2] = 0
        smem[3] = 0
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def flush_panel(dst_win):
        """Retire acc[:, :K] to output window ``dst_win``."""
        slot = jax.lax.rem(smem[1], 2)
        smem[1] += 1

        @pl.when(smem[2 + slot] > 0)
        def _():
            pltpu.make_async_copy(
                stage_ref.at[slot], out_hbm.at[0], sem.at[slot]
            ).wait()

        stage_ref[slot] = acc_ref[:, :k]
        pltpu.make_async_copy(
            stage_ref.at[slot], out_hbm.at[dst_win], sem.at[slot]
        ).start()
        smem[2 + slot] = 1

    # The window start advances by at most 1 per block when every
    # compacted row's fragments are present in the stream (<= K distinct
    # owners per K fragments, rows compacted to count >= 1). Fragments can
    # only go missing under capacity overflow (gradients are zeroed
    # downstream then); a >1 jump retires BOTH panels and resets, so the
    # kernel stays well-formed (no misaligned flushes) even in that case.
    @pl.when(w > smem[0])
    def _():
        flush_panel(smem[0])

        @pl.when(w > smem[0] + 1)
        def _():
            acc_ref[:, :k] = acc_ref[:, k:]
            flush_panel(smem[0] + 1)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        @pl.when(w == smem[0] + 1)
        def _():
            acc_ref[:, :k] = acc_ref[:, k:]
            acc_ref[:, k:] = jnp.zeros((GRAD_ROWS, k), jnp.float32)

        smem[0] = w

    @pl.when(b * k < total_ref[0])
    def _():
        dg = dg_ref[...]  # [32, K] bf16 split rows
        # NaN scrub: lanes past the rasterizer's live blocks are never
        # written (dynamic grid) and may hold NaN. Their keys sort past
        # every live fragment, so at most the last processed block sees
        # them; their one-hot row is all-zero, but NaN * 0 = NaN — scrub
        # here (cheap VPU select) instead of 10 XLA-side masking passes
        # over the full F_pad stream (round-5 backward-chain cut).
        # The self-compare runs in f32: Mosaic has no bf16 vector cmpf on
        # this target ("Target does not support this comparison").
        dg32 = dg.astype(jnp.float32)
        dg = jnp.where(dg32 == dg32, dg, jnp.bfloat16(0))
        # Key column via lane rotate of the pre-transposed key slab.
        key_col = pltpu.roll(
            kt_ref[...], 128 - jax.lax.rem(b, 128), axis=1
        )[:, 0:1]  # [K, 1] f32
        gid_win = jnp.concatenate([g0_ref[0:1, :], g1_ref[0:1, :]],
                                  axis=1)  # [1, 2K]
        oh = (key_col == gid_win).astype(jnp.bfloat16)  # [K, 2K]
        # partial[c, r] = sum_f dg[c, f] * oh[f, r]: ONE native bf16 pass
        # (both operands bf16-exact), f32 accumulators — same error class
        # as the former HIGHEST contraction (f32 accumulation order).
        part = jax.lax.dot_general(
            dg, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [32, 2K]
        acc_ref[...] += jnp.concatenate(
            [
                (part[0:9] + part[9:18]) + part[18:27],
                jnp.zeros((GRAD_ROWS - 9, 2 * k), jnp.float32),
            ],
            axis=0,
        )

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        flush_panel(smem[0])
        # Second panel: columns [(w_prev+1)*K, (w_prev+2)*K).
        acc_ref[:, :k] = acc_ref[:, k:]
        flush_panel(smem[0] + 1)
        for s in range(2):
            @pl.when(smem[2 + s] > 0)
            def _():
                pltpu.make_async_copy(
                    stage_ref.at[s], out_hbm.at[0], sem.at[s]
                ).wait()
                smem[2 + s] = 0


def _uncompact_kernel(w0_ref, n_ref, d0_ref, d1_ref, g0_ref, g1_ref,
                      out_ref, *, k: int):
    """Output block b (original gaussians [b*K, (b+1)*K)): gather each
    gaussian's compacted column by equality one-hot against the gid window
    pair. Gaussians with no fragments match nothing -> exact zeros.

    The [16, 2K] window is split in-kernel to exact bf16 triples so the
    contraction runs as one native bf16 pass on a 32-row output instead
    of three HIGHEST passes on a row-starved 16-row one (the same
    economics as the segment-sum kernel; tools/bench_segsum.py)."""
    del n_ref
    b = pl.program_id(0)
    g_col = (b * k + jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)).astype(
        jnp.float32
    )
    gid_win = jnp.concatenate([g0_ref[0:1, :], g1_ref[0:1, :]], axis=1)
    oh = (g_col == gid_win).astype(jnp.bfloat16)  # [K, 2K]
    d_win = jnp.concatenate(
        [d0_ref[0], d1_ref[0]], axis=1
    )  # [16, 2K] f32 (rows 9-15 zero by the segsum contract)
    b1 = d_win.astype(jnp.bfloat16)
    r1 = d_win - b1.astype(jnp.float32)
    b2 = r1.astype(jnp.bfloat16)
    b3 = (r1 - b2.astype(jnp.float32)).astype(jnp.bfloat16)
    d_split = jnp.concatenate([b1, b2, b3], axis=0)  # [48, 2K] bf16, exact
    part = jax.lax.dot_general(
        d_split, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [48, K]
    out_ref[...] = (part[0:16] + part[16:32]) + part[32:48]


def gid_column(tab_t: jnp.ndarray, n_live: jnp.ndarray) -> jnp.ndarray:
    """Monotone compacted gid column from an ORIGINAL-ORDER segment table.

    Rows past ``n_live`` (zero-fragment gaussians + padding) are rewritten
    to 2^24 so the column is globally nondecreasing (live gids keep their
    original ascending order through the stable compaction). For the
    production DEPTH-ordered table use :func:`gid_column_sorted`.
    """
    gid = table_gids(tab_t)
    live = jnp.arange(gid.shape[0], dtype=jnp.int32) < n_live
    return jnp.where(live, gid, _F32_EXACT)


def gid_column_sorted(tab_t: jnp.ndarray, n_live: jnp.ndarray) -> jnp.ndarray:
    """Monotone gid column from a DEPTH-ordered segment table.

    The depth-ordered compaction (ops/expand.build_tables) leaves live
    gids in depth order, so one N-scale 1-column sort restores the
    ascending-gid order the window reduction needs (~1 ms at N=1M —
    vs the F-scale alternatives this keeps everything N-scale).
    """
    gid = table_gids(tab_t)
    live = jnp.arange(gid.shape[0], dtype=jnp.int32) < n_live
    return jnp.sort(jnp.where(live, gid, _F32_EXACT))


def _gid_mat(gid_mono):
    """[8, n_pad] sublane-aligned row-matrix carrying the gid column."""
    return jnp.concatenate(
        [gid_mono[None, :], jnp.zeros((7, gid_mono.shape[0]), jnp.float32)],
        axis=0,
    )


def segment_sums_sorted(
    dg_split: jnp.ndarray,  # [32, F_pad] bf16 (split_grad_rows)
    keys: jnp.ndarray,  # [F_pad] f32 sorted gid keys (exact ints < 2^24)
    gid_mono: jnp.ndarray,  # [n_pad] f32 monotone compacted gids
    total: jnp.ndarray,  # scalar int32 upper bound on live fragments
    k: int = SEG_BLOCK,
) -> jnp.ndarray:
    """Per-compacted-row sums of the gid-sorted gradient stream.

    Returns [n_win, 16, K] f32 window panels (compacted row r lives at
    [r // K, :, r % K]); rows 0-8 are the gradient sums, rows 9-15 zero,
    never-flushed windows exact zeros.
    """
    f_pad = dg_split.shape[1]
    n_pad = gid_mono.shape[0]
    assert f_pad % k == 0 and n_pad % k == 0
    assert dg_split.shape[0] == SPLIT_ROWS
    if f_pad >= (1 << 24):
        raise ValueError("segment reduce requires F_pad < 2^24 (f32 keys)")
    n_blocks = f_pad // k
    n_win = n_pad // k

    # Window per block: rank of the block's first key in the compacted gid
    # column (block-scale: F/K strided reads + searchsorted into N rows).
    first_key = keys[::k]  # [n_blocks] f32
    r_first = (
        jnp.searchsorted(gid_mono, first_key, side="right").astype(jnp.int32)
        - 1
    )
    w0 = jnp.clip(r_first // k, 0, n_win - 2).astype(jnp.int32)
    total32 = jnp.reshape(total.astype(jnp.int32), (1,))
    gid_mat = _gid_mat(gid_mono)

    # Pre-transposed keys: [K, n_blocks_pad] with keys on sublanes, so the
    # kernel carves block b's key column with a lane rotate instead of an
    # eye-matmul transpose. One XLA transpose at block scale (~16 MB).
    nb_pad = -(-n_blocks // 128) * 128
    keys_t = jnp.pad(
        keys.reshape(n_blocks, k).T, ((0, 0), (0, nb_pad - n_blocks))
    )

    # Live-bound dynamic grid: blocks past the live prefix (keys sorted
    # past every real gaussian) contribute nothing — skip them entirely on
    # hardware. The final-step drain handles ANY last block, and the
    # output is zero-initialized via aliasing, so never-flushed windows
    # read as exact zeros either way.
    from .expand import live_grid

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(live_grid(total, n_blocks, k),),
        in_specs=[
            pl.BlockSpec((SPLIT_ROWS, k), lambda b, w0, tt: (0, b)),
            pl.BlockSpec((k, 128), lambda b, w0, tt: (0, b // 128)),
            pl.BlockSpec((8, k), lambda b, w0, tt: (0, w0[b])),
            pl.BlockSpec((8, k), lambda b, w0, tt: (0, w0[b] + 1)),
            pl.BlockSpec(memory_space=pltpu.HBM),  # zeros, aliased to out
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((GRAD_ROWS, 2 * k), jnp.float32),
            pltpu.VMEM((2, GRAD_ROWS, k), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(w0_ref, total_ref, dg_ref, kt_ref, g0_ref, g1_ref,
               zeros_ref, out_hbm, acc_ref, stage_ref, smem, sem):
        del zeros_ref
        _segsum_kernel(w0_ref, total_ref, dg_ref, kt_ref, g0_ref, g1_ref,
                       out_hbm, acc_ref, stage_ref, smem, sem, k=k)

    zeros = jnp.zeros((n_win, GRAD_ROWS, k), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_win, GRAD_ROWS, k), jnp.float32),
        input_output_aliases={6: 0},  # zeros (operand 6 incl. prefetch)
        interpret=interpret_mode(),
    )(w0, total32, dg_split, keys_t, gid_mat, gid_mat, zeros)


def uncompact_columns(
    d_comp: jnp.ndarray,  # [n_win, 16, K] from segment_sums_sorted
    gid_mono: jnp.ndarray,  # [n_pad] f32 monotone compacted gids
    n: int,  # original gaussian count
    k: int = SEG_BLOCK,
) -> jnp.ndarray:
    """Scatter compacted sums back to original gaussian order.

    Returns [16, n] f32 (rows 0-8 the per-gaussian gradient sums; zero for
    gaussians with no fragments).
    """
    n_win = d_comp.shape[0]
    n_out = -(-n // k) * k
    n_blocks = n_out // k

    # Rank of each output block's first gaussian id among live gids.
    g_first = (jnp.arange(n_blocks, dtype=jnp.int32) * k).astype(jnp.float32)
    rank = jnp.searchsorted(gid_mono, g_first, side="left").astype(jnp.int32)
    w0 = jnp.clip(rank // k, 0, n_win - 2).astype(jnp.int32)
    gid_mat = _gid_mat(gid_mono)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, GRAD_ROWS, k), lambda b, w0, nn: (w0[b], 0, 0)),
            pl.BlockSpec((1, GRAD_ROWS, k),
                         lambda b, w0, nn: (w0[b] + 1, 0, 0)),
            pl.BlockSpec((8, k), lambda b, w0, nn: (0, w0[b])),
            pl.BlockSpec((8, k), lambda b, w0, nn: (0, w0[b] + 1)),
        ],
        out_specs=pl.BlockSpec((GRAD_ROWS, k), lambda b, w0, nn: (0, b)),
    )
    out = pl.pallas_call(
        functools.partial(_uncompact_kernel, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((GRAD_ROWS, n_out), jnp.float32),
        interpret=interpret_mode(),
    )(w0, jnp.zeros((1,), jnp.int32), d_comp, d_comp, gid_mat, gid_mat)
    return out[:, :n]
