"""Streaming tile rasterizer: Pallas forward + hand-derived backward.

Renderer extension (SURVEY.md §7 M4/M5, hard parts #1/#2). The kernel
consumes the (tile, depth)-sorted fragment stream from ops/binning.py
through a fixed (tile, chunk) work schedule:

- grid = one program per work item; items of a tile are consecutive, so the
  per-tile output block stays resident in VMEM across its chunks and
  per-pixel accumulators (color, transmittance) live in scratch.
- fragment attributes are stored attribute-major [16, F_pad] so a chunk is
  a (16, chunk) block: attribute rows broadcast against the 256 tile pixels
  held on the other axis — [256 pixels, chunk frags] VPU math with no
  per-chunk transposes.
- tile pixel blocks are stored [T, 4, 256] — channels on sublanes, pixels
  on lanes. A trailing dim of 4 would be padded to 128 lanes by Mosaic,
  inflating kernel HBM traffic ~32x (measured: ~1 GB/pass at 1080p); the
  one [256, 4] transpose per tile flush is noise by comparison.
- the front-to-back transmittance recurrence is computed per chunk as
  exp(cumsum(log1p(-alpha))) with the exclusive cumsum done as one
  [256, K] x [K, K] strict-lower-triangular matmul on the MXU.

Blending semantics match render/reference.py exactly (alpha clamp 0.99,
alpha floor 1/255, q cutoff 3 sigma, T floor 1e-4); the backward kernel
re-derives gradients analytically per tile with suffix sums
S_i = C_blend - A_i so everything runs front-to-back in one pass
(no reverse sweep, bounded memory).

Attribute rows: 0:x 1:y 2:conic_a 3:conic_b 4:conic_c 5:r 6:g 7:b
8:opacity 9..15:pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE_SIZE
from .kernel_bundle import interpret_mode

NUM_ATTRS = 16
PIX = TILE_SIZE * TILE_SIZE  # 256 pixels per tile

ALPHA_CLAMP = 0.99
ALPHA_MIN = 1.0 / 255.0
T_MIN = 1e-4
Q_CUTOFF = 9.0  # RADIUS_CUTOFF ** 2

# The TPU contracts f32 operands as bf16 multi-pass; at DEFAULT precision
# that is a single bf16 pass (~2^-8 relative), which wrecks the quadratic
# form (catastrophic cancellation against coefficients ~10^3) and the
# transmittance cumsum (T error ~1%). HIGHEST (fp32 contract) restores
# ~f32 accuracy; measured on hardware via tools/ probes. (Mosaic lowers
# only DEFAULT and HIGHEST — Precision.HIGH is rejected.)
_HIGH = jax.lax.Precision.HIGHEST

# Work-item info packing: SMEM is ~1 MB/core, and at 1M-gaussian/1080p
# scale six separate int32 prefetch arrays exceed it — tile id and the
# four flags share one int32 per work item instead.
WORK_TILE_MASK = (1 << 24) - 1
WORK_FIRST_BIT = 24
WORK_LAST_BIT = 25
WORK_VALID_BIT = 26
WORK_NEW_BLOCK_BIT = 27


def pack_work_info(tile, first, last, valid, new_block):
    return (
        tile
        | (first << WORK_FIRST_BIT)
        | (last << WORK_LAST_BIT)
        | (valid << WORK_VALID_BIT)
        | (new_block << WORK_NEW_BLOCK_BIT)
    ).astype(jnp.int32)


def _pixel_basis(chunk):
    """[PIX, 6] quadratic monomial basis at tile-local pixel centers."""
    p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (p % TILE_SIZE).astype(jnp.float32) + 0.5  # tile-local
    py = (p // TILE_SIZE).astype(jnp.float32) + 0.5
    return jnp.concatenate(
        [jnp.ones_like(px), px, py, px * px, px * py, py * py], axis=1
    )


def _chunk_alphas(frag_ref, ts, te, blk, tx, ty, chunk, item_valid,
                  cutoff_sq=Q_CUTOFF, mode=0):
    """Shared fwd/bwd per-chunk math up to alpha. Returns per-fragment rows
    [1, K] and per-(pixel, fragment) [PIX, K] arrays. ``item_valid`` masks
    padding work items to no-ops (they revisit real tiles' ranges).
    ``mode``: 0 splat (gaussian falloff), 1 ellipse (opaque boundary ring),
    2 point (treated as splat; projection substitutes an isotropic conic) —
    the GaussianDisplayMode analog (reference: gaussian_transform.rs:7-14).

    The quadratic form q(px,py) is evaluated on the MXU: it is quadratic
    in pixel coordinates with six per-fragment coefficients, so q for all
    256 pixels is one [PIX,6] @ [6,K] contraction. Tile-local coordinates
    keep the expansion well-conditioned (|x_local| is bounded by the splat
    radius because fragments only exist in bbox-overlapping tiles).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    fidx = blk * chunk + lane
    inrange = (fidx >= ts) & (fidx < te) & (item_valid == 1)

    x_l = frag_ref[0:1, :] - (tx * TILE_SIZE).astype(jnp.float32)
    y_l = frag_ref[1:2, :] - (ty * TILE_SIZE).astype(jnp.float32)
    c0 = frag_ref[2:3, :]
    c1 = frag_ref[3:4, :]
    c2 = frag_ref[4:5, :]
    op = frag_ref[8:9, :]

    coef = jnp.concatenate(
        [
            c0 * x_l * x_l + 2.0 * c1 * x_l * y_l + c2 * y_l * y_l,
            -2.0 * (c0 * x_l + c1 * y_l),
            -2.0 * (c2 * y_l + c1 * x_l),
            c0,
            2.0 * c1,
            c2,
        ],
        axis=0,
    )  # [6, K]

    basis = _pixel_basis(chunk)  # [PIX, 6]
    q = jnp.dot(basis, coef, preferred_element_type=jnp.float32, precision=_HIGH)

    if mode == 1:
        # Ellipse outline: opaque ring at the cutoff boundary.
        g_exp = jnp.ones_like(q)
        alpha_raw = op * g_exp
        alpha = jnp.minimum(alpha_raw, ALPHA_CLAMP)
        ring = (q <= cutoff_sq) & (q >= cutoff_sq * 0.64)
        ok = inrange & ring & (alpha >= ALPHA_MIN)
    else:
        g_exp = jnp.exp(-0.5 * q)
        alpha_raw = op * g_exp
        alpha = jnp.minimum(alpha_raw, ALPHA_CLAMP)
        ok = inrange & (q <= cutoff_sq) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(ok, alpha, 0.0)
    return alpha, alpha_raw, g_exp, ok, x_l, y_l, q


def _tri(chunk, strict):
    """[K, K] lower-triangular ones: cumsum-by-matmul operand."""
    i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return ((i < j) if strict else (i <= j)).astype(jnp.float32)


# Lane sub-block for the cumsum-by-matmul: one MXU tile wide. The naive
# [PIX, K] @ [K, K] triangular matmul costs PIX*K^2 MACs per chunk — the
# dominant MXU term at chunk 512 (~2/3 of kernel FLOPs at fp32-contract
# passes). Blocking it as K/B slices of [PIX, B] @ [B, B] plus a running
# per-pixel carry costs PIX*K*B: 4x fewer MACs at K=512, same result up
# to f32 summation order.
CUMSUM_BLOCK = 128


def _cumsum_lanes(x, chunk, strict):
    """Per-row cumsum of [PIX, K] along lanes via blocked MXU matmuls."""
    b = min(chunk, CUMSUM_BLOCK)
    tri_b = _tri(b, strict)
    if chunk == b:
        return jnp.dot(x, tri_b, preferred_element_type=jnp.float32,
                       precision=_HIGH)
    parts = []
    carry = None
    for s in range(chunk // b):
        xs = x[:, s * b:(s + 1) * b]
        local = jnp.dot(xs, tri_b, preferred_element_type=jnp.float32,
                        precision=_HIGH)
        parts.append(local if carry is None else local + carry)
        tot = jnp.sum(xs, axis=1, keepdims=True)
        carry = tot if carry is None else carry + tot
    return jnp.concatenate(parts, axis=1)


def _fwd_kernel(
    winfo_ref, wb_ref, tstart_ref, tend_ref,  # prefetch
    frag_ref,  # (NUM_ATTRS, chunk) VMEM
    out_ref,  # (1, 4, PIX) VMEM: channel rows x pixel lanes
    state_ref,  # (PIX, 8) VMEM scratch: cols 0-2 acc rgb, col 3 T
    *,
    chunk: int,
    tiles_x: int,
    bg: tuple,
    cutoff_sq: float,
    mode: int,
):
    w = pl.program_id(0)
    info = winfo_ref[w]
    t = info & WORK_TILE_MASK
    first = (info >> WORK_FIRST_BIT) & 1
    last = (info >> WORK_LAST_BIT) & 1
    valid = (info >> WORK_VALID_BIT) & 1
    blk = wb_ref[w]
    ts = tstart_ref[t]
    te = tend_ref[t]

    @pl.when(first == 1)
    def _():
        state_ref[...] = jnp.zeros((PIX, 8), jnp.float32)
        state_ref[:, 3:4] = jnp.ones((PIX, 1), jnp.float32)

    # Padding work items and chunks outside this tile's fragment range
    # contribute exactly nothing (every fragment masks to alpha 0), so the
    # whole per-chunk body is skippable. At bench shapes ~1/3 of grid steps
    # are padding or empty-tile floor items — this turns them into bare
    # DMA + flush steps.
    has_frags = (valid == 1) & (te > blk * chunk) & (ts < (blk + 1) * chunk)

    @pl.when(has_frags)
    def _():
        alpha, _, _, _, _, _, _ = _chunk_alphas(
            frag_ref, ts, te, blk, t % tiles_x, t // tiles_x, chunk, valid,
            cutoff_sq, mode,
        )

        log1m = jnp.log1p(-alpha)
        ecs = _cumsum_lanes(log1m, chunk, strict=True)

        t_run = state_ref[:, 3:4]
        t_i = t_run * jnp.exp(ecs)  # [PIX, K]
        blend = t_i > T_MIN
        wgt = jnp.where(blend, alpha * t_i, 0.0)

        # acc_ch += sum_k wgt * c_ch: one [PIX,K] x [K,3] MXU contraction
        # instead of three VPU multiply+reduce passes.
        c_rows = frag_ref[5:8, :]  # [3, K]
        state_ref[:, 0:3] += jax.lax.dot_general(
            wgt, c_rows, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HIGH,
        )
        state_ref[:, 3:4] = t_run * jnp.exp(
            jnp.sum(jnp.where(blend, log1m, 0.0), axis=1, keepdims=True)
        )

    @pl.when(last == 1)
    def _():
        t_f = state_ref[:, 3:4]
        cols = [
            state_ref[:, ch : ch + 1] + t_f * float(bg[ch])
            for ch in range(3)
        ]
        final = jnp.concatenate(cols + [t_f], axis=1)  # [PIX, 4]
        out_ref[0] = final.T  # one [256, 4] transpose per tile flush


def _bwd_kernel(
    winfo_ref, wb_ref, tstart_ref, tend_ref,  # prefetch
    frag_ref,  # (NUM_ATTRS, chunk)
    fwd_ref,  # (1, 4, PIX): forward output tile (color+bg rows, T row)
    g_ref,  # (1, 4, PIX): cotangent of the forward output tile
    dfrag_ref,  # out (NUM_ATTRS, chunk), accumulated across revisits
    state_ref,  # (PIX, 16) scratch: 0-2 prefix A rgb, 3 T, 4 t_f, 5 gT_tot,
    #             6-8 g_rgb, 9-11 c_blend (per-pixel columns)
    *,
    chunk: int,
    tiles_x: int,
    bg: tuple,
    cutoff_sq: float,
    mode: int,
):
    w = pl.program_id(0)
    info = winfo_ref[w]
    t = info & WORK_TILE_MASK
    first = (info >> WORK_FIRST_BIT) & 1
    valid = (info >> WORK_VALID_BIT) & 1
    new_blk = (info >> WORK_NEW_BLOCK_BIT) & 1
    blk = wb_ref[w]
    ts = tstart_ref[t]
    te = tend_ref[t]

    @pl.when(new_blk == 1)
    def _():
        dfrag_ref[...] = jnp.zeros((NUM_ATTRS, chunk), jnp.float32)

    # Same skip as the forward kernel: chunks with no live fragment for
    # this tile accumulate exactly zero into dfrag and leave the prefix
    # state untouched, so the whole body (including the first-chunk
    # prologue: a nonempty tile's first chunk always holds its first
    # fragment, and an empty tile's state is never read) is skippable.
    has_frags = (valid == 1) & (te > blk * chunk) & (ts < (blk + 1) * chunk)

    @pl.when(has_frags)
    def _body():
        _bwd_chunk_body(
            winfo_ref, wb_ref, tstart_ref, tend_ref, frag_ref, fwd_ref,
            g_ref, dfrag_ref, state_ref, t, first, valid, blk, ts, te,
            chunk=chunk, tiles_x=tiles_x, bg=bg, cutoff_sq=cutoff_sq,
            mode=mode,
        )


def _bwd_chunk_body(
    winfo_ref, wb_ref, tstart_ref, tend_ref, frag_ref, fwd_ref, g_ref,
    dfrag_ref, state_ref, t, first, valid, blk, ts, te,
    *, chunk, tiles_x, bg, cutoff_sq, mode,
):
    @pl.when(first == 1)
    def _():
        state_ref[...] = jnp.zeros((PIX, 16), jnp.float32)
        state_ref[:, 3:4] = jnp.ones((PIX, 1), jnp.float32)
        # Transpose the per-tile outputs/cotangents into pixel-column
        # layout once per tile instead of once per chunk.
        fwd_t = fwd_ref[0].T  # [PIX, 4]
        g_t = g_ref[0].T  # [PIX, 4]
        t_f = fwd_t[:, 3:4]
        state_ref[:, 4:5] = t_f
        state_ref[:, 5:6] = g_t[:, 3:4] + (
            g_t[:, 0:1] * float(bg[0])
            + g_t[:, 1:2] * float(bg[1])
            + g_t[:, 2:3] * float(bg[2])
        )
        state_ref[:, 6:9] = g_t[:, 0:3]
        for ch in range(3):
            state_ref[:, 9 + ch : 10 + ch] = (
                fwd_t[:, ch : ch + 1] - t_f * float(bg[ch])
            )

    alpha, alpha_raw, g_exp, ok, x_l, y_l, _ = _chunk_alphas(
        frag_ref, ts, te, blk, t % tiles_x, t // tiles_x, chunk, valid,
        cutoff_sq, mode,
    )
    c0 = frag_ref[2:3, :]
    c1 = frag_ref[3:4, :]
    c2 = frag_ref[4:5, :]
    op = frag_ref[8:9, :]

    log1m = jnp.log1p(-alpha)
    ecs = _cumsum_lanes(log1m, chunk, strict=True)

    t_run = state_ref[:, 3:4]
    t_i = t_run * jnp.exp(ecs)
    blend = t_i > T_MIN
    wgt = jnp.where(blend, alpha * t_i, 0.0)

    t_f = state_ref[:, 4:5]
    g_t_total = state_ref[:, 5:6]

    # dL/dalpha_i = sum_ch g_ch (T_i c_ich - S_ich/(1-a_i))
    #              - gT_total * T_f/(1-a_i),   S_i = C_blend - A_i(incl).
    # The channel sum distributes into the inclusive cumsum (g_ch is
    # per-pixel constant), so with u = sum_ch g_ch c_ch the three per-
    # channel triangular matmuls collapse into one:
    #   sum_ch g_ch S_ich = sum_ch g_ch (C_bl_ch - A_run_ch)
    #                       - cumsum_incl(wgt * u).
    one_minus = jnp.where(alpha < 1.0, 1.0 - alpha, 1.0)
    g3 = state_ref[:, 6:9]  # [PIX, 3]
    c_rows = frag_ref[5:8, :]  # [3, K]
    u = jax.lax.dot_general(
        g3, c_rows, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGH,
    )  # [PIX, K]
    g_cbl_a = jnp.sum(
        g3 * (state_ref[:, 9:12] - state_ref[:, 0:3]), axis=1, keepdims=True
    )  # [PIX, 1]
    gs_i = g_cbl_a - _cumsum_lanes(wgt * u, chunk, strict=False)
    dalpha = t_i * u - gs_i / one_minus - g_t_total * t_f / one_minus
    # color gradient: dL/dc_ich = sum_pix g_ch w_i — one [3,PIX]x[PIX,K]
    # MXU contraction.
    dfrag_ref[5:8, :] += jax.lax.dot_general(
        g3, wgt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGH,
    )
    dalpha = jnp.where(blend & ok, dalpha, 0.0)

    # alpha = min(0.99, op * G): clamp kills the gradient.
    live = alpha_raw < ALPHA_CLAMP
    dalpha = jnp.where(live, dalpha, 0.0)

    if mode != 1:
        # Moment trick (PERF_NOTES item 3, backward half): q is linear in
        # the six polynomial coefficients, so every per-pixel reduction
        # collapses into M = basis^T @ d_q [6, K] — ONE MXU contraction —
        # and the attribute gradients follow per fragment ([1, K] math)
        # through coef(c0, c1, c2, x_l, y_l). d_op = sum_p dalpha * g_exp
        # = (-2 / op) * sum_p d_q = -2 M_0 / op (exact where op > 0;
        # op == 0 implies dalpha == 0, so the guard returns the true 0).
        d_q = (-0.5) * op * (dalpha * g_exp)  # [PIX, K]
        m = jax.lax.dot_general(
            _pixel_basis(chunk), d_q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HIGH,
        )  # [6, K]
        m0 = m[0:1, :]
        m1 = m[1:2, :]
        m2 = m[2:3, :]
        d_op = jnp.where(op > 0.0, -2.0 * m0 / op, 0.0)
        d_c0 = m0 * x_l * x_l - 2.0 * x_l * m1 + m[3:4, :]
        d_c1 = (
            2.0 * m0 * x_l * y_l - 2.0 * y_l * m1 - 2.0 * x_l * m2
            + 2.0 * m[4:5, :]
        )
        d_c2 = m0 * y_l * y_l - 2.0 * y_l * m2 + m[5:6, :]
        d_x = m0 * (2.0 * c0 * x_l + 2.0 * c1 * y_l) - 2.0 * c0 * m1 \
            - 2.0 * c1 * m2
        d_y = m0 * (2.0 * c1 * x_l + 2.0 * c2 * y_l) - 2.0 * c1 * m1 \
            - 2.0 * c2 * m2
    else:
        # Ellipse mode: alpha is flat inside the ring (g_exp == 1), so only
        # opacity receives gradient.
        zero = jnp.zeros((1, chunk), jnp.float32)
        d_op = jnp.sum(dalpha, axis=0, keepdims=True)
        d_c0 = d_c1 = d_c2 = d_x = d_y = zero

    dfrag_ref[0:1, :] += d_x
    dfrag_ref[1:2, :] += d_y
    dfrag_ref[2:3, :] += d_c0
    dfrag_ref[3:4, :] += d_c1
    dfrag_ref[4:5, :] += d_c2
    dfrag_ref[8:9, :] += d_op

    # advance prefix accumulators
    state_ref[:, 0:3] += jax.lax.dot_general(
        wgt, c_rows, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGH,
    )
    state_ref[:, 3:4] = t_run * jnp.exp(
        jnp.sum(jnp.where(blend, log1m, 0.0), axis=1, keepdims=True)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def rasterize_tiles(
    frag_attrs,  # [NUM_ATTRS, F_pad] f32, differentiable
    work_info,  # [W] int32, pack_work_info(tile, first, last, valid, new)
    work_block,  # [W] int32 fragment-block index
    tile_start,  # [T] int32
    tile_end,  # [T] int32
    chunk: int,
    tiles_x: int,
    n_tiles: int,
    bg: tuple,
    cutoff_sq: float = Q_CUTOFF,
    mode: int = 0,
):
    """Rasterize the fragment stream into per-tile pixel blocks.

    Returns [n_tiles, 4, 256] f32: RGB rows (background composited) +
    final-transmittance row, pixels on the last axis.
    """
    return _rasterize_fwd_call(
        frag_attrs, work_info, work_block, tile_start, tile_end,
        chunk, tiles_x, n_tiles, bg, cutoff_sq, mode,
    )


def _rasterize_fwd_call(frag_attrs, work_info, work_block, tile_start,
                        tile_end, chunk, tiles_x, n_tiles, bg,
                        cutoff_sq=Q_CUTOFF, mode=0):
    n_work = work_info.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_work,),
        in_specs=[
            pl.BlockSpec(
                (NUM_ATTRS, chunk),
                lambda w, wi, wb, ts, te: (0, wb[w]),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, PIX),
            lambda w, wi, wb, ts, te: (wi[w] & WORK_TILE_MASK, 0, 0),
        ),
        scratch_shapes=[pltpu.VMEM((PIX, 8), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, chunk=chunk, tiles_x=tiles_x, bg=bg,
                          cutoff_sq=cutoff_sq, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 4, PIX), jnp.float32),
        interpret=interpret_mode(),
    )(work_info, work_block, tile_start, tile_end, frag_attrs)


def _rasterize_fwd(frag_attrs, work_info, work_block, tile_start, tile_end,
                   chunk, tiles_x, n_tiles, bg, cutoff_sq, mode):
    out = _rasterize_fwd_call(
        frag_attrs, work_info, work_block, tile_start, tile_end,
        chunk, tiles_x, n_tiles, bg, cutoff_sq, mode,
    )
    residuals = (frag_attrs, work_info, work_block, tile_start, tile_end, out)
    return out, residuals


def _rasterize_bwd(chunk, tiles_x, n_tiles, bg, cutoff_sq, mode, residuals,
                   g_out):
    frag_attrs, work_info, work_block, tile_start, tile_end, out = residuals
    n_work = work_info.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_work,),
        in_specs=[
            pl.BlockSpec(
                (NUM_ATTRS, chunk),
                lambda w, wi, wb, ts, te: (0, wb[w]),
            ),
            pl.BlockSpec(
                (1, 4, PIX),
                lambda w, wi, wb, ts, te: (wi[w] & WORK_TILE_MASK, 0, 0),
            ),
            pl.BlockSpec(
                (1, 4, PIX),
                lambda w, wi, wb, ts, te: (wi[w] & WORK_TILE_MASK, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (NUM_ATTRS, chunk),
            lambda w, wi, wb, ts, te: (0, wb[w]),
        ),
        scratch_shapes=[pltpu.VMEM((PIX, 16), jnp.float32)],
    )
    dfrag = pl.pallas_call(
        functools.partial(_bwd_kernel, chunk=chunk, tiles_x=tiles_x, bg=bg,
                          cutoff_sq=cutoff_sq, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(frag_attrs.shape, jnp.float32),
        interpret=interpret_mode(),
    )(work_info, work_block, tile_start, tile_end, frag_attrs, out, g_out)
    return (dfrag, None, None, None, None)


rasterize_tiles.defvjp(_rasterize_fwd, _rasterize_bwd)


def tiles_to_image(tiles: jnp.ndarray, tiles_x: int, tiles_y: int,
                   width: int, height: int) -> jnp.ndarray:
    """[T, C, 256] tile blocks -> [height, width, C] image crop."""
    c = tiles.shape[1]
    img = tiles.reshape(tiles_y, tiles_x, c, TILE_SIZE, TILE_SIZE)
    img = img.transpose(0, 3, 1, 4, 2).reshape(
        tiles_y * TILE_SIZE, tiles_x * TILE_SIZE, c
    )
    return img[:height, :width]
