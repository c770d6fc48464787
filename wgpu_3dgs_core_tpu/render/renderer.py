"""The full differentiable renderer: projection -> binning -> tiles -> image.

Renderer extension (SURVEY.md §7 M4/M5). ``render`` is the low-level
array-in/image-out function (jittable, differentiable w.r.t. every gaussian
parameter); ``render_gaussians`` is the high-level entry taking a
:class:`GaussiansBuffer`/packed layout plus the reference-style
GaussianTransform/ModelTransform knobs.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..buffer import (
    GaussianDisplayMode,
    GaussiansBuffer,
    GaussianTransform,
    ModelTransform,
)
from ..layouts import Cov3dFormat, PackedGaussians
from ..ops.binning import (
    TILE_SIZE,
    bin_splats_attrs,
    default_max_fragments,
    num_tiles,
    pad_schedule,
)
from ..ops.projection import project
from ..ops.rasterize import (
    ATTR_ROWS,
    DEFAULT_GROUP,
    TILE_ROW,
    rasterize_tiles_bwd,
    rasterize_tiles_fwd,
    tiles_to_image,
)
from ..ops.segreduce import (
    gid_column_sorted,
    segment_sums_sorted,
    split_grad_rows,
    uncompact_columns,
)
from ..ops.sh import gaussian_color
from ..ops.transforms import unpack_color, unpack_cov3d, unpack_sh
from .camera import Camera

# Fragment block width for the streaming rasterizer. With the tile-padded
# stream each tile pays an average chunk/2 padding slots, so the smaller
# MXU-native width wastes less than 256 did; per-block fixed costs are
# amortized by the kernels' inner work loop.
DEFAULT_CHUNK = 128


class RenderResult(NamedTuple):
    image: jnp.ndarray  # [H, W, 3] f32
    transmittance: jnp.ndarray  # [H, W] f32 final T per pixel
    overflow: jnp.ndarray  # scalar bool: fragment capacity exceeded


def project_and_color(
    means, cov3d_sigma6, base_color, opacity, camera,
    sh=None, sh_deg: int = 0, no_sh0: bool = False,
    model_transform=None, size: float = 1.0, max_std_dev: float = 3.0,
    display_mode: GaussianDisplayMode = GaussianDisplayMode.SPLAT,
    antialiased: bool = False,
):
    """Shared render prologue: EWA projection + view-dependent color.

    Honors every GaussianTransform knob (reference:
    src/buffer/gaussian_transform.rs:7-98) identically for the
    single-device and sharded renderers. Returns
    (splats, rgb [N, 3], opacity' [N]).
    """
    splats = project(
        means, cov3d_sigma6, camera, model_transform,
        size=size, radius_cutoff=max_std_dev, antialiased=antialiased,
        opacity=(
            opacity if display_mode == GaussianDisplayMode.SPLAT else None
        ),
    )
    opacity = opacity * splats.compensation
    if display_mode == GaussianDisplayMode.POINT:
        # Fixed-size isotropic dot of ~``size`` pixels std dev.
        pt = max(float(size), 0.5)
        conic_pt = jnp.array([1.0 / (pt * pt), 0.0, 1.0 / (pt * pt)],
                             jnp.float32)
        splats = splats._replace(
            conic=jnp.broadcast_to(conic_pt, splats.conic.shape),
            # zeros_like keeps the [N, 2] extent shape (a bare 0.0 would
            # broadcast the whole expression down to [N, 1]).
            extent=jnp.where(
                splats.mask[:, None], jnp.ceil(max_std_dev * pt),
                jnp.zeros_like(splats.extent),
            ),
        )

    view = camera.view_matrix()
    cam_pos = -jnp.einsum("ji,j->i", view[:3, :3], view[:3, 3],
                          precision=jax.lax.Precision.HIGHEST)
    dirs = means - cam_pos
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
    rgb = gaussian_color(base_color, sh, dirs, sh_deg, no_sh0)
    return splats, rgb, opacity


def measure_max_fragments(
    means: jnp.ndarray,
    cov3d_sigma6: jnp.ndarray,
    opacity: jnp.ndarray,
    camera: Camera,
    headroom: float = 1.3,
    model_transform: Optional[tuple] = None,
    size: float = 1.0,
    max_std_dev: float = 3.0,
    antialiased: bool = False,
) -> int:
    """Measured ``max_fragments`` for a scene+camera: one N-scale dry pass.

    Projects the scene (opacity-aware extents, same as the renderer) and
    counts live fragments exactly — no fragment-scale work. Returns a
    lane-aligned capacity with ``headroom`` slack for parameter drift
    during training. Every fragment-scale op costs proportional to the
    STATIC capacity, so sizing from a measurement instead of the
    ``default_max_fragments`` heuristic is both faster and safer
    (bench.py sizes its capacity the same way). Blocks on the device
    (returns a Python int) — call once per scene/camera, outside jit.
    """
    from ..ops.binning import count_fragments_exact, tile_bounds

    h, w_px = camera.height, camera.width
    tiles_x, tiles_y = num_tiles(w_px, h)
    splats = project(
        means, cov3d_sigma6, camera, model_transform,
        size=size, radius_cutoff=max_std_dev, antialiased=antialiased,
        opacity=opacity,
    )
    _, y0, _, y1 = tile_bounds(splats.xy, splats.extent, tiles_x, tiles_y)
    max_sy = int(jnp.max(jnp.maximum(y1 - y0, 0)))
    op_eff = opacity * splats.compensation * splats.mask
    total = int(
        count_fragments_exact(splats.xy, splats.extent, splats.conic,
                              op_eff, splats.mask, tiles_x, tiles_y,
                              max_span_y=max_sy,
                              cutoff_sq=float(max_std_dev) ** 2)
    )
    cap = max(int(total * headroom), 1024)
    return -(-cap // 256) * 256


def measure_max_rows(
    means: jnp.ndarray,
    cov3d_sigma6: jnp.ndarray,
    opacity: jnp.ndarray,
    camera: Camera,
    headroom: float = 1.3,
    model_transform: Optional[tuple] = None,
    size: float = 1.0,
    max_std_dev: float = 3.0,
    antialiased: bool = False,
) -> int:
    """Measured ``max_rows`` (the level-1 row-stream capacity) for a
    scene+camera — the companion of :func:`measure_max_fragments`. Rows
    cost far less than fragments downstream, so the default (max_rows =
    max_fragments) is always safe; sizing it shaves the row-scale table
    and interval work."""
    from ..ops.binning import count_rows

    h, w_px = camera.height, camera.width
    tiles_x, tiles_y = num_tiles(w_px, h)
    splats = project(
        means, cov3d_sigma6, camera, model_transform,
        size=size, radius_cutoff=max_std_dev, antialiased=antialiased,
        opacity=opacity,
    )
    op_eff = opacity * splats.compensation * splats.mask
    total = int(
        count_rows(splats.xy, splats.extent, splats.conic, op_eff,
                   splats.mask, tiles_x, tiles_y,
                   cutoff_sq=float(max_std_dev) ** 2)
    )
    cap = max(int(total * headroom), 1024)
    return -(-cap // 512) * 512


def render(
    means: jnp.ndarray,
    cov3d_sigma6: jnp.ndarray,
    base_color: jnp.ndarray,
    opacity: jnp.ndarray,
    camera: Camera,
    sh: Optional[jnp.ndarray] = None,
    sh_deg: int = 0,
    no_sh0: bool = False,
    background: tuple = (0.0, 0.0, 0.0),
    model_transform: Optional[tuple] = None,
    max_fragments: Optional[int] = None,
    chunk: int = DEFAULT_CHUNK,
    size: float = 1.0,
    max_std_dev: float = 3.0,
    display_mode: GaussianDisplayMode = GaussianDisplayMode.SPLAT,
    antialiased: bool = False,
    pad_slack: float = 1.0,
    max_rows: Optional[int] = None,
) -> RenderResult:
    """Differentiable tiled render to [H, W, 3].

    ``means`` [N,3], ``cov3d_sigma6`` [N,6], ``base_color`` [N,3] in [0,1],
    ``opacity`` [N] in [0,1], optional ``sh`` [N,15,3].
    ``size``/``max_std_dev``/``display_mode`` implement the reference's
    GaussianTransform knobs (reference: src/buffer/gaussian_transform.rs).
    ``pad_slack`` scales the tile-padding headroom of the streaming
    schedule (worst case = one partial chunk per tile; the expectation is
    half that). Values < 1 shrink every fragment-padded op — chiefly the
    backward reorder sort — and tile truncation, if it ever fires, is
    surfaced via ``overflow`` and zeroes the step's gradients, exactly
    like fragment-capacity overflow.
    """
    h, w_px = camera.height, camera.width
    tiles_x, tiles_y = num_tiles(w_px, h)
    t_total = tiles_x * tiles_y
    n = means.shape[0]

    if max_fragments is None:
        max_fragments = default_max_fragments(n, tiles_x, tiles_y)
    # Stream capacity must be whole chunks.
    f_cap = -(-max_fragments // chunk) * chunk

    splats, rgb, opacity = project_and_color(
        means, cov3d_sigma6, base_color, opacity, camera,
        sh=sh, sh_deg=sh_deg, no_sh0=no_sh0,
        model_transform=model_transform, size=size,
        max_std_dev=max_std_dev, display_mode=display_mode,
        antialiased=antialiased,
    )

    tiles, overflow = rasterize_splats(
        splats.xy, splats.depth, splats.conic, splats.extent, splats.mask,
        rgb, opacity, tiles_x, tiles_y, f_cap, chunk, tuple(background),
        cutoff_sq=float(max_std_dev) ** 2, mode=int(display_mode),
        pad_slack=pad_slack, max_rows=max_rows,
    )
    img = tiles_to_image(tiles, tiles_x, tiles_y, w_px, h)
    return RenderResult(
        image=img[..., 0:3],
        transmittance=img[..., 3],
        overflow=overflow,
    )


def _bin_rasterize_impl(attr_cols, xy, extent, depth, mask_f,
                        tile_y_offset, tiles_x, tiles_y, f_cap, chunk,
                        bg, cutoff_sq, mode, pad_slack, r_cap):
    """Bin + fused attribute fetch + forward rasterization.

    ``attr_cols`` is attribute-major [9, N] (lanes = gaussians) so both
    the forward fetch and the backward segment reduction work in
    lane-friendly layouts end to end.
    Returns ((tiles, tile_written, overflow), residuals-for-backward).
    """
    t_total = tiles_x * tiles_y
    group = DEFAULT_GROUP
    grp = chunk * group
    # Tile padding adds at most one partial chunk per nonempty tile, so
    # pad_slack == 1 never truncates a stream that fit f_cap. Every
    # fragment-padded op (the backward gid sort above all) costs
    # proportional to this STATIC capacity while the EXPECTED padding is
    # ~chunk/2 per tile, so callers may trade the worst case down
    # (pad_slack < 1); truncation is detected (sched.truncated), folded
    # into the overflow flag, and zeroes the step's gradients exactly
    # like fragment overflow.
    f_pad_cap = -(-(f_cap + int(t_total * chunk * pad_slack)) // grp) * grp
    mask = mask_f > 0.5

    stream, attrs_sorted, tab_t = bin_splats_attrs(
        xy, extent, depth, mask, attr_cols, tiles_x, tiles_y, f_cap,
        tile_y_offset, max_rows=r_cap, cutoff_sq=cutoff_sq,
        opacity_cull=mode != 1,
    )
    sched = pad_schedule(stream, chunk, f_pad_cap)

    # [16, MAT_COLS] sorted matrix: rows 0-1 TILE-LOCAL x/y (shifted by
    # the owning tile's pixel origin so the kernels never touch tile
    # coordinates), rows 2-8 attributes, row 9 the owning gaussian id
    # (f32-exact below 2^24; the backward reorder key — rode the expand
    # fetch + sort as an f32 payload), row 10 the owning tile id (the
    # kernels' per-lane validity key; padding slots carry t_total from
    # the binning, and the column tail is filled with t_total too so
    # out-of-stream lanes never match a live tile), rows 11-15 pad.
    # Columns padded so any window pair fl, fl+1 with fl <= f_cap // grp
    # stays in bounds — the kernels read the stream IN PLACE through two
    # overlapping auto-pipelined windows instead of repacking a padded
    # copy (a vmapped-slice repack measured ~100 ms at bench shapes).
    tile_sorted = stream.tile_id
    x_local = attrs_sorted[0] - (
        (tile_sorted % tiles_x) * TILE_SIZE
    ).astype(jnp.float32)
    y_local = attrs_sorted[1] - (
        (tile_sorted // tiles_x) * TILE_SIZE
    ).astype(jnp.float32)
    mat_cols = (-(-f_cap // grp) + 2) * grp
    mat = jnp.concatenate(
        [
            x_local[None],
            y_local[None],
            attrs_sorted[2:],
            tile_sorted.astype(jnp.float32)[None],
            jnp.zeros((ATTR_ROWS - attrs_sorted.shape[0] - 1, f_cap),
                      jnp.float32),
        ],
        axis=0,
    )
    tail = jnp.zeros((ATTR_ROWS, mat_cols - f_cap), jnp.float32)
    tail = tail.at[TILE_ROW].set(float(t_total))
    mat = jnp.concatenate([mat, tail], axis=1)

    # Per-block window coordinates: src_base is monotone nondecreasing
    # with increments <= chunk (tile segments are contiguous in the
    # sorted stream), so a group's blocks always fit inside windows
    # [fl, fl+2) of width grp.
    src_base = jnp.clip(sched.src.reshape(-1, chunk)[:, 0], 0, f_cap)
    fl = (src_base[::group] // grp).astype(jnp.int32)
    off = jnp.clip(
        src_base - jnp.repeat(fl, group) * grp, 0, 2 * grp - chunk
    ).astype(jnp.int32)

    tiles = rasterize_tiles_fwd(
        mat, off, fl, sched.blk_flags, sched.live_blocks, chunk, t_total,
        bg, cutoff_sq, mode, group,
    )
    overflow = stream.overflow | sched.truncated
    out = (tiles, sched.tile_written, overflow)
    res = (mat, off, fl, sched.blk_flags, sched.live_blocks, tab_t,
           stream.num_fragments, tiles, overflow, xy, extent,
           depth, mask_f)
    return out, res


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10,
                                                    11, 12, 13, 14))
def _bin_rasterize(attr_cols, xy, extent, depth, mask_f,
                   tile_y_offset, tiles_x, tiles_y, f_cap, chunk,
                   bg, cutoff_sq, mode, pad_slack, r_cap):
    """Differentiable-in-``attr_cols`` binning + tiled rasterization.

    Forward: attributes ride the expansion kernel's one-hot MXU fetch and
    the tile sort's payload lanes, and the rasterizer reads the sorted
    stream in place through window pairs — no fragment-scale random
    gather or repack. Backward: the hand-derived kernel emits per-block
    gradients keyed by gaussian id; one payload sort + two Pallas one-hot
    window kernels (ops/segreduce.py) reduce them to the [9, N] table —
    replacing XLA's F-scale scatter-add (~350 ms) and the diff-of-cumsum
    tail's stack/cumsum/boundary-gathers (~55 ms) at bench shapes.
    """
    out, _ = _bin_rasterize_impl(attr_cols, xy, extent, depth, mask_f,
                                 tile_y_offset, tiles_x, tiles_y, f_cap,
                                 chunk, bg, cutoff_sq, mode, pad_slack,
                                 r_cap)
    return out


def _bin_rasterize_fwd(attr_cols, xy, extent, depth, mask_f,
                       tile_y_offset, tiles_x, tiles_y, f_cap, chunk,
                       bg, cutoff_sq, mode, pad_slack, r_cap):
    return _bin_rasterize_impl(attr_cols, xy, extent, depth, mask_f,
                               tile_y_offset, tiles_x, tiles_y, f_cap,
                               chunk, bg, cutoff_sq, mode, pad_slack, r_cap)


def _bin_rasterize_bwd(tile_y_offset, tiles_x, tiles_y, f_cap, chunk,
                       bg, cutoff_sq, mode, pad_slack, r_cap, residuals,
                       cots):
    (mat, off, fl, blk_flags, live_blocks, tab_t,
     num_frag, tiles_out, overflow, xy, extent, depth, mask_f) = residuals
    d_tiles = cots[0]  # other outputs are non-differentiable
    t_total = tiles_x * tiles_y

    dfrag = rasterize_tiles_bwd(
        mat, off, fl, blk_flags, live_blocks,
        tiles_out, d_tiles, chunk, t_total, bg, cutoff_sq, mode,
        DEFAULT_GROUP,
    )  # [16, F_pad]: rows 0-8 gradients, row 9 gid key (-1 invalid)

    f_pad = dfrag.shape[1]
    n = xy.shape[0]
    slot = jnp.arange(f_pad, dtype=jnp.int32)
    # Key build: invalid lanes (gid -1 on padding/dead blocks; NaN on the
    # dynamic grid's never-written tail — NaN compares false, landing in
    # the same branch) get keys past every real gaussian, so live lanes
    # sort gaussian-major up front. Gradient rows ride UNMASKED: dead
    # lanes sort behind every live fragment and can only reach the
    # segment reduction's final partial block, whose kernel NaN-scrubs
    # them (ops/segreduce.py) — this replaces ten XLA-side F_pad-scale
    # masking passes with one. Stability is NOT needed: the reduction
    # matches keys by equality, so only grouping matters.
    key = jnp.where(dfrag[9] >= 0, dfrag[9].astype(jnp.int32), n + slot)
    sorted_out = jax.lax.sort(
        (key,) + tuple(dfrag[i] for i in range(9)),
        num_keys=1,
        is_stable=False,
    )
    # The sorted gradient columns feed the Pallas segment reduction as
    # exact bf16 triples (ops/segreduce.split_grad_rows) with the keys as
    # a separate f32 stream — no [16, F_pad] f32 repack.
    dg_split = split_grad_rows(list(sorted_out[1:]))
    keys_f = sorted_out[0].astype(jnp.float32)
    from ..ops.expand import table_counts

    n_live = jnp.sum(table_counts(tab_t) > 0).astype(jnp.int32)
    gid_mono = gid_column_sorted(tab_t, n_live)
    d_comp = segment_sums_sorted(dg_split, keys_f, gid_mono, num_frag)
    d_full = uncompact_columns(d_comp, gid_mono, n)  # [16, N]
    # On fragment-capacity overflow the stream is truncated; the equality
    # match cannot misattribute (missing fragments just contribute
    # nothing), but the truncated forward image makes the step's
    # gradients an arbitrary subset — zero the table so an overflowing
    # step trains on nothing (render/train.py surfaces the flag).
    d_cols = jnp.where(overflow, 0.0, d_full[0:9])

    return (d_cols, jnp.zeros_like(xy), jnp.zeros_like(extent),
            jnp.zeros_like(depth), jnp.zeros_like(mask_f))


_bin_rasterize.defvjp(_bin_rasterize_fwd, _bin_rasterize_bwd)


def rasterize_splats(xy, depth, conic, extent, mask, rgb, opacity,
                     tiles_x: int, tiles_y: int, f_cap: int, chunk: int,
                     background: tuple, tile_y_offset=0,
                     cutoff_sq: float = 9.0, mode: int = 0,
                     pad_slack: float = 1.0, max_rows=None):
    """Projected splats -> [tiles_x*tiles_y, 256, 4] tile blocks.

    The shared middle of the pipeline (binning + gather + Pallas kernel),
    reused by the single-device and strip-sharded renderers.
    ``tile_y_offset`` selects a horizontal strip of the global tile grid.
    """
    # All the differentiable per-gaussian attributes the blend kernels
    # consume, attribute-major [9, N]; gradients flow back through
    # _bin_rasterize's custom vjp (sort + Pallas one-hot segment
    # reduction — no fragment-scale scatter-add).
    opac = opacity * mask  # culled gaussians contribute nothing
    attr_cols = jnp.concatenate(
        [xy.T, conic.T, rgb.T, opac[None, :]], axis=0
    )  # [9, N]

    tiles, tile_written, overflow = _bin_rasterize(
        attr_cols,
        jax.lax.stop_gradient(xy),
        jax.lax.stop_gradient(extent),
        jax.lax.stop_gradient(depth),
        mask.astype(jnp.float32),
        int(tile_y_offset),
        tiles_x, tiles_y, f_cap, chunk,
        tuple(background), float(cutoff_sq), int(mode), float(pad_slack),
        None if max_rows is None else int(max_rows),
    )
    # Empty tiles get no block (ops/binning.py), so their output blocks
    # are never written by the kernel (uninitialized memory, possibly NaN);
    # composite them to pure background here. jnp.where is a select, so the
    # garbage never propagates — forward or backward (non-selected
    # cotangents are dropped).
    nonempty = tile_written
    bg_block = jnp.concatenate(
        [
            jnp.full((1, 1, tiles.shape[2]), float(background[ch]),
                     tiles.dtype)
            for ch in range(3)
        ]
        + [jnp.ones((1, 1, tiles.shape[2]), tiles.dtype)],
        axis=1,
    )
    tiles = jnp.where(nonempty[:, None, None], tiles, bg_block)
    return tiles, overflow


def render_gaussians(
    gaussians: Any,
    camera: Camera,
    transform: GaussianTransform = GaussianTransform(),
    model_transform: Optional[ModelTransform] = None,
    background: tuple = (0.0, 0.0, 0.0),
    **kw,
) -> RenderResult:
    """High-level render of a :class:`GaussiansBuffer` / packed layout.

    Consumes the packed layout directly via the device unpack library —
    the analog of a downstream WESL shader importing gaussian_unpack_*
    (reference: src/shader/gaussian.wesl) — honoring the reference's
    GaussianTransform knobs (sh_deg, no_sh0).
    """
    if isinstance(gaussians, GaussiansBuffer):
        packed = gaussians.data
    elif isinstance(gaussians, PackedGaussians):
        packed = gaussians
    else:
        raise TypeError(
            "render_gaussians expects a GaussiansBuffer or PackedGaussians; "
            "convert a GaussianSoA with GaussiansBuffer.new first"
        )

    layout = packed.layout
    n = len(packed)
    cov3d6 = unpack_cov3d(
        jnp.asarray(packed.cov3d, jnp.float32)
        if layout.cov3d != Cov3dFormat.HALF
        else jnp.asarray(packed.cov3d),
        rot_scale=layout.cov3d == Cov3dFormat.ROT_SCALE,
    )
    color = unpack_color(jnp.asarray(packed.color))
    sh = unpack_sh(
        None if packed.sh is None else jnp.asarray(packed.sh), n
    )

    mt = None
    if model_transform is not None:
        mt = model_transform.as_arrays()

    return render(
        means=jnp.asarray(packed.pos),
        cov3d_sigma6=cov3d6,
        base_color=color[:, 0:3],
        opacity=color[:, 3],
        camera=camera,
        sh=None if packed.sh is None else sh,
        sh_deg=transform.sh_deg,
        no_sh0=transform.no_sh0,
        background=background,
        model_transform=mt,
        size=transform.size,
        max_std_dev=transform.max_std_dev,
        display_mode=transform.display_mode,
        **kw,
    )
