"""The full differentiable renderer: projection -> binning -> tiles -> image.

Renderer extension (SURVEY.md §7 M4/M5). ``render`` is the low-level
array-in/image-out function (jittable, differentiable w.r.t. every gaussian
parameter); ``render_gaussians`` is the high-level entry taking a
:class:`GaussiansBuffer`/packed layout plus the reference-style
GaussianTransform/ModelTransform knobs.
"""

from __future__ import annotations

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
    bin_splats,
    default_max_fragments,
    num_tiles,
    pad_schedule,
)
from ..ops.projection import project
from ..ops.rasterize import (
    ATTR_ROWS,
    DEFAULT_GROUP,
    rasterize_tiles,
    tiles_to_image,
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
) -> RenderResult:
    """Differentiable tiled render to [H, W, 3].

    ``means`` [N,3], ``cov3d_sigma6`` [N,6], ``base_color`` [N,3] in [0,1],
    ``opacity`` [N] in [0,1], optional ``sh`` [N,15,3].
    ``size``/``max_std_dev``/``display_mode`` implement the reference's
    GaussianTransform knobs (reference: src/buffer/gaussian_transform.rs).
    """
    h, w_px = camera.height, camera.width
    tiles_x, tiles_y = num_tiles(w_px, h)
    t_total = tiles_x * tiles_y
    n = means.shape[0]

    if max_fragments is None:
        max_fragments = default_max_fragments(n, tiles_x, tiles_y)
    # Stream capacity must be whole chunks.
    f_cap = -(-max_fragments // chunk) * chunk

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
            extent=jnp.where(
                splats.mask[:, None], jnp.ceil(max_std_dev * pt), 0.0
            ),
        )

    view = camera.view_matrix()
    cam_pos = -jnp.einsum("ji,j->i", view[:3, :3], view[:3, 3],
                          precision=jax.lax.Precision.HIGHEST)
    dirs = means - cam_pos
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
    rgb = gaussian_color(base_color, sh, dirs, sh_deg, no_sh0)

    tiles, overflow = rasterize_splats(
        splats.xy, splats.depth, splats.conic, splats.extent, splats.mask,
        rgb, opacity, tiles_x, tiles_y, f_cap, chunk, tuple(background),
        cutoff_sq=float(max_std_dev) ** 2, mode=int(display_mode),
    )
    img = tiles_to_image(tiles, tiles_x, tiles_y, w_px, h)
    return RenderResult(
        image=img[..., 0:3],
        transmittance=img[..., 3],
        overflow=overflow,
    )


def rasterize_splats(xy, depth, conic, extent, mask, rgb, opacity,
                     tiles_x: int, tiles_y: int, f_cap: int, chunk: int,
                     background: tuple, tile_y_offset=0,
                     cutoff_sq: float = 9.0, mode: int = 0):
    """Projected splats -> [tiles_x*tiles_y, 256, 4] tile blocks.

    The shared middle of the pipeline (binning + gather + Pallas kernel),
    reused by the single-device and strip-sharded renderers.
    ``tile_y_offset`` selects a horizontal strip of the global tile grid.
    """
    t_total = tiles_x * tiles_y
    # Tile padding adds at most one partial chunk per tile, so this cap
    # never truncates a stream that fit f_cap (ops/binning.py); rounded to
    # the rasterizer's group granularity.
    grp = chunk * DEFAULT_GROUP
    f_pad_cap = -(-(f_cap + t_total * chunk) // grp) * grp

    stream = bin_splats(
        xy, extent, depth, mask, tiles_x, tiles_y, f_cap, tile_y_offset
    )
    sched = pad_schedule(stream, chunk, f_pad_cap)

    # Differentiable gather into the attribute-major padded fragment
    # stream: one fused row gather of a per-gaussian attribute table (nine
    # separate scalar gathers at fragment scale are several times slower
    # on TPU).
    gid = stream.gauss_id[jnp.clip(sched.src, 0, f_cap - 1)]
    opac = opacity * mask  # culled gaussians contribute nothing
    attr_table = jnp.concatenate(
        [xy, conic, rgb, opac[:, None]], axis=1
    )  # [N, 9]
    rows = attr_table[gid].T  # [9, F_pad]
    # Padding slots gather a clamped index, and dead blocks (beyond the
    # live count) are never visited by the backward kernel, leaving
    # uninitialized (possibly NaN) cotangents. jnp.where's transpose is a
    # select, so padding cotangents are dropped outright (a multiply would
    # keep NaN: 0 * NaN = NaN) before they scatter-add into gradients.
    rows = jnp.where(sched.valid[None, :], rows, 0.0)
    # Pad to 16 attribute rows: Mosaic DMA slices must be sublane-tile
    # aligned (multiples of 8; 16 keeps headroom for future attributes).
    rows = jnp.concatenate(
        [rows, jnp.zeros((ATTR_ROWS - rows.shape[0], f_pad_cap), rows.dtype)]
    )

    tiles = rasterize_tiles(
        rows,
        sched.blk_tile,
        sched.pad_off,
        sched.tile_len,
        sched.live_blocks,
        chunk,
        tiles_x,
        t_total,
        tuple(background),
        cutoff_sq,
        mode,
    )
    # Empty tiles get no block (ops/binning.py), so their output blocks
    # are never written by the kernel (uninitialized memory, possibly NaN);
    # composite them to pure background here. jnp.where is a select, so the
    # garbage never propagates — forward or backward (non-selected
    # cotangents are dropped).
    nonempty = sched.tile_written
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
    return tiles, stream.overflow


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
