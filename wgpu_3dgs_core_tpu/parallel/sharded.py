"""Sharded differentiable rendering over a device mesh.

The north-star parallel design (SURVEY.md §2.3, §7 M6), the analog of
sequence-parallel attention for the gaussian axis:

- **Gaussians sharded** over the ``data`` axis: each device projects and
  colors only its shard (projection is elementwise — perfect scaling).
- **Splat exchange**: projected screen-space splats (~14 f32/gaussian —
  far smaller than the raw parameters + SH) are ``all_gather``-ed over ICI.
- **Tiles strip-partitioned**: each device bins + rasterizes a horizontal
  strip of tile rows from the full splat set — the binning sort shrinks to
  1/D per device.
- **Gradients**: autodiff through shard_map. The all_gather transposes to
  a reduce-scatter (psum_scatter) of splat gradients back to each shard —
  XLA overlaps it with the backward sweep; no hand-written NCCL analog.

The image comes back replicated ([H, W, 3]); losses computed on it
differentiate straight through.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.binning import TILE_SIZE, default_max_fragments, num_tiles
from ..ops.projection import project
from ..ops.rasterize import tiles_to_image
from ..ops.sh import gaussian_color
from ..render.camera import Camera
from ..render.renderer import DEFAULT_CHUNK, RenderResult, rasterize_splats
from .mesh import DATA_AXIS


def _strip_rows(tiles_y: int, n_dev: int) -> int:
    return -(-tiles_y // n_dev)


def render_sharded(
    means: jnp.ndarray,
    cov3d_sigma6: jnp.ndarray,
    base_color: jnp.ndarray,
    opacity: jnp.ndarray,
    camera: Camera,
    mesh,
    sh: Optional[jnp.ndarray] = None,
    sh_deg: int = 0,
    no_sh0: bool = False,
    background: tuple = (0.0, 0.0, 0.0),
    max_fragments: Optional[int] = None,
    chunk: int = DEFAULT_CHUNK,
    antialiased: bool = False,
    strip_skew: float = 2.0,
) -> RenderResult:
    """Differentiable multi-device render.

    Inputs are sharded on their leading (gaussian) axis over ``mesh``'s
    ``data`` axis; N must divide evenly by the axis size (use
    ``parallel.mesh.pad_to_multiple`` with zero-opacity padding gaussians).
    Returns a replicated RenderResult.

    ``max_fragments`` is the GLOBAL fragment budget; each device gets a
    strip-local capacity of ``max_fragments / n_dev * strip_skew`` (the
    skew factor absorbs uneven fragment concentration across strips).
    Capacity-proportional work — the attribute gather, the strip sort, the
    kernel grids — therefore shrinks with the device count instead of
    replicating (SURVEY.md §7 M6 scaling economics).
    """
    n_dev = mesh.shape[DATA_AXIS]
    h, w_px = camera.height, camera.width
    tiles_x, tiles_y = num_tiles(w_px, h)
    rows_per_dev = _strip_rows(tiles_y, n_dev)
    n = means.shape[0]

    if max_fragments is None:
        max_fragments = default_max_fragments(n, tiles_x, tiles_y)
    if n_dev > 1:
        max_fragments = int(max_fragments * strip_skew / n_dev)
    f_cap = -(-max_fragments // chunk) * chunk

    bg = tuple(background)
    use_sh = sh is not None

    view = camera.view_matrix()
    cam_pos = -jnp.einsum("ji,j->i", view[:3, :3], view[:3, 3],
                          precision=jax.lax.Precision.HIGHEST)

    in_specs = (
        P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
        P(DATA_AXIS) if use_sh else P(),
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(means_l, cov_l, color_l, opac_l, sh_l):
        # Local projection + color of this device's gaussian shard.
        splats = project(means_l, cov_l, camera, antialiased=antialiased,
                         opacity=opac_l)
        opac_l = opac_l * splats.compensation
        dirs = means_l - cam_pos
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
        rgb_l = gaussian_color(
            color_l, sh_l if use_sh else None, dirs, sh_deg, no_sh0
        )

        # Exchange compact projected splats over ICI: [N_local, 14] each ->
        # [N, 14] everywhere. Transposes to a reduce-scatter in backward.
        packed = jnp.concatenate(
            [
                splats.xy,
                splats.conic,
                rgb_l,
                (opac_l * splats.mask)[:, None],
                splats.depth[:, None],
                splats.extent,
                splats.mask.astype(jnp.float32)[:, None],
            ],
            axis=-1,
        )
        packed = jax.lax.all_gather(packed, DATA_AXIS, axis=0, tiled=True)

        xy = packed[:, 0:2]
        conic = packed[:, 2:5]
        rgb = packed[:, 5:8]
        opac = packed[:, 8]
        depth = packed[:, 9]
        extent = packed[:, 10:12]
        mask = packed[:, 12] > 0.5

        # Rasterize this device's strip of tile rows: shift splats into
        # strip-local pixel space (the kernel derives pixel coordinates
        # from local tile ids; a 2D gaussian is translation-invariant).
        d = jax.lax.axis_index(DATA_AXIS)
        y_shift = (d * rows_per_dev * TILE_SIZE).astype(jnp.float32)
        xy_local = xy - jnp.stack(
            [jnp.zeros_like(y_shift), y_shift]
        )[None, :]
        tiles, overflow = rasterize_splats(
            xy_local, depth, conic, extent, mask, rgb, opac,
            tiles_x, rows_per_dev, f_cap, chunk, bg,
        )

        strips = jax.lax.all_gather(tiles, DATA_AXIS, axis=0, tiled=True)
        any_overflow = jax.lax.psum(overflow.astype(jnp.int32), DATA_AXIS) > 0
        return strips, any_overflow

    strips, overflow = step(
        means, cov3d_sigma6, base_color, opacity,
        sh if use_sh else jnp.zeros((1, 15, 3), jnp.float32),
    )
    img = tiles_to_image(
        strips, tiles_x, rows_per_dev * n_dev, w_px, h
    )
    return RenderResult(
        image=img[..., 0:3], transmittance=img[..., 3], overflow=overflow
    )
