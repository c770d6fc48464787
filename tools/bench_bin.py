"""Decompose the binning chain's cost on the TPU.

Incremental probes over precomputed projection outputs (1M gaussians,
1080p), mirroring ops/binning.bin_splats_attrs's TWO-LEVEL production
path stage by stage (keep in sync with it — stale probes have burned
two rounds of attribution):
  counts    exact-support bounds + row-count/cumsum arithmetic (N-scale)
  tables    + per-gaussian depth-compacted tables (counts = span_y)
  rows      + level-1 row expansion + exact x-intervals + row tables
  expand    + the level-2 fused one-hot expansion kernel
  sort      + the 11-column 1-key tile payload sort (depth-presorted)
  ranges    + searchsorted tile ranges + pad_schedule + window coords
"""

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys

sys.path.insert(0, "/root/repo")

from bench import synthetic_scene  # noqa: E402
from wgpu_3dgs_core_tpu import Camera  # noqa: E402
from wgpu_3dgs_core_tpu.ops import binning  # noqa: E402
from wgpu_3dgs_core_tpu.ops.binning import num_tiles, pad_schedule  # noqa: E402
from wgpu_3dgs_core_tpu.ops.expand import (  # noqa: E402
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
from wgpu_3dgs_core_tpu.ops.projection import project  # noqa: E402


def timed(label, fn, args, iters=8):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:>10s}: {dt:9.2f} ms", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gaussians", type=int, default=1_000_000)
    p.add_argument("--max-fragments", type=int, default=2_957_312)
    p.add_argument("--max-rows", type=int, default=1_887_232)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()
    f_cap = args.max_fragments
    r_cap = args.max_rows
    chunk = 128

    cam = Camera.look_at(eye=(0.0, 0.0, -6.0), target=(0.0, 0.0, 0.0),
                         width=1920, height=1080, fov_y=0.9)
    tiles_x, tiles_y = num_tiles(1920, 1080)
    t_total = tiles_x * tiles_y
    means, cov6, color, opac, sh = synthetic_scene(args.gaussians)

    spl = jax.jit(lambda m, c, o: project(m, c, cam, opacity=o))(
        means, cov6, opac
    )
    xy = jax.device_put(np.asarray(spl.xy))
    extent = jax.device_put(np.asarray(spl.extent))
    depth = jax.device_put(np.asarray(spl.depth))
    mask = jax.device_put(np.asarray(spl.mask))
    conic = jax.device_put(np.asarray(spl.conic))
    table = jnp.concatenate(
        [xy, conic, color, (opac * mask)[:, None]], axis=1
    ).T  # [9, N]
    table = jax.device_put(np.asarray(table))
    n = args.gaussians

    def counts_fn(xy, extent, depth, mask, table):
        # Mirrors bin_splats_attrs: exact-support bounds, row counts.
        depth_key = jnp.where(mask, depth, jnp.inf)
        rx_ex, ry_ex = binning.exact_radii(
            (table[2], table[3], table[4]), table[8], 9.0, True
        )
        xb0, yb0, xb1, yb1 = binning.tile_bounds(
            xy, extent, tiles_x, tiles_y, 0
        )
        ex2 = jnp.stack([rx_ex, ry_ex], axis=-1)
        xe0, ye0, xe1, ye1 = binning.tile_bounds(
            xy, ex2, tiles_x, tiles_y, 0
        )
        x0 = jnp.clip(xe0, xb0, xb1)
        x1 = jnp.clip(xe1, x0, xb1)
        y0 = jnp.clip(ye0, yb0, yb1)
        y1 = jnp.clip(ye1, y0, yb1)
        span_x = jnp.maximum(x1 - x0, 0)
        span_y = jnp.maximum(y1 - y0, 0)
        live = mask & (extent[:, 0] > 0) & (extent[:, 1] > 0)
        row_counts = jnp.where(live & (span_x > 0), span_y, 0)
        total_rows = jnp.sum(row_counts)
        return depth_key, span_x, x0, y0, row_counts, total_rows, ry_ex

    @jax.jit
    def p_counts(xy, extent, depth, mask, table):
        out = counts_fn(xy, extent, depth, mask, table)
        return out[4][::4096].sum() + out[5]

    def tables_fn(xy, extent, depth, mask, table):
        depth_key, span_x, x0, y0, row_counts, total_rows, ry_ex = (
            counts_fn(xy, extent, depth, mask, table)
        )
        gid_src = jnp.arange(n, dtype=jnp.int32)
        attr10 = jnp.concatenate([table, ry_ex[None]], axis=0)
        tab, attr = build_tables(
            row_counts, span_x, x0, y0, gid_src, attr10, depth_key)
        return tab, attr, total_rows

    @jax.jit
    def p_tables(xy, extent, depth, mask, table):
        tab, attr, _ = tables_fn(xy, extent, depth, mask, table)
        return tab[:, ::4096].astype(jnp.float32).sum() \
            + attr[:, ::4096].astype(jnp.float32).sum()

    def rows_fn(xy, extent, depth, mask, table):
        tab, attr, total_rows = tables_fn(xy, extent, depth, mask, table)
        rows = expand_rows(tab, attr, total_rows, r_cap)
        slot_r = jnp.arange(r_cap, dtype=jnp.int32)
        live_r = slot_r < jnp.minimum(total_rows, r_cap)
        rows = jnp.where(live_r[None, :], rows, 0.0)
        tx0_r, cnt_r = binning._row_tile_span(
            rows[ROWS_X0], rows[ROWS_ROW], rows[ROWS_SPANX], rows[ROWS_RY],
            rows[ROWS_ATTR0], rows[ROWS_ATTR0 + 1], rows[ROWS_ATTR0 + 2],
            rows[ROWS_ATTR0 + 3], rows[ROWS_ATTR0 + 4], 0,
        )
        cnt_r = jnp.where(live_r, cnt_r, 0)
        off_r = jnp.cumsum(cnt_r) - cnt_r
        total = (off_r[-1] + cnt_r[-1]).astype(jnp.int32)
        tab2, attr2 = build_row_tables(
            off_r, cnt_r, tx0_r, rows[ROWS_ROW], rows[ROWS_GID],
            rows[ROWS_ATTR0:ROWS_ATTR0 + 9], live_r,
        )
        return tab2, attr2, total

    @jax.jit
    def p_rows(xy, extent, depth, mask, table):
        tab2, attr2, total = rows_fn(xy, extent, depth, mask, table)
        return tab2[:, ::4096].astype(jnp.float32).sum() \
            + attr2[:, ::4096].astype(jnp.float32).sum() + total

    def expand_fn(xy, extent, depth, mask, table):
        tab2, attr2, total = rows_fn(xy, extent, depth, mask, table)
        tile, gid, fetched = expand_fragments_with_attrs(
            tab2, attr2, total, f_cap, tiles_x, t_total)
        # Live-tail mask, exactly as ops/binning.bin_splats_attrs: the
        # live-bound grid leaves slots past ``total`` unwritten on
        # hardware (ADVICE r4: probes must not time garbage keys).
        slot = jnp.arange(f_cap, dtype=jnp.int32)
        livem = slot < total
        tile = jnp.where(livem, tile, t_total)
        fetched = jnp.where(livem[None, :], fetched, 0.0)
        return tile, fetched, total

    @jax.jit
    def p_expand(xy, extent, depth, mask, table):
        tile, fetched, _ = expand_fn(xy, extent, depth, mask, table)
        return tile[::65536].sum() + fetched[:, ::65536].sum()

    def upto_sort(xy, extent, depth, mask, table):
        tile, fetched, total = expand_fn(xy, extent, depth, mask, table)
        payloads = [fetched[i] for i in range(10)]  # 9 attrs + gid row
        out = jax.lax.sort((tile, *payloads), num_keys=1, is_stable=True)
        return out, total

    @jax.jit
    def p_sort(xy, extent, depth, mask, table):
        out, _ = upto_sort(xy, extent, depth, mask, table)
        # Force EVERY sort output: XLA's sort simplifier drops unused
        # payload operands, which silently under-measured the payload-
        # carrying cost by ~3x (round-4 finding).
        return sum(c[::65536].sum().astype(jnp.float32) for c in out)

    @jax.jit
    def p_ranges(xy, extent, depth, mask, table):
        out, total = upto_sort(xy, extent, depth, mask, table)
        tile_sorted = out[0]
        tile_ids = jnp.arange(t_total, dtype=jnp.int32)
        ts = jnp.searchsorted(tile_sorted, tile_ids, side="left")
        te = jnp.searchsorted(tile_sorted, tile_ids, side="right")
        st = binning.FragmentStream(
            gauss_id=out[10].astype(jnp.int32), tile_id=tile_sorted,
            num_fragments=jnp.minimum(total, f_cap).astype(jnp.int32),
            overflow=total > f_cap,
            tile_start=ts.astype(jnp.int32), tile_end=te.astype(jnp.int32),
        )
        grp = chunk * 8
        f_pad = -(-(f_cap + int(t_total * chunk * 0.65)) // grp) * grp
        sc = pad_schedule(st, chunk, f_pad)
        # Force the payload columns too (see p_sort).
        pay = sum(c[::65536].sum().astype(jnp.float32) for c in out)
        return sc.blk_tile[::4096].sum().astype(jnp.float32) \
            + sc.live_blocks.sum() + pay

    a = (xy, extent, depth, mask, table)
    timed("counts", p_counts, a, args.iters)
    timed("tables", p_tables, a, args.iters)
    timed("rows", p_rows, a, args.iters)
    timed("expand", p_expand, a, args.iters)
    timed("sort", p_sort, a, args.iters)
    timed("ranges", p_ranges, a, args.iters)


if __name__ == "__main__":
    main()
