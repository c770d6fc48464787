"""Decompose the binning chain's cost on the TPU.

Incremental probes over precomputed projection outputs (1M gaussians,
1080p, 4.2M-fragment cap):
  counts    bbox/count/cumsum arithmetic (N-scale)
  tables    + segment/attr table compaction scatters
  expand    + the fused one-hot expansion kernel
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
    build_tables,
    expand_fragments_with_attrs,
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
    p.add_argument("--max-fragments", type=int, default=3_276_800)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()
    f_cap = args.max_fragments
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

    def counts_fn(xy, extent, depth, mask):
        depth_key = jnp.where(mask, depth, jnp.inf)
        x0, y0, x1, y1 = binning.tile_bounds(xy, extent, tiles_x, tiles_y, 0)
        span_x = jnp.maximum(x1 - x0, 0)
        span_y = jnp.maximum(y1 - y0, 0)
        live = mask & (extent[:, 0] > 0) & (extent[:, 1] > 0)
        counts = jnp.where(live, span_x * span_y, 0)
        offsets = jnp.cumsum(counts) - counts
        total = offsets[-1] + counts[-1]
        return depth_key, span_x, x0, y0, counts, offsets, total

    @jax.jit
    def p_counts(xy, extent, depth, mask):
        out = counts_fn(xy, extent, depth, mask)
        return out[4][::4096].sum() + out[6]

    @jax.jit
    def p_tables(xy, extent, depth, mask, table):
        depth_key, span_x, x0, y0, counts, offsets, total = counts_fn(
            xy, extent, depth, mask)
        gid_src = jnp.arange(n, dtype=jnp.int32)
        tab, attr = build_tables(
            counts, span_x, x0, y0, gid_src, table, depth_key)
        return tab[:, ::4096].astype(jnp.float32).sum() \
            + attr[:, ::4096].astype(jnp.float32).sum()

    @jax.jit
    def p_expand(xy, extent, depth, mask, table):
        depth_key, span_x, x0, y0, counts, offsets, total = counts_fn(
            xy, extent, depth, mask)
        gid_src = jnp.arange(n, dtype=jnp.int32)
        tab, attr = build_tables(
            counts, span_x, x0, y0, gid_src, table, depth_key)
        tile, gid, fetched = expand_fragments_with_attrs(
            tab, attr, total, f_cap, tiles_x, t_total)
        # Live-tail mask, exactly as ops/binning.bin_splats_attrs: the
        # live-bound grid leaves slots past ``total`` unwritten on
        # hardware (ADVICE r4: probes must not time garbage keys).
        slot = jnp.arange(f_cap, dtype=jnp.int32)
        livem = slot < total
        tile = jnp.where(livem, tile, t_total)
        fetched = jnp.where(livem[None, :], fetched, 0.0)
        return tile[::65536].sum() + fetched[:, ::65536].sum()

    def upto_sort(xy, extent, depth, mask, table):
        depth_key, span_x, x0, y0, counts, offsets, total = counts_fn(
            xy, extent, depth, mask)
        gid_src = jnp.arange(n, dtype=jnp.int32)
        tab, attr = build_tables(
            counts, span_x, x0, y0, gid_src, table, depth_key)
        tile, gid, fetched = expand_fragments_with_attrs(
            tab, attr, total, f_cap, tiles_x, t_total)
        # Live-tail mask, exactly as ops/binning.bin_splats_attrs: the
        # live-bound grid leaves slots past ``total`` unwritten on
        # hardware (ADVICE r4: probes must not time garbage keys).
        slot = jnp.arange(f_cap, dtype=jnp.int32)
        livem = slot < total
        tile = jnp.where(livem, tile, t_total)
        fetched = jnp.where(livem[None, :], fetched, 0.0)
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
        f_pad = -(-(f_cap + t_total * chunk) // grp) * grp
        sc = pad_schedule(st, chunk, f_pad)
        # Force the payload columns too (see p_sort).
        pay = sum(c[::65536].sum().astype(jnp.float32) for c in out)
        return sc.blk_tile[::4096].sum().astype(jnp.float32) \
            + sc.live_blocks.sum() + pay

    a = (xy, extent, depth, mask)
    timed("counts", p_counts, a, args.iters)
    timed("tables", p_tables, (*a, table), args.iters)
    timed("expand", p_expand, (*a, table), args.iters)
    timed("sort", p_sort, (*a, table), args.iters)
    timed("ranges", p_ranges, (*a, table), args.iters)


if __name__ == "__main__":
    main()
