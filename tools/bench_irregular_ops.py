"""Microbenchmark the fragment-scale irregular XLA ops on the real TPU.

Times each candidate op at the bench fragment scale, to decide which
binning restructurings pay (PERF_NOTES.md items 1/2/7):
  sort2     - lax.sort (key int32 + payload int32), the current tile sort
  sort1     - lax.sort key-only
  scatter   - zeros(F).at[perm].set(iota) (permutation inversion candidate)
  gather_t  - small-table gather tile_start[tile] at F scale
  rowgather - attr_table[N,9][gid] row gather + transpose (raster prep)
  scan_max  - associative_scan(maximum) at F (old owner search)
  ss2       - 2x searchsorted(F-sorted, 8160) (tile ranges)

Timing per CLAUDE.md: enqueue iters, sync once via np.asarray.
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


def timed(label, fn, args, iters=8):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:>12s}: {dt:9.2f} ms", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--f", type=int, default=3_145_728)
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--tiles", type=int, default=8160)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()
    f, n, t = args.f, args.n, args.tiles

    rng = np.random.default_rng(0)
    tile = jnp.asarray(np.sort(rng.integers(0, t, f)).astype(np.int32))
    gid = jnp.asarray(rng.integers(0, n, f).astype(np.int32))
    perm = jnp.asarray(rng.permutation(f).astype(np.int32))
    attr = jnp.asarray(rng.random((n, 9)).astype(np.float32))
    tstart = jnp.asarray(np.arange(t, dtype=np.int32))
    keys_u = jnp.asarray(rng.integers(0, t, f).astype(np.int32))

    print(f"devices: {jax.devices()}  F={f} N={n}", flush=True)

    timed("sort2", jax.jit(lambda k, v: jax.lax.sort(
        (k, v), num_keys=1, is_stable=True)), (keys_u, gid), args.iters)
    timed("sort1", jax.jit(lambda k: jax.lax.sort(
        (k,), num_keys=1, is_stable=True)), (keys_u,), args.iters)
    timed("scatter", jax.jit(lambda p_: jnp.zeros(f, jnp.int32).at[p_].set(
        jnp.arange(f, dtype=jnp.int32), unique_indices=True)), (perm,),
        args.iters)
    timed("gather_t", jax.jit(lambda ts, ti: ts[ti]), (tstart, tile),
          args.iters)
    timed("rowgather", jax.jit(lambda a, g: a[g].T), (attr, gid), args.iters)
    drows = jnp.asarray(rng.random((f, 9)).astype(np.float32))
    wide = jnp.asarray(rng.random((f, 16)).astype(np.float32))
    # the actual bwd attr-gradient op: colliding row scatter-add into [N,9]
    timed("scat_add9", jax.jit(lambda d, g: jnp.zeros(
        (n, 9), jnp.float32).at[g].add(d)), (drows, gid), args.iters)
    # fused-placement candidate: unique row scatter-set of [F,16] + transpose
    timed("scat_set16", jax.jit(lambda v, p_: jnp.zeros(
        (f, 16), jnp.float32).at[p_].set(v, unique_indices=True).T),
        (wide, perm), args.iters)
    # permutation row-gather of the wide cotangent (bwd of fused placement)
    timed("rowgath16", jax.jit(lambda v, p_: v[p_]), (wide, perm),
          args.iters)
    timed("gather_f", jax.jit(lambda g, p_: g[p_]), (gid, perm), args.iters)
    timed("scan_max", jax.jit(lambda x: jax.lax.associative_scan(
        jnp.maximum, x)), (gid,), args.iters)
    timed("ss2", jax.jit(lambda s, q: (
        jnp.searchsorted(s, q, side="left"),
        jnp.searchsorted(s, q, side="right"))), (tile, tstart), args.iters)


if __name__ == "__main__":
    main()
