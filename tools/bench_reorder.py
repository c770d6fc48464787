"""Measure fragment-reorder strategies on the TPU.

The rasterizer needs per-fragment attributes in (tile, depth) order. Two
candidate data movements:
  A. sort (tile, depth, gid) then gather attr_table[gid] rows  (current)
  B. carry the 9 attribute columns through the sort as payloads

This times, at the bench's fragment capacity:
  - lax.sort with 1..10 f32 payloads
  - row gather [F, 9] / [F, 16] from [N, k]
  - 1-column int32 gather at F
  - scatter-add [F, 9] -> [N, 9] (the gather's backward)

Timing per CLAUDE.md: sync via np.asarray, enqueue K calls, one process.
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
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:>34s}: {dt:9.2f} ms", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fragments", type=int, default=4_194_304)
    p.add_argument("--gaussians", type=int, default=1_000_000)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()
    f, n = args.fragments, args.gaussians

    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 8160, f, dtype=np.int32))
    depth = jnp.asarray(rng.random(f, dtype=np.float32))
    gid = jnp.asarray(rng.integers(0, n, f, dtype=np.int32))
    table = jnp.asarray(rng.random((n, 16), dtype=np.float32))
    cols = [jnp.asarray(rng.random(f, dtype=np.float32)) for _ in range(10)]
    rows9 = jnp.asarray(rng.random((16, f), dtype=np.float32))

    for m in (1, 3, 6, 10):
        @jax.jit
        def sortm(key, depth, *pl):
            out = jax.lax.sort((key, depth) + pl, num_keys=2, is_stable=True)
            return out[0][::65536].sum() + out[-1][::65536].sum()

        timed(f"sort2 + {m} f32 payloads", sortm, (key, depth, *cols[:m]),
              args.iters)

    @jax.jit
    def gather9(gid, table):
        return table[gid, :9].T[::4, ::65536].sum()

    @jax.jit
    def gather9_t(gid, table):
        # attribute-major output, as the renderer builds it
        r = table[gid, :9].T
        return r[:, ::65536].sum()

    @jax.jit
    def gather16(gid, table):
        return table[gid].T[:, ::65536].sum()

    @jax.jit
    def gather1(gid, depth):
        return depth[gid][::65536].sum()

    @jax.jit
    def scat_add9(gid, rows):
        z = jnp.zeros((n, 9), jnp.float32)
        return z.at[gid].add(rows[:9].T)[::4096].sum()

    timed("rowgather [F,9]", gather9, (gid, table), args.iters)
    timed("rowgather [F,9] -> [9,F]", gather9_t, (gid, table), args.iters)
    timed("rowgather [F,16] -> [16,F]", gather16, (gid, table), args.iters)
    timed("int gather 1 col", gather1, (gid, depth), args.iters)
    timed("scatter-add9 [F]->[N,9]", scat_add9, (gid, rows9), args.iters)


if __name__ == "__main__":
    main()
