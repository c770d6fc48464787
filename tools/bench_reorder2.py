"""Second wave of reorder-strategy measurements on the TPU.

  blockgather      [16, F_cap] -> [16, B, K] via vmapped dynamic_slice at
                   per-block starts (the sorted->padded repack, if cheap
                   this replaces the random row gather entirely)
  uniqset9         permutation scatter (set, unique) of 9 cols at F
  segsum9          jax.ops.segment_sum of [F, 9] by gid (sorted ids)
  argsortN         depth argsort at N=1M (the old presort)
  cumsum9          cumsum of [F, 9] along F (segment-sum via diff-of-cumsum)
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
    p.add_argument("--chunk", type=int, default=128)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()
    f, n, k = args.fragments, args.gaussians, args.chunk
    b = f // k

    rng = np.random.default_rng(0)
    rows16 = jnp.asarray(rng.random((16, f), dtype=np.float32))
    rows9f = jnp.asarray(rng.random((f, 9), dtype=np.float32))
    src_base = jnp.asarray(
        np.sort(rng.integers(0, f - k, b)).astype(np.int32)
    )
    perm = jnp.asarray(rng.permutation(f).astype(np.int32))
    gid_sorted = jnp.asarray(np.sort(rng.integers(0, n, f)).astype(np.int32))
    depth = jnp.asarray(rng.random(n, dtype=np.float32))

    @jax.jit
    def blockgather(rows, starts):
        def slice_one(s):
            return jax.lax.dynamic_slice(rows, (0, s), (16, k))
        out = jax.vmap(slice_one)(starts)  # [B, 16, k]
        return out[::64].sum()

    @jax.jit
    def uniqset9(rows, perm):
        z = jnp.zeros((f, 9), jnp.float32)
        out = z.at[perm].set(rows, unique_indices=True, mode="drop")
        return out[::65536].sum()

    @jax.jit
    def segsum9(rows, gid):
        out = jax.ops.segment_sum(rows, gid, num_segments=n,
                                  indices_are_sorted=True)
        return out[::4096].sum()

    @jax.jit
    def argsortN(depth):
        return jnp.argsort(depth, stable=True)[::4096].sum()

    @jax.jit
    def cumsum9(rows):
        return jnp.cumsum(rows, axis=0)[::65536].sum()

    timed("blockgather [B,16,K] slices", blockgather, (rows16, src_base),
          args.iters)
    timed("unique perm-scatter set9", uniqset9, (rows9f, perm), args.iters)
    timed("segment_sum9 (sorted ids)", segsum9, (rows9f, gid_sorted),
          args.iters)
    timed("argsort N=1M", argsortN, (depth,), args.iters)
    timed("cumsum [F,9]", cumsum9, (rows9f,), args.iters)


if __name__ == "__main__":
    main()
