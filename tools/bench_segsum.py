"""Attribute the segment-sum kernel's per-block cost (ops/segreduce.py).

The round-5 backward-tail decomposition priced the segsum+uncompact chain
at ~19 ms (~2.4 us/block at F_pad=3.96M, K=512) — well above the naive
estimate (~0.2 us of MXU + ~0.55 us of [K,2K] one-hot compare). Stripped
variants over the same grid/specs attribute the gap:

  s0_stage   window staging + output store only (pipeline floor)
  s1_key     + key-column transpose (eye matmul at HIGHEST + round)
  s2_onehot  + the [K, 2K] equality one-hot build
  s3_matmul  + the [16, K] x [K, 2K] HIGHEST contraction + accumulate
  prod       the real segment_sums_sorted (adds window advance + flush
             DMAs + the in-kernel NaN scrub)
  prod_k256  the real kernel at SEG_BLOCK 256 (compare cost scales K^2,
             grid steps scale 1/K)

Usage: python tools/bench_segsum.py [--f-pad 3955712] [--iters 10]
"""

import argparse
import functools
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

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from wgpu_3dgs_core_tpu.ops.segreduce import (  # noqa: E402
    GRAD_ROWS,
    _eye,
    _gid_mat,
    segment_sums_sorted,
)

_HIGH = jax.lax.Precision.HIGHEST


def _mk_kernel(level, k):
    def kernel(w0_ref, total_ref, dg_ref, g0_ref, g1_ref, out_ref, acc_ref):
        b = pl.program_id(0)
        del w0_ref, total_ref

        @pl.when(b == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        dg = dg_ref[...]
        if level == 0:
            acc_ref[:, :k] += dg
            out_ref[...] = acc_ref[:, :k]
            return
        key_row = dg[9:10, :]
        key_col = jnp.round(
            jax.lax.dot_general(
                _eye(k), key_row, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HIGH,
            )
        )
        if level == 1:
            acc_ref[:, :k] += key_col.T
            out_ref[...] = acc_ref[:, :k]
            return
        gid_win = jnp.concatenate([g0_ref[0:1, :], g1_ref[0:1, :]], axis=1)
        oh = (key_col == gid_win).astype(jnp.float32)  # [K, 2K]
        if level == 2:
            acc_ref[...] += oh[0:GRAD_ROWS, 0:2 * k]
            out_ref[...] = acc_ref[:, :k]
            return
        acc_ref[...] += jax.lax.dot_general(
            dg, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HIGH,
        )
        out_ref[...] = acc_ref[:, :k]

    return kernel


def run_variant(level, k, n_blocks, w0, total32, dg16, gid_mat):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((GRAD_ROWS, k), lambda b, w0, tt: (0, b)),
            pl.BlockSpec((8, k), lambda b, w0, tt: (0, w0[b])),
            pl.BlockSpec((8, k), lambda b, w0, tt: (0, w0[b] + 1)),
        ],
        out_specs=pl.BlockSpec((GRAD_ROWS, k), lambda b, w0, tt: (0, 0)),
        scratch_shapes=[pltpu.VMEM((GRAD_ROWS, 2 * k), jnp.float32)],
    )
    return pl.pallas_call(
        _mk_kernel(level, k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((GRAD_ROWS, k), jnp.float32),
    )(w0, total32, dg16, gid_mat, gid_mat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f-pad", type=int, default=3_955_712)
    ap.add_argument("--gaussians", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    f_pad, n = args.f_pad, args.gaussians
    k = 512
    f_pad = -(-f_pad // k) * k
    n_blocks = f_pad // k
    n_pad = -(-n // k) * k + k

    rng = np.random.default_rng(0)
    # Sorted keys averaging ~n/f_pad advance per fragment (realistic).
    keys = np.sort(rng.integers(0, n, f_pad)).astype(np.float32)
    dg16 = jnp.asarray(
        np.concatenate(
            [
                rng.normal(size=(9, f_pad)).astype(np.float32),
                keys[None, :],
                np.zeros((6, f_pad), np.float32),
            ],
            axis=0,
        )
    )
    gid_mono = np.full(n_pad, float(1 << 24), np.float32)
    uniq = np.unique(keys)
    gid_mono[: len(uniq)] = uniq
    gid_mono = jnp.asarray(gid_mono)
    gid_mat = _gid_mat(gid_mono)

    first_key = dg16[9, ::k]
    r_first = (
        jnp.searchsorted(gid_mono, first_key, side="right").astype(jnp.int32)
        - 1
    )
    w0 = jnp.clip(r_first // k, 0, n_pad // k - 2).astype(jnp.int32)
    total32 = jnp.asarray([f_pad], jnp.int32)

    def timed(label, fn, fargs):
        out = fn(*fargs)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*fargs)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label:>10s}: {dt * 1e3:8.2f} ms "
              f"({dt * 1e6 / n_blocks:.3f} us/blk)", flush=True)
        return dt

    prev = None
    for level, name in enumerate(["s0_stage", "s1_key", "s2_onehot",
                                  "s3_matmul"]):
        fn = jax.jit(functools.partial(run_variant, level, k, n_blocks))
        dt = timed(name, fn, (w0, total32, dg16, gid_mat))
        if prev is not None:
            print(f"{'':>10s}  delta {(dt - prev) * 1e6 / n_blocks:+.3f} "
                  f"us/blk", flush=True)
        prev = dt

    from wgpu_3dgs_core_tpu.ops.segreduce import split_grad_rows

    @jax.jit
    def prod(dg16, gid_mono):
        dgs = split_grad_rows([dg16[i] for i in range(9)])
        out = segment_sums_sorted(dgs, dg16[9], gid_mono, jnp.int32(f_pad))
        return out[:, :, ::64].sum()

    timed("prod", prod, (dg16, gid_mono))

    @jax.jit
    def prod256(dg16, gid_mono):
        dgs = split_grad_rows([dg16[i] for i in range(9)])
        out = segment_sums_sorted(dgs, dg16[9], gid_mono,
                                  jnp.int32(f_pad), k=256)
        return out[:, :, ::64].sum()

    timed("prod_k256", prod256, (dg16, gid_mono))


if __name__ == "__main__":
    main()
