"""Isolate the fwd-kernel per-block cost drivers on the real TPU.

The round-3/4 question: after the branch-free rewrite, where does the
~0.7-0.9 us/block go? Candidates: the dynamic-rotate carve, the 6-deep
q basis matmul (contraction dim pads to the MXU tile), the 2-pass
cumsum tri-matmuls, the color-accumulate matmul, and per-step pipeline
overhead. This tool times stripped-down kernels over the SAME grid and
window inputs, each adding one ingredient, so consecutive deltas
attribute the cost.

Variants (cumulative; 4+ use the production VPU q):
  v0_dma          windows staged to VMEM only (pipeline + staging floor)
  v1_carve        + 8 dynamic-rotate block carves
  v2_alpha_vpu    + alpha via VPU polynomial evaluation (no q matmul)
  v3_alpha_mxu    alpha via the [256,6]@[6,K] MXU basis matmul instead
  v4_cumsum       + per-block 2-pass bf16 cumsum tri-matmuls
  v5_cumsum_b     batched cumsum: one sublane-stacked tri-matmul
  v6_full_mxuacc  + exp/T update, historical MXU color-accumulate
  v7_full_vpu     production mirror (VPU lane-sum3 color accumulate)
  v8_notrans      v7 with exp/log1p replaced by same-shape arithmetic
                  (delta 7-8 = the transcendental chain's true cost)
  v9_nosum        v7 with lane reductions replaced by slices
                  (delta 7-9 = the per-pixel lane-tree reduction cost)

Usage: python tools/bench_kernel_variants.py [--blocks 40960] [--iters 20]
"""

import argparse
import functools
import json
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

from wgpu_3dgs_core_tpu.ops.rasterize import (  # noqa: E402
    ATTR_ROWS,
    PIX,
    TILE_SIZE,
    _load_block,
    _tri,
    _window_specs,
)


def _pixel_basis(chunk):
    # Historical [PIX, 6] monomial basis (kept here for the v3 MXU-vs-VPU
    # probe after the kernels moved to direct VPU evaluation).
    p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (p % TILE_SIZE).astype(jnp.float32) + 0.5
    py = (p // TILE_SIZE).astype(jnp.float32) + 0.5
    return jnp.concatenate(
        [jnp.ones_like(px), px, py, px * px, px * py, py * py], axis=1
    )

_HIGH = jax.lax.Precision.HIGHEST
CHUNK = 128
GROUP = 8


def _carve(win_buf, off_ref, base):
    return [
        _load_block(win_buf, off_ref[base + j], CHUNK) for j in range(GROUP)
    ]


def _coef(frag):
    x_l = frag[0:1, :]
    y_l = frag[1:2, :]
    c0 = frag[2:3, :]
    c1 = frag[3:4, :]
    c2 = frag[4:5, :]
    return jnp.concatenate(
        [
            c0 * x_l * x_l + 2.0 * c1 * x_l * y_l + c2 * y_l * y_l,
            -2.0 * (c0 * x_l + c1 * y_l),
            -2.0 * (c2 * y_l + c1 * x_l),
            c0,
            2.0 * c1,
            c2,
        ],
        axis=0,
    )


def _q_mxu(frag):
    return jnp.dot(_pixel_basis(CHUNK), _coef(frag),
                   preferred_element_type=jnp.float32, precision=_HIGH)


def _q_vpu(frag):
    coef = _coef(frag)  # [6, K]
    basis = _pixel_basis(CHUNK)  # [PIX, 6]
    q = coef[0:1, :]
    for t in range(1, 6):
        q = q + basis[:, t:t + 1] * coef[t:t + 1, :]
    return q


def _alpha(frag, q):
    op = frag[8:9, :]
    a = jnp.minimum(op * jnp.exp(-0.5 * q), 0.99)
    return jnp.where((q <= 9.0) & (a >= 1.0 / 255.0), a, 0.0)


def _tri_dot2(x, tri16):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (
        jnp.dot(hi, tri16, preferred_element_type=jnp.float32)
        + jnp.dot(lo, tri16, preferred_element_type=jnp.float32)
    )


def _mk_kernel(level):
    def kernel(live_ref, flags_ref, off_ref, fl_ref, lo_ref, hi_ref,
               out_ref, state_ref, win_buf):
        g = pl.program_id(0)
        base = g * GROUP
        win_buf[:, : GROUP * CHUNK] = lo_ref[...]
        win_buf[:, GROUP * CHUNK: 2 * GROUP * CHUNK] = hi_ref[...]
        if level == 0:
            out_ref[0:1, :] = win_buf[0:1, :CHUNK]
            return
        frags = _carve(win_buf, off_ref, base)
        if level == 1:
            acc = functools.reduce(
                jax.lax.add, [f[0:1, :] for f in frags]
            )
            out_ref[0:1, :] = acc
            return
        tri16 = _tri(CHUNK, True).astype(jnp.bfloat16)
        alphas = []
        for f in frags:
            q = _q_mxu(f) if level == 3 else _q_vpu(f)
            if level == 8:
                op = f[8:9, :]
                a = jnp.minimum(op * (1.0 - 0.5 * q), 0.99)
                a = jnp.where((q <= 9.0) & (a >= 1.0 / 255.0), a, 0.0)
                alphas.append(a)
            else:
                alphas.append(_alpha(f, q))
        if level in (2, 3):
            acc = functools.reduce(jax.lax.add, alphas)
            out_ref[...] = acc[0:8, :]
            return
        if level == 8:
            log1m = [-a for a in alphas]
        else:
            log1m = [jnp.log1p(-a) for a in alphas]
        if level == 4:
            ecs = [_tri_dot2(x, tri16) for x in log1m]
        else:
            allx = jnp.concatenate(log1m, axis=0)  # [GROUP*PIX, K]
            e = _tri_dot2(allx, tri16)
            ecs = [e[j * PIX:(j + 1) * PIX] for j in range(GROUP)]
        if level in (4, 5):
            acc = functools.reduce(jax.lax.add, ecs)
            out_ref[...] = acc[0:8, :]
            return
        # levels 6-9: full fwd math minus flush DMAs.
        #   6: historical MXU color-accumulate form (kept for deltas)
        #   7: production mirror — VPU lane-sum3 color accumulate
        #   8: production minus transcendentals (exp/log1p -> cheap
        #      arithmetic of the same shape) — the delta 7-8 prices the
        #      transcendental chain
        #   9: production minus the lane reductions (slices keep shapes)
        #      — the delta 7-9 prices the per-pixel lane-tree sums
        for j in range(GROUP):
            t_run = state_ref[:, 3:4]
            if level == 8:
                t_i = t_run * (1.0 + 0.5 * ecs[j])
            else:
                t_i = t_run * jnp.exp(ecs[j])
            blend = t_i > 1e-4
            wgt = jnp.where(blend, alphas[j] * t_i, 0.0)
            c_rows = frags[j][5:8, :]
            if level == 6:
                state_ref[:, 0:3] += jax.lax.dot_general(
                    wgt, c_rows, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HIGH,
                )
            elif level == 9:
                state_ref[:, 0:3] += jnp.concatenate(
                    [(wgt * c_rows[ch:ch + 1, :])[:, 0:1] for ch in range(3)],
                    axis=1,
                )
            else:
                state_ref[:, 0:3] += jnp.concatenate(
                    [
                        jnp.sum(wgt * c_rows[ch:ch + 1, :], axis=1,
                                keepdims=True)
                        for ch in range(3)
                    ],
                    axis=1,
                )
            masked = jnp.where(blend, log1m[j], 0.0)
            if level == 9:
                state_ref[:, 3:4] = t_run * jnp.exp(masked[:, 0:1])
            elif level == 8:
                state_ref[:, 3:4] = t_run * (
                    1.0 + jnp.sum(masked, axis=1, keepdims=True)
                )
            else:
                state_ref[:, 3:4] = t_run * jnp.exp(
                    jnp.sum(masked, axis=1, keepdims=True)
                )
        out_ref[...] = jnp.broadcast_to(state_ref[0:8, 0:1], (8, CHUNK))

    return kernel


def run_variant(level, b_cap, mat, off, fl, flags, live):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b_cap // GROUP,),
        in_specs=_window_specs(GROUP, CHUNK),
        out_specs=pl.BlockSpec((8, CHUNK), lambda g, *p: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((PIX, 8), jnp.float32),
            pltpu.VMEM((ATTR_ROWS, 2 * GROUP * CHUNK + CHUNK), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _mk_kernel(level),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, CHUNK), jnp.float32),
    )(live, flags, off, fl, mat, mat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=40960)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    b_cap = args.blocks
    grp = GROUP * CHUNK
    n_groups = b_cap // GROUP
    f_cap = b_cap * CHUNK
    mat_cols = (-(-f_cap // grp) + 2) * grp

    rng = np.random.default_rng(0)
    mat = jnp.asarray(rng.random((ATTR_ROWS, mat_cols)), jnp.float32)
    # Monotone block offsets like the real schedule: advance ~0.8 chunks.
    src = np.minimum(
        np.cumsum(rng.integers(0, CHUNK, b_cap)) , f_cap - 1
    ).astype(np.int32)
    fl = (src[::GROUP] // grp).astype(np.int32)
    off = np.clip(src - np.repeat(fl, GROUP) * grp, 0,
                  2 * grp - CHUNK).astype(np.int32)
    flags = jnp.asarray(
        np.zeros(b_cap + 1, np.int32)
    )
    live = jnp.asarray([b_cap], jnp.int32)
    off = jnp.asarray(off)
    fl = jnp.asarray(fl)

    names = ["v0_dma", "v1_carve", "v2_alpha_vpu", "v3_alpha_mxu",
             "v4_cumsum", "v5_cumsum_b", "v6_full_mxuacc",
             "v7_full_vpu", "v8_notrans", "v9_nosum"]
    results = {"blocks": b_cap}
    prev = None
    for level, name in enumerate(names):
        fn = jax.jit(functools.partial(
            run_variant, level, b_cap
        ))
        out = fn(mat, off, fl, flags, live)
        np.asarray(out).ravel()[0]
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(mat, off, fl, flags, live)
        np.asarray(out).ravel()[0]
        dt = (time.perf_counter() - t0) / args.iters
        us_blk = dt * 1e6 / b_cap
        results[name + "_ms"] = round(dt * 1e3, 2)
        results[name + "_us_per_block"] = round(us_blk, 3)
        delta = "" if prev is None else f"  (+{(dt - prev) * 1e6 / b_cap:.3f} us/blk)"
        print(f"{name:>14s}: {dt * 1e3:8.2f} ms  {us_blk:.3f} us/blk{delta}",
              flush=True)
        prev = dt
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
