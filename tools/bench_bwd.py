"""Decompose the XLA-side backward cost (step - fwd - bwd_kernel).

  reorder   the gradient reorder tail: key sort + stack + cumsum + the
            two [N, 9] offset gathers (renderer._bin_rasterize_bwd tail)
  nscale    autodiff of projection + view-dependent color only (the
            N-scale backward that runs outside the renderer's custom vjp)
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
from wgpu_3dgs_core_tpu.ops.projection import project  # noqa: E402
from wgpu_3dgs_core_tpu.ops.sh import gaussian_color  # noqa: E402


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
    p.add_argument("--f-pad", type=int, default=5_238_784)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()
    n, f_pad = args.gaussians, args.f_pad

    rng = np.random.default_rng(0)
    d16 = jnp.asarray(rng.normal(size=(16, f_pad)).astype(np.float32))
    gid = rng.integers(-1, n, f_pad).astype(np.float32)
    d16 = d16.at[9].set(jnp.asarray(gid))
    counts = jnp.asarray(rng.integers(0, 9, n).astype(np.int32))
    offsets = jnp.cumsum(counts) - counts

    @jax.jit
    def reorder(d, offsets, counts):
        gid_key = d[9].astype(jnp.int32)
        slot = jnp.arange(f_pad, dtype=jnp.int32)
        key = jnp.where(gid_key >= 0, gid_key, n + slot)
        sorted_out = jax.lax.sort(
            (key,) + tuple(d[i] for i in range(9)), num_keys=1,
            is_stable=True,
        )
        ds = jnp.stack(sorted_out[1:], axis=1)
        cs = jnp.cumsum(ds, axis=0)
        end = jnp.clip(offsets + counts - 1, 0, f_pad - 1)
        lo = jnp.clip(offsets - 1, 0, f_pad - 1)
        top = cs[end]
        bot = jnp.where((offsets > 0)[:, None], cs[lo], 0.0)
        d_table = jnp.where((counts > 0)[:, None], top - bot, 0.0)
        return d_table[::4096].sum()

    cam = Camera.look_at(eye=(0.0, 0.0, -6.0), target=(0.0, 0.0, 0.0),
                         width=1920, height=1080, fov_y=0.9)
    means, cov6, color, opac, sh = synthetic_scene(n)

    def nscale_loss(means, cov6, color, opac, sh):
        spl = project(means, cov6, cam, opacity=opac)
        view = cam.view_matrix()
        cam_pos = -jnp.einsum("ji,j->i", view[:3, :3], view[:3, 3])
        dirs = means - cam_pos
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(
            1e-12)
        rgb = gaussian_color(color, sh, dirs, 3, False)
        table = jnp.concatenate(
            [spl.xy, spl.conic, rgb, (opac * spl.mask)[:, None]], axis=1
        )
        return jnp.sum(table * 1e-6)

    nscale_grad = jax.jit(jax.grad(nscale_loss, argnums=(0, 1, 2, 3, 4)))

    @jax.jit
    def nscale(means, cov6, color, opac, sh):
        g = nscale_grad(means, cov6, color, opac, sh)
        return sum(x[::4096].sum() if x.ndim == 1 else x[::4096].sum()
                   for x in g)

    timed("reorder", reorder, (d16, offsets, counts), args.iters)
    timed("nscale", nscale, (means, cov6, color, opac, sh), args.iters)


def newtail():
    """The round-3 reorder: sort + [16,F] pack + segsum + uncompact."""
    n = 1_000_000
    f_pad = int(os.environ.get("BWD_F_PAD", "3955712"))
    rng = np.random.default_rng(0)
    from wgpu_3dgs_core_tpu.ops.expand import build_segment_table
    from wgpu_3dgs_core_tpu.ops.segreduce import (
        gid_column_sorted, segment_sums_sorted, uncompact_columns,
    )

    d16 = jnp.asarray(rng.normal(size=(16, f_pad)).astype(np.float32))
    gid = rng.integers(-1, n, f_pad).astype(np.float32)
    d16 = d16.at[9].set(jnp.asarray(gid))
    counts = jnp.asarray(rng.integers(0, 9, n).astype(np.int32))
    offsets = jnp.cumsum(counts) - counts
    span = jnp.maximum(counts, 1)
    z = jnp.zeros(n, jnp.int32)
    tab_t = jax.jit(build_segment_table)(
        offsets, counts, span, z, z, jnp.arange(n, dtype=jnp.int32)
    )
    total = jnp.int32(int(np.asarray(counts).sum()))

    @jax.jit
    def tail(d, tab_t, total):
        gid_key = d[9].astype(jnp.int32)
        slot = jnp.arange(f_pad, dtype=jnp.int32)
        key = jnp.where(gid_key >= 0, gid_key, n + slot)
        so = jax.lax.sort((key,) + tuple(d[i] for i in range(9)),
                          num_keys=1, is_stable=False)
        from wgpu_3dgs_core_tpu.ops.segreduce import split_grad_rows
        dgs = split_grad_rows(list(so[1:]))
        keys_f = so[0].astype(jnp.float32)
        from wgpu_3dgs_core_tpu.ops.expand import table_counts
        n_live = jnp.sum(table_counts(tab_t) > 0).astype(jnp.int32)
        gid_mono = gid_column_sorted(tab_t, n_live)
        d_comp = segment_sums_sorted(dgs, keys_f, gid_mono, total)
        d_full = uncompact_columns(d_comp, gid_mono, n)
        return d_full[:, ::4096].sum()

    @jax.jit
    def sort_pack(d):
        gid_key = d[9].astype(jnp.int32)
        slot = jnp.arange(f_pad, dtype=jnp.int32)
        key = jnp.where(gid_key >= 0, gid_key, n + slot)
        so = jax.lax.sort((key,) + tuple(d[i] for i in range(9)),
                          num_keys=1, is_stable=False)
        from wgpu_3dgs_core_tpu.ops.segreduce import split_grad_rows
        dgs = split_grad_rows(list(so[1:]))
        return dgs[:, ::65536].astype(jnp.float32).sum() \
            + so[0][::65536].sum()

    timed("sort+pack", sort_pack, (d16,))
    timed("newtail", tail, (d16, tab_t, total))


def _maybe_newtail():
    if "--newtail" in sys.argv:
        sys.argv.remove("--newtail")
        newtail()
        sys.exit(0)


def variants():
    """Sub-piece probes: which part of the reorder is slow?"""
    n = 1_000_000
    f_pad = int(os.environ.get("BWD_F_PAD", "3955712"))
    rng = np.random.default_rng(0)
    cols = [jnp.asarray(rng.normal(size=f_pad).astype(np.float32))
            for _ in range(9)]
    key = jnp.asarray(np.sort(rng.integers(0, n, f_pad)).astype(np.int32))
    counts = jnp.asarray(rng.integers(0, 9, n).astype(np.int32))
    offsets = jnp.cumsum(counts) - counts
    end = jnp.clip(offsets + counts - 1, 0, f_pad - 1)
    lo = jnp.clip(offsets - 1, 0, f_pad - 1)

    @jax.jit
    def sortonly(key, *cols):
        out = jax.lax.sort((key, *cols), num_keys=1, is_stable=True)
        return out[0][::65536].sum() + out[3][::65536].sum()

    @jax.jit
    def stack9_cumsum(*cols):
        ds = jnp.stack(cols, axis=1)
        return jnp.cumsum(ds, axis=0)[::65536].sum()

    @jax.jit
    def stack16_cumsum(*cols):
        z = jnp.zeros_like(cols[0])
        ds = jnp.stack(list(cols) + [z] * 7, axis=1)
        return jnp.cumsum(ds, axis=0)[::65536].sum()

    cs9 = jnp.asarray(rng.normal(size=(f_pad, 9)).astype(np.float32))
    cs16 = jnp.asarray(rng.normal(size=(f_pad, 16)).astype(np.float32))

    @jax.jit
    def gath9(cs, end, lo):
        return (cs[end] - cs[lo])[::4096].sum()

    @jax.jit
    def gath16(cs, end, lo):
        return (cs[end] - cs[lo])[::4096].sum()

    timed("sortonly", sortonly, (key, *cols))
    timed("stack9+cs", stack9_cumsum, tuple(cols))
    timed("stack16+cs", stack16_cumsum, tuple(cols))
    timed("gath9", gath9, (cs9, end, lo))
    timed("gath16", gath16, (cs16, end, lo))


def _maybe_variants():
    if "--variants" in sys.argv:
        sys.argv.remove("--variants")
        variants()
        sys.exit(0)


_maybe_variants()
_maybe_newtail()


if __name__ == "__main__":
    main()
