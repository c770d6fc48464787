"""Component-level timing of the render pipeline on the real TPU.

Times each pipeline slice in isolation at the bench shape so regressions
and bottlenecks are attributable:

  project            EWA projection (N-scale elementwise)
  bin                expand + (tile, depth) sort + tile ranges
  sched              bin + pad_schedule (block/tile maps)
  gather             sched + the [9, F_pad] attribute gather + masking
  fwd                full forward render
  kernel_fwd         ONLY the forward Pallas kernel (inputs precomputed)
  kernel_fwd_bwd     forward + backward Pallas kernels (custom vjp)
  step               full fwd+bwd with gradients to all five params

Derived: kernel_bwd = kernel_fwd_bwd - kernel_fwd; xla_bwd = (step - fwd)
- kernel_bwd (the attribute-gather backward scatter-add etc).

Timing rules from CLAUDE.md: sync via np.asarray (block_until_ready lies
on axon), enqueue K calls and sync once. Persistent compilation cache
enabled so re-runs skip the remote compiles.
"""

import argparse
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

from bench import synthetic_scene  # noqa: E402
from wgpu_3dgs_core_tpu import Camera, render  # noqa: E402
from wgpu_3dgs_core_tpu.ops.binning import (  # noqa: E402
    bin_splats_attrs,
    num_tiles,
)
from wgpu_3dgs_core_tpu.ops.projection import project  # noqa: E402
from wgpu_3dgs_core_tpu.ops.rasterize import (  # noqa: E402
    rasterize_tiles_bwd,
    rasterize_tiles_fwd,
)
from wgpu_3dgs_core_tpu.render.renderer import DEFAULT_CHUNK  # noqa: E402


def timed(label, fn, args, iters, results, key):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]  # compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:>24s}: {dt:9.2f} ms", flush=True)
    results[key] = round(dt, 2)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gaussians", type=int, default=1_000_000)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--max-fragments", type=int, default=2_957_312)
    p.add_argument("--max-rows", type=int, default=1_887_232)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--sh-deg", type=int, default=3)
    p.add_argument("--chunk", type=int, default=None)
    p.add_argument("--pad-slack", type=float, default=0.65)
    args = p.parse_args()
    chunk = args.chunk or DEFAULT_CHUNK

    print(f"devices: {jax.devices()}", flush=True)
    cam = Camera.look_at(
        eye=(0.0, 0.0, -6.0), target=(0.0, 0.0, 0.0),
        width=args.width, height=args.height, fov_y=0.9,
    )
    scene = synthetic_scene(args.gaussians)
    target = jnp.zeros((args.height, args.width, 3), jnp.float32)
    tiles_x, tiles_y = num_tiles(args.width, args.height)
    t_total = tiles_x * tiles_y
    results = {}

    f_cap = -(-args.max_fragments // chunk) * chunk
    from wgpu_3dgs_core_tpu.ops.rasterize import DEFAULT_GROUP
    grp = chunk * DEFAULT_GROUP
    f_pad_cap = -(-(f_cap + int(t_total * chunk * args.pad_slack)) // grp) * grp

    means, cov6, color, opac, sh = scene

    # ---- pipeline-prefix probes ------------------------------------------
    @jax.jit
    def project_only(means, cov6):
        spl = project(means, cov6, cam)
        return spl.xy.sum() + spl.extent.sum()

    @jax.jit
    def bin_only(means, cov6, color, opac, sh):
        spl = project(means, cov6, cam, opacity=opac)
        table = jnp.concatenate(
            [spl.xy, spl.conic, color, (opac * spl.mask)[:, None]], axis=1
        )
        st, attrs, _ = bin_splats_attrs(
            spl.xy, spl.extent, spl.depth, spl.mask, table.T,
            tiles_x, tiles_y, f_cap, max_rows=args.max_rows,
        )
        return attrs[:, ::65536].sum() + st.tile_start.sum()

    from wgpu_3dgs_core_tpu.render.renderer import (
        DEFAULT_GROUP as GRP,
        _bin_rasterize_impl,
    )

    def build_res(means, cov6, color, opac, sh):
        spl = project(means, cov6, cam, opacity=opac)
        table = jnp.concatenate(
            [spl.xy, spl.conic, color, (opac * spl.mask)[:, None]], axis=1
        )
        out, res = _bin_rasterize_impl(
            table.T, spl.xy, spl.extent, spl.depth,
            spl.mask.astype(jnp.float32), 0, tiles_x, tiles_y, f_cap,
            chunk, (0.0, 0.0, 0.0), 9.0, 0, args.pad_slack,
            args.max_rows,
        )
        return out, res

    @jax.jit
    def sched_only(means, cov6, color, opac, sh):
        _, res = build_res(means, cov6, color, opac, sh)
        return res[1][::4096].sum() + res[4].sum()  # off, live_blocks

    @jax.jit
    def gather_only(means, cov6, color, opac, sh):
        # full fetch + fwd kernel (the mat never materializes separately
        # from the kernel in the fused design)
        out, _ = build_res(means, cov6, color, opac, sh)
        return out[0][::64].sum()

    # ---- kernel-only probes (inputs precomputed outside the timer) ------
    _, res0 = jax.jit(build_res)(*scene)
    (mat, off, fl, blk_flags, live, tab_t, num_frag,
     tiles_out) = [jax.device_put(np.asarray(x)) for x in res0[:8]]
    print(f"live blocks: {int(np.asarray(live)[0])} / {f_pad_cap // chunk}",
          flush=True)

    @jax.jit
    def kernel_fwd(mat):
        tiles = rasterize_tiles_fwd(
            mat, off, fl, blk_flags, live,
            chunk, t_total, (0.0, 0.0, 0.0), 9.0, 0, GRP,
        )
        return jnp.sum(tiles[::64])

    @jax.jit
    def kernel_fwd_bwd(mat):
        tiles = rasterize_tiles_fwd(
            mat, off, fl, blk_flags, live,
            chunk, t_total, (0.0, 0.0, 0.0), 9.0, 0, GRP,
        )
        dfrag = rasterize_tiles_bwd(
            mat, off, fl, blk_flags, live,
            tiles, tiles * 1e-3, chunk, t_total,
            (0.0, 0.0, 0.0), 9.0, 0, GRP,
        )
        # Reduce on device: syncing a 344 MB output through the relay
        # costs seconds and gets misattributed to the kernel.
        return dfrag[::64].sum()

    # ---- full passes ------------------------------------------------------
    def loss_fn(means, cov6, color, opac, sh):
        res = render(
            means, cov6, color, opac, cam, sh=sh, sh_deg=args.sh_deg,
            background=(0.0, 0.0, 0.0), max_fragments=args.max_fragments,
            chunk=chunk, pad_slack=args.pad_slack,
            max_rows=args.max_rows,
        )
        return jnp.mean((res.image - target) ** 2), res.overflow

    @jax.jit
    def fwd_only(*s):
        return loss_fn(*s)[0]

    @jax.jit
    def step(*s):
        (loss, _), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True
        )(*s)
        return loss, grads

    it = args.iters
    timed("project", project_only, scene[:2], it, results, "project_ms")
    timed("bin", bin_only, scene, it, results, "bin_ms")
    timed("sched", sched_only, scene, it, results, "sched_ms")
    timed("gather", gather_only, scene, it, results, "gather_ms")
    timed("kernel_fwd", kernel_fwd, (mat,), it, results, "kernel_fwd_ms")
    timed("kernel_fwd+bwd", kernel_fwd_bwd, (mat,), it, results,
          "kernel_fwd_bwd_ms")
    timed("fwd", fwd_only, scene, it, results, "fwd_ms")
    timed("step", step, scene, it, results, "step_ms")

    results["kernel_bwd_ms"] = round(
        results["kernel_fwd_bwd_ms"] - results["kernel_fwd_ms"], 2
    )
    results["xla_bwd_ms"] = round(
        results["step_ms"] - results["fwd_ms"] - results["kernel_bwd_ms"], 2
    )
    results["gather_slice_ms"] = round(
        results["gather_ms"] - results["sched_ms"], 2
    )
    results["kernel_fwd_slice_ms"] = round(
        results["fwd_ms"] - results["gather_ms"], 2
    )
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
