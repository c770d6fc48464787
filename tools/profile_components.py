"""Component-level timing of the render pipeline on the real TPU.

Answers, at the bench shape (1M gaussians, 1080p, 8.4M-fragment cap):
  1. full fwd+bwd step, python-loop amortized   (== bench.py methodology)
  2. the same step chained x CHAIN inside ONE jit (isolates relay dispatch
     overhead: if (1) >> (2)/CHAIN, the bench is dispatch-bound, not compute)
  3. forward-only render
  4. bin_splats alone (the fragment-scale sort/scan/searchsorted block)

Timing rules from CLAUDE.md: sync via np.asarray (block_until_ready lies on
axon), enqueue K calls and sync once. Persistent compilation cache enabled so
re-runs skip the 4-10 min remote compiles.
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
from wgpu_3dgs_core_tpu.ops.binning import bin_splats, num_tiles  # noqa: E402
from wgpu_3dgs_core_tpu.ops.projection import project  # noqa: E402


def timed(label, fn, args, iters, sync_out):
    """Median-of-iters wall time; enqueue all, sync once at the end."""
    out = fn(*args)
    sync_out(out)  # warmup + compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync_out(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:>28s}: {dt:9.2f} ms", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gaussians", type=int, default=1_000_000)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--max-fragments", type=int, default=8_388_608)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--sh-deg", type=int, default=3)
    p.add_argument("--skip-chain", action="store_true",
                   help="skip the chained-step probe (its own jit signature "
                        "costs a fresh multi-minute remote compile)")
    args = p.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    cam = Camera.look_at(
        eye=(0.0, 0.0, -6.0), target=(0.0, 0.0, 0.0),
        width=args.width, height=args.height, fov_y=0.9,
    )
    scene = synthetic_scene(args.gaussians)
    target = jnp.zeros((args.height, args.width, 3), jnp.float32)
    results = {}

    def loss_fn(means, cov6, color, opac, sh):
        res = render(
            means, cov6, color, opac, cam, sh=sh, sh_deg=args.sh_deg,
            background=(0.0, 0.0, 0.0), max_fragments=args.max_fragments,
        )
        return jnp.mean((res.image - target) ** 2), res.overflow

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4),
                                 has_aux=True)

    @jax.jit
    def step(means, cov6, color, opac, sh):
        (loss, overflow), grads = grad_fn(means, cov6, color, opac, sh)
        return loss, overflow, grads

    @jax.jit
    def step_chain(means, cov6, color, opac, sh):
        # CHAIN dependent steps inside one dispatch: sgd-like updates force
        # sequential execution (no common-subexpression collapse).
        def body(i, carry):
            m, c6, col, op, s = carry
            (loss, _), g = grad_fn(m, c6, col, op, s)
            lr = 1e-9 * (1.0 + loss)
            return (m - lr * g[0], c6 - lr * g[1], col - lr * g[2],
                    op - lr * g[3], s - lr * g[4])
        out = jax.lax.fori_loop(0, args.chain, body, scene)
        return out[0]

    @jax.jit
    def fwd_only(means, cov6, color, opac, sh):
        res = render(
            means, cov6, color, opac, cam, sh=sh, sh_deg=args.sh_deg,
            background=(0.0, 0.0, 0.0), max_fragments=args.max_fragments,
        )
        return jnp.sum(res.image)

    tiles_x, tiles_y = num_tiles(args.width, args.height)

    @jax.jit
    def bin_only(means, cov6, color, opac, sh):
        spl = project(means, cov6, cam)
        st = bin_splats(spl.xy, spl.extent, spl.depth, spl.mask,
                        tiles_x, tiles_y, args.max_fragments)
        return st.gauss_id[::65536].sum() + st.tile_start.sum()

    @jax.jit
    def project_only(means, cov6, color, opac, sh):
        spl = project(means, cov6, cam)
        return spl.xy.sum() + spl.extent.sum()

    # Kernel-only probes: bin ONCE outside the timed graph, then time the
    # forward Pallas kernel and its hand-derived backward in isolation —
    # this splits "bwd kernel" from "rest of bwd" (attr scatter-add etc.),
    # which the step/fwd subtraction above cannot.
    from wgpu_3dgs_core_tpu.render.renderer import (DEFAULT_CHUNK, rasterize_splats)

    def _prep():
        spl = project(means_c, cov6_c, cam)
        return spl

    means_c, cov6_c, color_c, opac_c, sh_c = scene

    @jax.jit
    def raster_only(means, cov6, color, opac, sh):
        spl = project(means, cov6, cam)
        tiles, _ = rasterize_splats(
            spl.xy, spl.depth, spl.conic, spl.extent, spl.mask,
            color, opac, tiles_x, tiles_y, args.max_fragments, DEFAULT_CHUNK,
            (0.0, 0.0, 0.0),
        )
        return jnp.sum(tiles[::64])

    @jax.jit
    def raster_grad(means, cov6, color, opac, sh):
        def f(xy, conic, color, opac):
            spl = project(means, cov6, cam)
            tiles, _ = rasterize_splats(
                xy, spl.depth, conic, spl.extent, spl.mask,
                color, opac, tiles_x, tiles_y, args.max_fragments, DEFAULT_CHUNK,
                (0.0, 0.0, 0.0),
            )
            return jnp.sum(tiles * tiles)
        spl = project(means, cov6, cam)
        return jax.grad(f, argnums=(0, 1, 2, 3))(
            spl.xy, spl.conic, color, opac
        )[0].sum()

    def sync_scalarish(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf).ravel()[0]

    t0 = time.perf_counter()
    results["step_ms"] = timed("full step (py loop)", step, scene,
                               args.iters, sync_scalarish)
    print(f"  [compile+run took {time.perf_counter()-t0:.0f}s]", flush=True)
    results["fwd_ms"] = timed("forward only", fwd_only, scene,
                              args.iters, sync_scalarish)
    results["bin_ms"] = timed("project+bin only", bin_only, scene,
                              args.iters, sync_scalarish)
    results["project_ms"] = timed("project only", project_only, scene,
                                  args.iters, sync_scalarish)
    if not args.skip_chain:
        chain_ms = timed("chained x%d step" % args.chain, step_chain, scene,
                         max(args.iters // 4, 2), sync_scalarish)
        results["chain_step_ms"] = chain_ms / args.chain
        results["dispatch_overhead_ms"] = (
            results["step_ms"] - results["chain_step_ms"]
        )

    results["bwd_ms"] = results["step_ms"] - results["fwd_ms"]
    results["raster_fwd_ms"] = results["fwd_ms"] - results["bin_ms"]
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
