"""Multi-device scaling efficiency of render_sharded.

Runs the sharded fwd+bwd step on 1/2/4/8-device meshes and reports strong-
scaling efficiency t(1) / (D * t(D)). On a CPU host it uses the virtual
8-device mesh (first-order numbers: Pallas kernels run interpreted, which
inflates the compute share, so treat CPU results as a *lower bound* on the
sharding overhead's visibility, not kernel throughput). On a TPU pod it
measures the real thing; with one chip it still reports the D=1 sharded vs
plain-render overhead.

Usage: python tools/scaling_efficiency.py [--gaussians N] [--size WxH]
"""

import argparse
import json
import os
import sys
import time

if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import synthetic_scene  # noqa: E402
from wgpu_3dgs_core_tpu import Camera  # noqa: E402
from wgpu_3dgs_core_tpu.parallel import (  # noqa: E402
    gaussian_sharding,
    make_mesh,
    render_sharded,
)
from wgpu_3dgs_core_tpu.render.renderer import render  # noqa: E402


def time_step(fn, args, iters=3):
    out = fn(*args)
    # Sync via a device-to-host materialization: block_until_ready can
    # return before execution finishes on axon (CLAUDE.md).
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gaussians", type=int, default=65536)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--max-fragments", type=int, default=262144)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--tpu", action="store_true")
    args = p.parse_args()

    cam = Camera.look_at(
        eye=(0.0, 0.0, -6.0), target=(0.0, 0.0, 0.0),
        width=args.width, height=args.height, fov_y=0.9,
    )
    scene = synthetic_scene(args.gaussians)
    target = jnp.zeros((args.height, args.width, 3), jnp.float32)
    n_avail = len(jax.devices())
    results = {}

    # Plain single-device render as the baseline.
    @jax.jit
    def plain_step(*s):
        def loss(*s):
            res = render(*s[:4], cam, sh=s[4], sh_deg=3,
                         max_fragments=args.max_fragments)
            return jnp.mean((res.image - target) ** 2)
        return jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(*s)

    t_plain = time_step(plain_step, scene, args.iters)
    results["plain_1dev_ms"] = round(t_plain * 1e3, 1)
    print(f"plain render 1 dev: {t_plain*1e3:9.1f} ms", flush=True)

    # Direct cost of the all_to_all send-buffer build (VERDICT r3 item 4:
    # the O(D * N_local) per-destination compaction in _route_to_strips),
    # measured as a plain function at D=8 / N_local=N/8 shapes on one
    # device — no mesh needed.
    from wgpu_3dgs_core_tpu.parallel.sharded import _route_to_strips

    n_loc = args.gaussians // 8
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.random((n_loc, 13)), jnp.float32)
    s0 = jnp.asarray(rng.integers(0, 8, n_loc), jnp.int32)
    s1 = jnp.clip(s0 + jnp.asarray(rng.integers(0, 2, n_loc), jnp.int32),
                  0, 7)
    cap = max(128, int(n_loc * 2.0 / 8) // 128 * 128)

    @jax.jit
    def route(packed, s0, s1):
        send, over = _route_to_strips(packed, s0, s1, 8, cap)
        return send[:, ::64, 0].sum() + over

    t_route = time_step(route, (packed, s0, s1), args.iters)
    results["route_build_8dst_ms"] = round(t_route * 1e3, 2)
    print(f"route_to_strips build (D=8, N_local={n_loc}, cap={cap}): "
          f"{t_route*1e3:9.2f} ms", flush=True)

    sizes = [d for d in (1, 2, 4, 8) if d <= n_avail]
    t1 = None
    for d in sizes:
        mesh = make_mesh(d)
        shd = gaussian_sharding(mesh)
        sharded = tuple(jax.device_put(a, shd) for a in scene)

        def make(mesh):
            @jax.jit
            def step(*s):
                def loss(*s):
                    res = render_sharded(
                        *s[:4], cam, mesh, sh=s[4], sh_deg=3,
                        max_fragments=args.max_fragments,
                    )
                    return jnp.mean((res.image - target) ** 2)
                return jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(*s)
            return step

        t = time_step(make(mesh), sharded, args.iters)
        if d == 1:
            t1 = t
        eff = t1 / (d * t)
        results[f"sharded_{d}dev_ms"] = round(t * 1e3, 1)
        results[f"efficiency_{d}dev"] = round(eff, 3)
        print(f"sharded {d} dev: {t*1e3:9.1f} ms  strong-scaling eff "
              f"{eff*100:5.1f}%", flush=True)

    results["sharding_overhead_1dev"] = round(
        results["sharded_1dev_ms"] / results["plain_1dev_ms"], 3
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
