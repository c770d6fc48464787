"""Benchmark: forward+backward differentiable render throughput.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline target (BASELINE.md): >= 250 Mpix/s fwd+bwd per chip at 1080p on a
1M-gaussian scene. Mpix/s = (H * W) / seconds per full forward+backward step.
"""

import argparse
import json
import sys
import time

import numpy as np

BASELINE_MPIX_S = 250.0


def synthetic_scene(n, seed=0, spread=3.0, scale_lo=0.004, scale_hi=0.012):
    """A 1080p-friendly cloud: ~few-pixel splats spread over the frustum."""
    import jax.numpy as jnp

    from wgpu_3dgs_core_tpu.ops.transforms import cov3d_from_rot_scale

    rng = np.random.default_rng(seed)
    means = np.empty((n, 3), np.float32)
    means[:, 0] = rng.uniform(-spread, spread, n)
    means[:, 1] = rng.uniform(-spread * 0.6, spread * 0.6, n)
    means[:, 2] = rng.uniform(-2.0, 2.0, n)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    scales = rng.uniform(scale_lo, scale_hi, (n, 3)).astype(np.float32)
    cov6 = cov3d_from_rot_scale(jnp.asarray(q), jnp.asarray(scales))
    color = jnp.asarray(rng.random((n, 3)), jnp.float32)
    opac = jnp.asarray(0.2 + 0.7 * rng.random(n), jnp.float32)
    sh = jnp.asarray(0.1 * rng.normal(size=(n, 15, 3)), jnp.float32)
    return jnp.asarray(means), cov6, color, opac, sh


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gaussians", type=int, default=1_000_000)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    # Capacity sized to the scene: the synthetic cloud measures ~2.6
    # fragments/gaussian (elliptical bboxes), so 4.2M gives 1.6x headroom
    # at 1M gaussians. Every fragment-scale op (sort, scan, gathers) costs
    # proportional to this STATIC capacity, not the live fragment count —
    # oversizing it is pure overhead. Overflow is still checked every run.
    parser.add_argument("--max-fragments", type=int, default=4_194_304)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--sh-deg", type=int, default=3)
    parser.add_argument("--chunk", type=int, default=256)
    parser.add_argument("--small", action="store_true",
                        help="tiny config for smoke testing")
    args = parser.parse_args()

    if args.small:
        args.gaussians = 10_000
        args.width, args.height = 512, 512
        args.max_fragments = 262_144
        args.iters, args.warmup = 3, 1

    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from wgpu_3dgs_core_tpu import Camera, render

    cam = Camera.look_at(
        eye=(0.0, 0.0, -6.0), target=(0.0, 0.0, 0.0),
        width=args.width, height=args.height, fov_y=0.9,
    )
    scene = synthetic_scene(args.gaussians)
    target = jnp.zeros((args.height, args.width, 3), jnp.float32)

    def loss_fn(means, cov6, color, opac, sh):
        res = render(
            means, cov6, color, opac, cam, sh=sh, sh_deg=args.sh_deg,
            background=(0.0, 0.0, 0.0), max_fragments=args.max_fragments,
            chunk=args.chunk,
        )
        return jnp.mean((res.image - target) ** 2), res.overflow

    @jax.jit
    def step(means, cov6, color, opac, sh):
        (loss, overflow), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True
        )(means, cov6, color, opac, sh)
        return loss, overflow, grads

    # Compile + warmup. Sync via device-to-host materialization: on some
    # remote platforms block_until_ready returns before execution finishes.
    def sync(x):
        return float(np.asarray(x))

    loss, overflow, grads = step(*scene)
    if bool(np.asarray(overflow)):
        print("WARNING: fragment capacity overflow; raise --max-fragments",
              file=sys.stderr)
    for _ in range(args.warmup - 1):
        loss, overflow, grads = step(*scene)
    sync(loss)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        loss, overflow, grads = step(*scene)
    sync(loss)  # programs execute in order; waiting on the last waits on all
    dt = (time.perf_counter() - t0) / args.iters

    mpix_s = args.width * args.height / dt / 1e6
    msplats_s = args.gaussians / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "fwd+bwd render throughput "
                f"({args.height}p, {args.gaussians} gaussians, "
                f"sh_deg={args.sh_deg})",
                "value": round(mpix_s, 2),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 4),
                "msplats_s": round(msplats_s, 2),
                "step_ms": round(dt * 1e3, 2),
                "loss": float(loss),
                "overflow": bool(overflow),
            }
        )
    )


if __name__ == "__main__":
    main()
