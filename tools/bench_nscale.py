"""Decompose the N-scale autodiff backward (projection + SH color).

Probes which piece of the ~60 ms "nscale" cost (tools/bench_bwd.py) is
slow, and whether attribute-major [C, N] layouts (N on lanes) beat the
row-major [N, C] arrays with tiny trailing dims (Mosaic/XLA lane-pads
trailing dims to 128 — CLAUDE.md environment quirks).

Run on TPU: python tools/bench_nscale.py
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
from wgpu_3dgs_core_tpu.ops.sh import eval_sh, gaussian_color  # noqa: E402


def timed(label, fn, args, iters=6):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:>16s}: {dt:9.2f} ms", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gaussians", type=int, default=1_000_000)
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args()
    n = args.gaussians

    cam = Camera.look_at(eye=(0.0, 0.0, -6.0), target=(0.0, 0.0, 0.0),
                         width=1920, height=1080, fov_y=0.9)
    means, cov6, color, opac, sh = synthetic_scene(n)
    view = cam.view_matrix()
    cam_pos = -jnp.einsum("ji,j->i", view[:3, :3], view[:3, 3])

    def dirs_of(means):
        d = means - cam_pos
        return d / jnp.linalg.norm(d, axis=-1, keepdims=True).clip(1e-12)

    # --- piece 1: SH color only, [N, 15, 3] storage -------------------
    def sh_loss(color, sh, means):
        rgb = gaussian_color(color, sh, dirs_of(means), 3, False)
        return jnp.sum(rgb * 1e-6)

    sh_grad = jax.jit(jax.grad(sh_loss, argnums=(0, 1, 2)))

    # --- piece 2: SH color, [45, N] attribute-major storage -----------
    def sh_loss_t(color_t, sh_t, means_t):
        # all [C, N]; dirs computed in [3, N]
        d = means_t - cam_pos[:, None]
        d = d / jnp.linalg.norm(d, axis=0, keepdims=True).clip(1e-12)
        x, y, z = d[0], d[1], d[2]
        from wgpu_3dgs_core_tpu.ops.sh import SH_C1, SH_C2, SH_C3
        s = sh_t  # [45, N] = (coeff, channel) flattened coeff-major
        def c(k):
            return s[3 * k: 3 * k + 3]  # [3, N]
        res = SH_C1 * (-y * c(0) + z * c(1) - x * c(2))
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        res = res + (
            SH_C2[0] * xy * c(3) + SH_C2[1] * yz * c(4)
            + SH_C2[2] * (2.0 * zz - xx - yy) * c(5)
            + SH_C2[3] * xz * c(6) + SH_C2[4] * (xx - yy) * c(7)
        )
        res = res + (
            SH_C3[0] * y * (3.0 * xx - yy) * c(8)
            + SH_C3[1] * xy * z * c(9)
            + SH_C3[2] * y * (4.0 * zz - xx - yy) * c(10)
            + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * c(11)
            + SH_C3[4] * x * (4.0 * zz - xx - yy) * c(12)
            + SH_C3[5] * z * (xx - yy) * c(13)
            + SH_C3[6] * x * (xx - 3.0 * yy) * c(14)
        )
        rgb = jnp.maximum(color_t + res, 0.0)
        return jnp.sum(rgb * 1e-6)

    sh_grad_t = jax.jit(jax.grad(sh_loss_t, argnums=(0, 1, 2)))

    # --- piece 3: projection only --------------------------------------
    def proj_loss(means, cov6, opac):
        spl = project(means, cov6, cam, opacity=opac)
        return (jnp.sum(spl.xy * 1e-6) + jnp.sum(spl.conic * 1e-7)
                + jnp.sum(spl.depth * 1e-6))

    proj_grad = jax.jit(jax.grad(proj_loss, argnums=(0, 1, 2)))

    # --- piece 4: the [N, 9] concat table (attr assembly) --------------
    def table_loss(means, cov6, color, opac, sh):
        spl = project(means, cov6, cam, opacity=opac)
        rgb = gaussian_color(color, sh, dirs_of(means), 3, False)
        table = jnp.concatenate(
            [spl.xy, spl.conic, rgb, (opac * spl.mask)[:, None]], axis=1
        )
        return jnp.sum(table * 1e-6)

    table_grad = jax.jit(jax.grad(table_loss, argnums=(0, 1, 2, 3, 4)))

    def scal(g):
        return sum(x[::4096].sum() for x in jax.tree.leaves(g))

    sh_t = jnp.asarray(np.asarray(sh).reshape(n, 45).T.copy())  # [45, N]
    color_t = jnp.asarray(np.asarray(color).T.copy())
    means_t = jnp.asarray(np.asarray(means).T.copy())

    f1 = jax.jit(lambda c, s, m: scal(sh_grad(c, s, m)))
    f2 = jax.jit(lambda c, s, m: scal(sh_grad_t(c, s, m)))
    f3 = jax.jit(lambda m, cv, o: scal(proj_grad(m, cv, o)))
    f4 = jax.jit(lambda m, cv, c, o, s: scal(table_grad(m, cv, c, o, s)))

    timed("sh_bwd[N,15,3]", f1, (color, sh, means), args.iters)
    timed("sh_bwd[45,N]", f2, (color_t, sh_t, means_t), args.iters)
    timed("proj_bwd", f3, (means, cov6, opac), args.iters)
    timed("table_bwd(all)", f4, (means, cov6, color, opac, sh), args.iters)


if __name__ == "__main__":
    main()
