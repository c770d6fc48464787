"""Multi-device sharded renderer tests on the virtual 8-device CPU mesh
(SURVEY.md §4: multi-host logic testable single-process via
xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_3dgs_core_tpu import Camera, render
from wgpu_3dgs_core_tpu.ops.transforms import cov3d_from_rot_scale
from wgpu_3dgs_core_tpu.parallel import (
    gaussian_sharding,
    make_mesh,
    pad_to_multiple,
    render_sharded,
)

CAM = Camera.look_at(eye=(0, 0, -5), target=(0, 0, 0), width=64, height=48,
                     fov_y=0.8)
BG = (0.1, 0.2, 0.3)


def _scene(n, seed=0):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    cov6 = cov3d_from_rot_scale(
        jnp.asarray(q), jnp.asarray(0.05 + 0.2 * rng.random((n, 3)), jnp.float32)
    )
    color = jnp.asarray(rng.random((n, 3)), jnp.float32)
    opac = jnp.asarray(0.3 + 0.6 * rng.random(n), jnp.float32)
    sh = jnp.asarray(0.2 * rng.normal(size=(n, 15, 3)), jnp.float32)
    return means, cov6, color, opac, sh


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_forward_matches_single_device():
    means, cov6, color, opac, sh = _scene(64)
    mesh = make_mesh(8)
    shd = gaussian_sharding(mesh)
    args = [jax.device_put(x, shd) for x in (means, cov6, color, opac, sh)]

    res = render_sharded(*args[:4], CAM, mesh, sh=args[4], sh_deg=3,
                         background=BG)
    single = render(means, cov6, color, opac, CAM, sh=sh, sh_deg=3,
                    background=BG)
    np.testing.assert_allclose(
        np.asarray(res.image), np.asarray(single.image), atol=1e-5, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(res.transmittance), np.asarray(single.transmittance),
        atol=1e-5, rtol=0,
    )


def test_sharded_gradients_match_single_device():
    """Gradient all-reduce path: sharded grads == single-device grads
    (>= 80% of the multi-host acceptance is this correctness half)."""
    means, cov6, color, opac, sh = _scene(32, seed=1)
    mesh = make_mesh(8)
    shd = gaussian_sharding(mesh)
    args = [jax.device_put(x, shd) for x in (means, cov6, color, opac, sh)]
    target = jnp.asarray(
        np.random.default_rng(2).random((48, 64, 3)), jnp.float32
    )

    def loss_sharded(means, cov6, color, opac, sh):
        r = render_sharded(means, cov6, color, opac, CAM, mesh, sh=sh,
                           sh_deg=3, background=BG)
        return jnp.sum((r.image - target) ** 2)

    def loss_single(means, cov6, color, opac, sh):
        r = render(means, cov6, color, opac, CAM, sh=sh, sh_deg=3,
                   background=BG)
        return jnp.sum((r.image - target) ** 2)

    g_sh = jax.grad(loss_sharded, argnums=tuple(range(5)))(*args)
    g_1 = jax.grad(loss_single, argnums=tuple(range(5)))(
        means, cov6, color, opac, sh
    )
    for name, a, b in zip(["means", "cov6", "color", "opac", "sh"], g_sh, g_1):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4, rtol=0,
                                   err_msg=name)


def test_sharded_under_jit():
    means, cov6, color, opac, _ = _scene(16, seed=3)
    mesh = make_mesh(8)

    @jax.jit
    def f(means, cov6, color, opac):
        return render_sharded(means, cov6, color, opac, CAM, mesh,
                              background=BG).image

    a = np.asarray(f(means, cov6, color, opac))
    b = np.asarray(render(means, cov6, color, opac, CAM, background=BG).image)
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=0)


def test_pad_to_multiple():
    x = np.ones((10, 3))
    padded, n = pad_to_multiple(x, 8)
    assert padded.shape == (16, 3)
    assert n == 10
    assert (padded[10:] == 0).all()

    exact = np.ones((16, 3))
    padded2, n2 = pad_to_multiple(exact, 8)
    assert padded2.shape == (16, 3) and n2 == 16


def test_sharded_two_devices():
    """Smaller mesh: exercises uneven tile-strip split (3 rows over 2)."""
    means, cov6, color, opac, _ = _scene(16, seed=4)
    mesh = make_mesh(2)
    shd = gaussian_sharding(mesh)
    args = [jax.device_put(x, shd) for x in (means, cov6, color, opac)]
    res = render_sharded(*args, CAM, mesh, background=BG)
    single = render(means, cov6, color, opac, CAM, background=BG)
    np.testing.assert_allclose(
        np.asarray(res.image), np.asarray(single.image), atol=1e-5, rtol=0
    )
