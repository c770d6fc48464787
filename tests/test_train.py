"""Training loop tests: fitting gaussians to a target image end-to-end."""

import jax.numpy as jnp
import numpy as np

from wgpu_3dgs_core_tpu import Camera, render
from wgpu_3dgs_core_tpu.render.train import TrainableGaussians, fit

from .common import gaussian_soa_with_seeds


def _tiny_scene():
    """A few gaussians near the origin with moderate scales/opacities."""
    rng = np.random.default_rng(0)
    from wgpu_3dgs_core_tpu import GaussianSoA

    n = 8
    soa = GaussianSoA.zeros(n)
    soa.pos[:] = rng.normal(size=(n, 3)) * 0.8
    soa.scale[:] = 0.25 + 0.1 * rng.random((n, 3))
    soa.color[:] = rng.integers(60, 200, (n, 4))
    soa.color[:, 3] = 160
    return soa


CAM = Camera.look_at(eye=(0, 0, -4), target=(0, 0, 0), width=32, height=32,
                     fov_y=0.9)


def test_trainable_roundtrip():
    soa = gaussian_soa_with_seeds([1, 2])
    soa.color[:] = np.clip(soa.color, 5, 250)  # keep logits finite
    params = TrainableGaussians.from_soa(soa)
    back = params.to_soa()
    np.testing.assert_allclose(back.pos, soa.pos, atol=1e-5)
    np.testing.assert_allclose(back.scale, soa.scale, rtol=1e-4)
    assert np.abs(back.color.astype(int) - soa.color.astype(int)).max() <= 1


def test_fit_reduces_loss():
    scene = _tiny_scene()
    # Target: a slightly perturbed render of the same scene.
    target_scene = _tiny_scene()
    target_scene.pos[:, 0] += 0.15
    from wgpu_3dgs_core_tpu import GaussiansBuffer
    from wgpu_3dgs_core_tpu.render.renderer import render_gaussians

    target = np.asarray(
        render_gaussians(GaussiansBuffer.new(target_scene), CAM).image
    )

    fitted, losses = fit(scene, CAM, target, steps=25, learning_rate=1e-2,
                         sh_deg=0, log_every=1)
    assert losses[-1] < losses[0] * 0.9, losses
    assert np.isfinite(losses).all()


def test_fit_loss_curve_contract():
    """Curve: every log_every-th step plus the final one; steps=0 -> []."""
    scene = _tiny_scene()
    target = jnp.zeros((32, 32, 3))

    _, losses = fit(scene, CAM, target, steps=8, sh_deg=0, log_every=3)
    assert len(losses) == 4  # steps 0, 3, 6 + final step 7
    _, losses0 = fit(scene, CAM, target, steps=5, sh_deg=0, log_every=0)
    assert len(losses0) == 1  # final only
    _, losses_none = fit(scene, CAM, target, steps=0, sh_deg=0)
    assert losses_none == []


def test_fit_returns_valid_scene():
    scene = _tiny_scene()
    target = jnp.zeros((32, 32, 3))
    fitted, losses = fit(scene, CAM, target, steps=5, sh_deg=0)
    assert len(fitted) == len(scene)
    assert np.isfinite(fitted.pos).all()
    assert np.isfinite(fitted.scale).all()
    assert (fitted.scale > 0).all()
