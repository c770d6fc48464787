"""Screen-space projection: 3D gaussians -> 2D splats (EWA).

Renderer extension (SURVEY.md §7, M3): pure-jnp, fully differentiable,
vectorized over N. Deliberately NOT a Pallas kernel: it is elementwise per
gaussian, so XLA fuses it into a handful of VPU loops; the memory-bound hot
spots are the sort/binning and tile blending stages, not this.

Math follows the EWA splatting formulation used by the original 3DGS
(gsplat supplement, arXiv:2312.02121): camera-space covariance
W Sigma W^T, perspective Jacobian J, screen covariance
Sigma2D = J W Sigma W^T J^T + blur*I.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..render.camera import Camera
from .transforms import quat_to_mat3, sigma6_to_mat3

# Low-pass dilation added to the 2D covariance, as in the original 3DGS.
COV2D_BLUR = 0.3
# Cutoff in standard deviations for the splat's pixel extent.
RADIUS_CUTOFF = 3.0


class ProjectedSplats(NamedTuple):
    """Per-gaussian screen-space quantities (all [N, ...])."""

    xy: jnp.ndarray  # [N, 2] pixel coordinates of the mean
    depth: jnp.ndarray  # [N] camera-space z
    conic: jnp.ndarray  # [N, 3] inverse 2D covariance (a, b, c)
    extent: jnp.ndarray  # [N, 2] pixel half-extent per axis (0 => culled)
    mask: jnp.ndarray  # [N] bool, in-frustum and non-degenerate
    compensation: jnp.ndarray  # [N] antialiasing opacity factor (1 if off)


def project(
    means: jnp.ndarray,
    cov3d_sigma6: jnp.ndarray,
    camera: Camera,
    model_transform: Optional[tuple] = None,
    size: float = 1.0,
    radius_cutoff: float = RADIUS_CUTOFF,
    antialiased: bool = False,
    opacity: Optional[jnp.ndarray] = None,
) -> ProjectedSplats:
    """Project gaussians to screen space.

    ``means``: [N, 3] model/world-space centers.
    ``cov3d_sigma6``: [N, 6] packed upper-triangular 3D covariance.
    ``model_transform``: optional (pos, rot, scale) arrays applying a
    model->world TRS before the view transform (the analog of consuming
    ModelTransformPod, reference: src/shader/model_transform.wesl).
    ``size``: splat size multiplier (GaussianTransform.size analog) —
    scales the screen-space covariance by size^2.
    ``radius_cutoff``: extent in standard deviations
    (GaussianTransform.max_std_dev analog).
    ``antialiased``: honor the SPZ antialiased flag (reference:
    spz.rs:565-567 stores it; the renderer behavior is the standard
    opacity compensation sqrt(det(Sigma)/det(Sigma+blur)) so splats
    shrunk below the low-pass dilation fade instead of popping).
    ``opacity``: optional [N] used ONLY to tighten the binning extent.
    The blend kernels zero any fragment with alpha < 1/255, and
    alpha = opacity * exp(-q/2) >= 1/255 requires
    q <= 2 ln(255 * opacity) — so clamping the extent to that radius is
    image-exact (it only excludes pixels both renderers already drop).
    Not valid for the ellipse display mode, whose ring alpha does not
    decay with q; pass None there.
    """
    view = camera.view_matrix()
    r_view = view[:3, :3]
    t_view = view[:3, 3]

    sigma = sigma6_to_mat3(cov3d_sigma6)  # [N, 3, 3]

    if model_transform is not None:
        m_pos, m_rot, m_scale = model_transform
        sr = quat_to_mat3(m_rot) * m_scale[None, :]  # 3x3
        means = jnp.einsum("ni,ji->nj", means, sr,
                           precision=jax.lax.Precision.HIGHEST) + m_pos
        sigma = jnp.einsum("ij,njk,lk->nil", sr, sigma, sr,
                           precision=jax.lax.Precision.HIGHEST)

    # World -> camera.
    t = jnp.einsum("ni,ji->nj", means, r_view,
                   precision=jax.lax.Precision.HIGHEST) + t_view  # [N, 3]
    tz = t[..., 2]

    # Frustum cull with a margin (as in 3DGS: cull means far outside).
    lim_x = 1.3 * camera.tan_half_fov_x
    lim_y = 1.3 * camera.tan_half_fov_y
    tz_safe = jnp.where(tz > camera.near, tz, camera.near)
    txz = jnp.clip(t[..., 0] / tz_safe, -lim_x, lim_x)
    tyz = jnp.clip(t[..., 1] / tz_safe, -lim_y, lim_y)

    in_frustum = (tz > camera.near) & (tz < camera.far)

    # Perspective Jacobian at the (clamped) mean.
    fx, fy = camera.fx, camera.fy
    j00 = fx / tz_safe
    j02 = -fx * txz / tz_safe
    j11 = fy / tz_safe
    j12 = -fy * tyz / tz_safe

    # V = W Sigma W^T (camera-space covariance).
    v = jnp.einsum("ij,njk,lk->nil", r_view, sigma, r_view,
                   precision=jax.lax.Precision.HIGHEST)

    # Sigma2D = J V J^T with J = [[j00, 0, j02], [0, j11, j12]].
    v00, v01, v02 = v[..., 0, 0], v[..., 0, 1], v[..., 0, 2]
    v11, v12, v22 = v[..., 1, 1], v[..., 1, 2], v[..., 2, 2]
    s2 = size * size
    c00 = s2 * (j00 * (j00 * v00 + j02 * v02)
                + j02 * (j00 * v02 + j02 * v22)) + COV2D_BLUR
    c01 = s2 * (j11 * (j00 * v01 + j02 * v12)
                + j12 * (j00 * v02 + j02 * v22))
    c11 = s2 * (j11 * (j11 * v11 + j12 * v12)
                + j12 * (j11 * v12 + j12 * v22)) + COV2D_BLUR

    det = c00 * c11 - c01 * c01
    valid = in_frustum & (det > 0.0)
    det_safe = jnp.where(det > 0.0, det, 1.0)

    if antialiased:
        det_orig = (c00 - COV2D_BLUR) * (c11 - COV2D_BLUR) - c01 * c01
        compensation = jnp.sqrt(
            jnp.maximum(det_orig, 0.0) / det_safe
        )
    else:
        compensation = jnp.ones_like(det)

    inv_det = 1.0 / det_safe
    conic = jnp.stack([c11 * inv_det, -c01 * inv_det, c00 * inv_det], axis=-1)

    # Extent: exact axis-aligned bbox of the cutoff ellipse. The region
    # {q <= cutoff^2} of a gaussian with 2D covariance Sigma has per-axis
    # half-extent cutoff * sqrt(Sigma_xx / Sigma_yy) — strictly tighter than
    # the circumscribed circle of the major axis (up to sqrt(l2/l1) smaller
    # per axis for anisotropic splats), and still exact: binning by this
    # bbox never drops a pixel with q inside the cutoff.
    cutoff = jnp.asarray(radius_cutoff, jnp.float32)
    if opacity is not None:
        # Opacity-aware cutoff (exact under the ALPHA_MIN floor; see
        # docstring). stop_gradient: binning extent is non-differentiable.
        op = jax.lax.stop_gradient(jnp.maximum(opacity, 0.0))
        q_max = 2.0 * jnp.log(jnp.maximum(255.0 * op, 1e-12))
        cutoff = jnp.minimum(cutoff, jnp.sqrt(jnp.maximum(q_max, 0.0)))
    ex = jnp.ceil(cutoff * jnp.sqrt(jnp.maximum(c00, 0.0)))
    ey = jnp.ceil(cutoff * jnp.sqrt(jnp.maximum(c11, 0.0)))
    extent = jnp.where(valid[:, None], jnp.stack([ex, ey], axis=-1), 0.0)

    # Pixel coordinates of the mean.
    u = fx * t[..., 0] / tz_safe + camera.cx
    v_pix = fy * t[..., 1] / tz_safe + camera.cy
    xy = jnp.stack([u, v_pix], axis=-1)

    return ProjectedSplats(
        xy=xy, depth=tz, conic=conic, extent=extent, mask=valid,
        compensation=compensation,
    )
