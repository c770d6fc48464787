"""Device math library tests (mirrors reference tests/shader/*.rs:
kernel result vs CPU reference within epsilon)."""

import numpy as np
import pytest

from wgpu_3dgs_core_tpu.ops import (
    cov3d_from_rot_scale,
    model_scale_rot_mat,
    model_to_world,
    model_transform_inv_sr_mat,
    model_transform_mat,
    quat_to_mat3,
    sigma6_to_mat3,
    unpack_color,
    unpack_cov3d,
    unpack_sh,
)

from .common import gaussians_soa


def _random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def _quat_to_mat_ref(q):
    """Independent reference: standard quaternion->matrix formula."""
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float32,
    )


def test_quat_to_mat3_matches_reference_formula():
    qs = _random_quats(16)
    got = np.asarray(quat_to_mat3(qs))
    for q, m in zip(qs, got):
        np.testing.assert_allclose(m, _quat_to_mat_ref(q), atol=1e-6)


def test_quat_to_mat3_is_rotation():
    qs = _random_quats(8, seed=1)
    m = np.asarray(quat_to_mat3(qs))
    eye = np.einsum("nij,nkj->nik", m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), m.shape),
                               atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-6)


def test_cov3d_from_rot_scale_psd_and_symmetric():
    qs = _random_quats(8, seed=2)
    scales = np.abs(np.random.default_rng(3).normal(size=(8, 3))).astype(
        np.float32
    ) + 0.1
    sigma6 = np.asarray(cov3d_from_rot_scale(qs, scales))
    sigma = np.asarray(sigma6_to_mat3(sigma6))
    # Sigma = M M^T: symmetric, PSD, with det = prod(s)^2.
    np.testing.assert_allclose(sigma, np.swapaxes(sigma, -1, -2), atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.det(sigma), np.prod(scales, axis=1) ** 2, rtol=1e-4
    )
    eig = np.linalg.eigvalsh(sigma)
    assert (eig > 0).all()


def test_cov3d_identity_rotation():
    q = np.array([[0.0, 0.0, 0.0, 1.0]], dtype=np.float32)
    s = np.array([[1.0, 2.0, 3.0]], dtype=np.float32)
    sigma6 = np.asarray(cov3d_from_rot_scale(q, s))
    np.testing.assert_allclose(sigma6[0], [1.0, 0, 0, 4.0, 0, 9.0], atol=1e-6)


def test_unpack_cov3d_variants_agree():
    """All three storage variants must decode to the same sigma
    (the analog of tests/shader/gaussian.rs cov3d cases)."""
    from wgpu_3dgs_core_tpu import Cov3dFormat, GaussianLayout, pack

    soa = gaussians_soa()
    rs = pack(soa, GaussianLayout(cov3d=Cov3dFormat.ROT_SCALE)).cov3d
    single = pack(soa, GaussianLayout(cov3d=Cov3dFormat.SINGLE)).cov3d
    half = pack(soa, GaussianLayout(cov3d=Cov3dFormat.HALF)).cov3d

    from_rs = np.asarray(unpack_cov3d(rs, rot_scale=True))
    from_single = np.asarray(unpack_cov3d(single, rot_scale=False))
    from_half = np.asarray(unpack_cov3d(half.astype(np.float16), rot_scale=False))

    np.testing.assert_allclose(from_rs, from_single, atol=1e-3, rtol=1e-5)
    # f16 sigma of magnitude ~4000 (scale ~42-123 squared) has ~2.0 ulp.
    np.testing.assert_allclose(from_half, from_single, rtol=1e-3, atol=1e-2)


def test_unpack_sh_variants():
    from wgpu_3dgs_core_tpu import GaussianLayout, ShFormat, pack

    soa = gaussians_soa()
    for fmt, atol in [(ShFormat.SINGLE, 0), (ShFormat.HALF, 1e-3),
                      (ShFormat.NORM8, 1 / 127)]:
        packed = pack(soa, GaussianLayout(sh=fmt))
        got = np.asarray(unpack_sh(packed.sh, len(soa)))
        np.testing.assert_allclose(got, soa.sh, atol=atol, rtol=0,
                                   err_msg=fmt.name)
    none = np.asarray(unpack_sh(None, 2))
    assert none.shape == (2, 15, 3)
    assert (none == 0).all()


def test_unpack_color():
    soa = gaussians_soa()
    got = np.asarray(unpack_color(soa.color))
    np.testing.assert_allclose(got, soa.color.astype(np.float32) / 255.0,
                               atol=1e-7)


def test_model_transform_mat_trs():
    """TRS matrix equals translate @ rotate @ scale
    (reference: tests/shader/model_transform.rs vs
    Mat4::from_scale_rotation_translation)."""
    pos = np.array([1.0, -2.0, 3.0], np.float32)
    q = _random_quats(1, seed=5)[0]
    scale = np.array([0.5, 2.0, 1.5], np.float32)

    m = np.asarray(model_transform_mat(pos, q, scale))
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = pos
    r = np.eye(4, dtype=np.float32)
    r[:3, :3] = _quat_to_mat_ref(q)
    s = np.diag(np.array([*scale, 1.0], np.float32))
    np.testing.assert_allclose(m, t @ r @ s, atol=1e-6)


def test_model_to_world_point():
    pos = np.array([1.0, 2.0, 3.0], np.float32)
    q = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    scale = np.array([2.0, 2.0, 2.0], np.float32)
    p = np.array([1.0, 1.0, 1.0], np.float32)
    out = np.asarray(model_to_world(pos, q, scale, p))
    np.testing.assert_allclose(out, [3.0, 4.0, 5.0, 1.0], atol=1e-6)


def test_inv_sr_mat_is_inverse():
    """(reference: tests/shader/model_transform.rs:100-201 inverse checks)."""
    q = _random_quats(4, seed=6)
    scale = (np.abs(np.random.default_rng(7).normal(size=(4, 3))) + 0.2).astype(
        np.float32
    )
    sr = np.asarray(model_scale_rot_mat(q, scale))
    inv = np.asarray(model_transform_inv_sr_mat(q, scale))
    eye = np.einsum("nij,njk->nik", inv, sr)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), sr.shape),
                               atol=1e-5)
