"""Shared test fixtures: deterministic data and field-wise tolerances.

Mirrors the reference's tests/common/{given,assert}.rs so the same scenarios
are pinned by the same tolerance tables.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from wgpu_3dgs_core_tpu import GaussianSoA


def gaussian_soa_with_seeds(seeds) -> GaussianSoA:
    """Deterministic gaussians from arithmetic on seeds
    (reference: tests/common/given.rs:48-81)."""
    base = np.asarray(seeds, dtype=np.float32)[:, None]

    rot = np.concatenate(
        [base + np.float32(d) for d in (0.1, 0.2, 0.3, 0.4)], axis=1
    )
    rot = rot / np.linalg.norm(rot, axis=1, keepdims=True)

    pos = np.concatenate([base + np.float32(d) for d in (1.1, 2.2, 3.3)], axis=1)

    color = np.concatenate(
        [np.fmod(base + np.float32(d), np.float32(256.0)) for d in (11, 22, 33, 44)],
        axis=1,
    ).astype(np.uint8)

    i = np.arange(15, dtype=np.float32)[None, :, None]
    sh_base = base[:, :, None] + i * np.float32(0.3)
    offsets = np.array([0.1, 0.2, 0.3], dtype=np.float32)[None, None, :]
    sh = np.fmod(sh_base + offsets, np.float32(2.0)) - np.float32(1.0)

    scale = np.concatenate([base + np.float32(d) for d in (0.12, 0.34, 0.56)], axis=1)

    return GaussianSoA(rot=rot, pos=pos, color=color, sh=sh, scale=scale)


def gaussians_soa() -> GaussianSoA:
    """The reference's standard pair: seeds 42 and 123 (given.rs:83-85)."""
    return gaussian_soa_with_seeds([42, 123])


@dataclass
class GaussianTolerances:
    """Per-field tolerance table (reference: tests/common/assert.rs:56-64)."""

    pos_epsilon: float
    rot_epsilon: float
    color_tolerance: int
    sh_epsilon: float
    scale_epsilon: float


# Standard tables used by the reference's e2e tests.
PLY_TOLERANCES = GaussianTolerances(
    pos_epsilon=1e-5,
    rot_epsilon=1e-4,
    color_tolerance=1,
    sh_epsilon=1e-5,
    scale_epsilon=1e-4,
)
# reference: tests/e2e/gaussian.rs:92-98 (SPZ default options, v3/frac12)
SPZ_DEFAULT_TOLERANCES = GaussianTolerances(
    pos_epsilon=0.01,
    rot_epsilon=0.05,
    color_tolerance=5,
    sh_epsilon=0.1,
    scale_epsilon=2.0,
)
# reference: tests/e2e/spz.rs:13-20 (all versions / degrees sweep)
SPZ_LOOSE_TOLERANCES = GaussianTolerances(
    pos_epsilon=1.0,
    rot_epsilon=1e-1,
    color_tolerance=2,
    sh_epsilon=1e-1,
    scale_epsilon=1.0,
)


def assert_gaussians_close(a: GaussianSoA, b: GaussianSoA,
                           tol: GaussianTolerances, sh_coeffs: int = 15) -> None:
    """Field-wise approximate equality (reference: tests/common/assert.rs:65-116)."""
    assert len(a) == len(b)
    np.testing.assert_allclose(a.rot, b.rot, atol=tol.rot_epsilon, rtol=0,
                               err_msg="rotation")
    np.testing.assert_allclose(a.pos, b.pos, atol=tol.pos_epsilon, rtol=0,
                               err_msg="position")
    cdiff = np.abs(a.color.astype(np.int16) - b.color.astype(np.int16))
    assert cdiff.max() <= tol.color_tolerance, (
        f"color diff {cdiff.max()} > {tol.color_tolerance}\n{a.color}\n{b.color}"
    )
    np.testing.assert_allclose(
        a.sh[:, :sh_coeffs], b.sh[:, :sh_coeffs], atol=tol.sh_epsilon, rtol=0,
        err_msg="sh",
    )
    np.testing.assert_allclose(a.scale, b.scale, atol=tol.scale_epsilon, rtol=0,
                               err_msg="scale")
