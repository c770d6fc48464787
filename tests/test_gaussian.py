"""Unified Gaussians container tests (mirrors reference tests/e2e/gaussian.rs)."""

import io

import numpy as np
import pytest

from wgpu_3dgs_core_tpu import (
    Gaussians,
    GaussianSoA,
    GaussiansSource,
    PlyGaussians,
    SpzGaussians,
)

from .common import (
    PLY_TOLERANCES,
    SPZ_DEFAULT_TOLERANCES,
    assert_gaussians_close,
    gaussian_soa_with_seeds,
    gaussians_soa,
)


def test_soa_basics():
    soa = gaussians_soa()
    assert len(soa) == 2
    sub = soa[0]
    assert len(sub) == 1
    both = GaussianSoA.concatenate([sub, soa[1]])
    np.testing.assert_array_equal(both.pos, soa.pos)


def test_gaussians_source_dispatch():
    soa = gaussians_soa()
    assert Gaussians(soa).source == GaussiansSource.INTERNAL
    assert Gaussians(soa.to_ply()).source == GaussiansSource.PLY
    assert Gaussians(soa.to_spz()).source == GaussiansSource.SPZ
    for g in (Gaussians(soa), Gaussians(soa.to_ply()), Gaussians(soa.to_spz())):
        assert len(g) == 2
        assert not g.is_empty


@pytest.mark.parametrize("source", list(GaussiansSource))
def test_gaussians_from_soa_roundtrip(source):
    original = gaussians_soa()
    g = Gaussians.from_soa(original, source)
    assert g.source == source
    tol = {
        GaussiansSource.INTERNAL: PLY_TOLERANCES,
        GaussiansSource.PLY: PLY_TOLERANCES,
        GaussiansSource.SPZ: SPZ_DEFAULT_TOLERANCES,
    }[source]
    assert_gaussians_close(original, g.to_soa(), tol)


def test_gaussians_internal_io_errors():
    g = Gaussians(gaussians_soa())
    with pytest.raises(IOError, match="cannot write Internal"):
        g.write_to(io.BytesIO())
    with pytest.raises(IOError, match="cannot write Internal"):
        g.write_to_file("/tmp/never.bin")
    with pytest.raises(IOError, match="cannot read Internal"):
        Gaussians.read_from(io.BytesIO(), GaussiansSource.INTERNAL)
    with pytest.raises(IOError, match="cannot read Internal"):
        Gaussians.read_from_file("/tmp/never.bin", GaussiansSource.INTERNAL)


@pytest.mark.parametrize("source", [GaussiansSource.PLY, GaussiansSource.SPZ])
def test_gaussians_file_roundtrip(source, tmp_path):
    original = gaussians_soa()
    g = Gaussians.from_soa(original, source)
    path = tmp_path / f"model.{source.value}"
    g.write_to_file(path)
    g2 = Gaussians.read_from_file(path, source)
    assert g2.source == source
    if source == GaussiansSource.PLY:
        assert g2.data == g.data
    else:
        assert g2.data == g.data


def test_gaussians_buffer_roundtrip():
    original = gaussians_soa()
    for source in (GaussiansSource.PLY, GaussiansSource.SPZ):
        g = Gaussians.from_soa(original, source)
        buf = io.BytesIO()
        g.write_to(buf)
        buf.seek(0)
        g2 = Gaussians.read_from(buf, source)
        assert g2.data == g.data


def test_cross_format_conversion():
    """PLY -> IR -> SPZ -> IR keeps values within SPZ tolerances.

    Uses the reference's seeds (42, 123): its v3 quat codec swaps the first
    and third stored components on round-trip (see test_spz.py bit-layout
    test), which its tolerance tables only absorb for near-symmetric quats.
    """
    original = gaussian_soa_with_seeds([42, 123])
    ply_soa = GaussianSoA.from_ply(original.to_ply())
    spz_soa = GaussianSoA.from_spz(ply_soa.to_spz())
    assert_gaussians_close(original, spz_soa, SPZ_DEFAULT_TOLERANCES)


def test_zeros_constructor():
    soa = GaussianSoA.zeros(4)
    assert len(soa) == 4
    np.testing.assert_array_equal(soa.rot[:, 3], 1.0)
    np.testing.assert_array_equal(soa.scale, 1.0)
