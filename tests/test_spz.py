"""SPZ format tests (mirrors reference tests/e2e/spz.rs)."""

import io

import numpy as np
import pytest

from wgpu_3dgs_core_tpu import (
    GaussianSoA,
    SpzCountMismatchError,
    SpzEncodeOptions,
    SpzGaussians,
    SpzHeader,
    SpzPositionFloat16MismatchError,
    SpzRotationQuatSmallestThreeMismatchError,
    SpzShDegreeMismatchError,
)

from .common import (
    SPZ_DEFAULT_TOLERANCES,
    SPZ_LOOSE_TOLERANCES,
    assert_gaussians_close,
    gaussians_soa,
)

REFERENCE_MODEL_SPZ = "/root/reference/examples/model.spz"


def test_read_reference_model_spz():
    spz = SpzGaussians.read_from_file(REFERENCE_MODEL_SPZ)
    assert len(spz) == 9
    soa = GaussianSoA.from_spz(spz)
    assert len(soa) == 9


def test_spz_and_ply_reference_models_agree():
    """model.spz was generated from model.ply; they must decode to nearly
    the same gaussians."""
    from wgpu_3dgs_core_tpu import PlyGaussians

    ply_soa = GaussianSoA.from_ply(
        PlyGaussians.read_from_file("/root/reference/examples/model.ply")
    )
    spz_soa = GaussianSoA.from_spz(SpzGaussians.read_from_file(REFERENCE_MODEL_SPZ))
    assert_gaussians_close(ply_soa, spz_soa, SPZ_LOOSE_TOLERANCES)


def test_spz_write_read_byte_exact_roundtrip():
    spz = gaussians_soa().to_spz()
    buf = io.BytesIO()
    spz.write_to(buf)
    buf.seek(0)
    spz2 = SpzGaussians.read_from(buf)
    assert spz == spz2


def test_spz_file_roundtrip(tmp_path):
    spz = gaussians_soa().to_spz()
    path = tmp_path / "model.spz"
    spz.write_to_file(path)
    assert SpzGaussians.read_from_file(path) == spz


def test_spz_gaussian_roundtrip_default_options():
    original = gaussians_soa()
    back = GaussianSoA.from_spz(original.to_spz())
    # SPZ normalizes quats and fixes their sign; compare up to sign like the
    # reference does implicitly (its seeds produce positive-w quats).
    assert_gaussians_close(original, back, SPZ_DEFAULT_TOLERANCES)


@pytest.mark.parametrize("version", [1, 2, 3])
def test_spz_gaussian_roundtrip_versions(version):
    original = gaussians_soa()
    # v1 float16 positions need looser tolerances (reference: spz.rs:13-20).
    opts = SpzEncodeOptions(version=version)
    back = GaussianSoA.from_spz(original.to_spz(opts))
    assert_gaussians_close(original, back, SPZ_LOOSE_TOLERANCES)


@pytest.mark.parametrize("sh_degree", [0, 1, 2, 3])
def test_spz_gaussian_roundtrip_sh_degrees(sh_degree):
    original = gaussians_soa()
    opts = SpzEncodeOptions(sh_degree=sh_degree)
    spz = original.to_spz(opts)
    assert spz.shs.shape[1] == {0: 0, 1: 3, 2: 8, 3: 15}[sh_degree]
    back = GaussianSoA.from_spz(spz)
    k = spz.shs.shape[1]
    assert_gaussians_close(original, back, SPZ_LOOSE_TOLERANCES, sh_coeffs=k)
    # Truncated coefficients decode to zero.
    assert (back.sh[:, k:] == 0).all()


@pytest.mark.parametrize("fractional_bits", [6, 12])
def test_spz_gaussian_roundtrip_fractional_bits(fractional_bits):
    original = gaussians_soa()
    opts = SpzEncodeOptions(version=2, fractional_bits=fractional_bits)
    back = GaussianSoA.from_spz(original.to_spz(opts))
    assert_gaussians_close(original, back, SPZ_LOOSE_TOLERANCES)


def test_spz_fixed24_overflow_wraps():
    """Positions beyond the 24-bit fixed range wrap silently, matching the
    reference's byte-masking encode (reference: src/gaussian.rs:239-247)."""
    original = gaussians_soa()  # |pos| up to ~126
    opts = SpzEncodeOptions(version=2, fractional_bits=18)  # range ±32
    back = GaussianSoA.from_spz(original.to_spz(opts))
    period = np.float32(2**24 / 2**18)  # 64
    wrapped = (original.pos + period / 2) % period - period / 2
    np.testing.assert_allclose(back.pos, wrapped, atol=0.01, rtol=0)


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_spz_gaussian_roundtrip_sh_quantize_bits(bits):
    original = gaussians_soa()
    opts = SpzEncodeOptions(sh_quantize_bits=(bits, bits, bits))
    back = GaussianSoA.from_spz(original.to_spz(opts))
    # Coarser buckets lose more; bound by the bucket size.
    bucket = 1 << (8 - bits)
    atol = max(0.1, bucket / 128.0)
    np.testing.assert_allclose(original.sh, back.sh, atol=atol, rtol=0)


def test_spz_antialiased_flag_roundtrip():
    spz = gaussians_soa().to_spz(SpzEncodeOptions(antialiased=True))
    buf = io.BytesIO()
    spz.write_to(buf)
    buf.seek(0)
    assert SpzGaussians.read_from(buf).header.antialiased


def test_spz_header_invalid_magic():
    raw = b"XXXX" + SpzHeader.default(1).to_bytes()[4:]
    with pytest.raises(IOError, match="Invalid SPZ magic number"):
        SpzHeader.from_bytes(raw)


def test_spz_header_unsupported_version():
    import struct

    raw = struct.pack("<IIIBBBB", 0x5053474E, 4, 1, 3, 12, 0, 0)
    with pytest.raises(IOError, match="Unsupported SPZ version: 4"):
        SpzHeader.from_bytes(raw)


def test_spz_header_invalid_sh_degree():
    import struct

    raw = struct.pack("<IIIBBBB", 0x5053474E, 3, 1, 5, 12, 0, 0)
    with pytest.raises(ValueError, match="invalid SPZ SH degree"):
        SpzHeader.from_bytes(raw)


def test_spz_count_mismatch():
    spz = gaussians_soa().to_spz()
    bad_header = SpzHeader(version=3, num_points=5, sh_degree=3,
                           fractional_bits=12)
    with pytest.raises(SpzCountMismatchError):
        SpzGaussians(bad_header, spz.positions, spz.scales, spz.rotations,
                     spz.alphas, spz.colors, spz.shs)


def test_spz_position_variant_mismatch():
    spz = gaussians_soa().to_spz()  # v3 -> fixed24 positions
    v1_header = SpzHeader(version=1, num_points=len(spz), sh_degree=3,
                          fractional_bits=12)
    with pytest.raises(SpzPositionFloat16MismatchError):
        SpzGaussians(v1_header, spz.positions, spz.scales,
                     spz.rotations[:, :3], spz.alphas, spz.colors, spz.shs)


def test_spz_rotation_variant_mismatch():
    spz = gaussians_soa().to_spz(SpzEncodeOptions(version=2))
    v3_header = SpzHeader(version=3, num_points=len(spz), sh_degree=3,
                          fractional_bits=12)
    with pytest.raises(SpzRotationQuatSmallestThreeMismatchError):
        SpzGaussians(v3_header, spz.positions, spz.scales, spz.rotations,
                     spz.alphas, spz.colors, spz.shs)


def test_spz_sh_degree_mismatch():
    spz = gaussians_soa().to_spz()
    deg1_header = SpzHeader(version=3, num_points=len(spz), sh_degree=1,
                            fractional_bits=12)
    with pytest.raises(SpzShDegreeMismatchError):
        SpzGaussians(deg1_header, spz.positions, spz.scales, spz.rotations,
                     spz.alphas, spz.colors, spz.shs)


def test_spz_truncated_stream_errors():
    spz = gaussians_soa().to_spz()
    buf = io.BytesIO()
    spz.write_decompressed(buf)
    data = buf.getvalue()[:-4]
    with pytest.raises(IOError, match="EOF"):
        SpzGaussians.read_decompressed(io.BytesIO(data))


def test_spz_v3_quat_codec_bit_layout():
    """Pin the exact v3 smallest-three bit layout, including the reference's
    LSB-read / MSB-write component ordering (reference:
    src/gaussian.rs:166-197 vs 256-287)."""
    from wgpu_3dgs_core_tpu.models.spz import decode_rotations, encode_rotations

    header = SpzHeader(version=3, num_points=1, sh_degree=0, fractional_bits=12)
    q = np.array([[0.1, 0.2, 0.3, 0.9273618]], dtype=np.float32)
    packed = encode_rotations(q, header)
    comp = int(packed[0, 0]) | (int(packed[0, 1]) << 8) | \
        (int(packed[0, 2]) << 16) | (int(packed[0, 3]) << 24)
    assert comp >> 30 == 3  # w is largest
    # First non-largest component (x) sits in the HIGHEST component bits.
    mag_x = (comp >> 20) & 511
    assert mag_x == int(np.trunc(511 * (abs(0.1) * np.sqrt(2)) + 0.5))
    # Decoding reads ascending components from the LSB, so x and z swap —
    # the reference's own round-trip behavior.
    decoded = decode_rotations(packed, header)
    np.testing.assert_allclose(decoded[0, 0], 0.3, atol=2e-3)
    np.testing.assert_allclose(decoded[0, 2], 0.1, atol=2e-3)


def test_spz_from_batches_concatenates():
    """FromIterator analog: batches collect into one (spz.rs:836-914)."""
    a = gaussians_soa().to_spz()
    b = gaussians_soa().to_spz()
    merged = SpzGaussians.from_batches([a, b])
    assert len(merged) == len(a) + len(b)
    np.testing.assert_array_equal(
        merged.positions, np.concatenate([a.positions, b.positions])
    )
    np.testing.assert_array_equal(
        merged.shs, np.concatenate([a.shs, b.shs])
    )


def test_spz_from_batches_empty_iterator():
    from wgpu_3dgs_core_tpu import SpzEmptyIteratorError

    with pytest.raises(SpzEmptyIteratorError):
        SpzGaussians.from_batches([])


def test_spz_from_batches_mixed_position_variant():
    from wgpu_3dgs_core_tpu import SpzInvalidMixedVariantError

    a = gaussians_soa().to_spz(SpzEncodeOptions(version=1))  # f16 positions
    b = gaussians_soa().to_spz(SpzEncodeOptions(version=2))  # fixed-24
    with pytest.raises(SpzInvalidMixedVariantError, match="position"):
        SpzGaussians.from_batches([a, b])


def test_spz_from_batches_mixed_rotation_variant():
    from wgpu_3dgs_core_tpu import SpzInvalidMixedVariantError

    a = gaussians_soa().to_spz(SpzEncodeOptions(version=2))  # first-three
    b = gaussians_soa().to_spz(SpzEncodeOptions(version=3))  # smallest-three
    b2 = SpzGaussians(  # same position codec as v2, rotation differs
        SpzHeader(version=3, num_points=len(b), sh_degree=3,
                  fractional_bits=b.header.fractional_bits),
        b.positions, b.scales, b.rotations, b.alphas, b.colors, b.shs,
    )
    with pytest.raises(SpzInvalidMixedVariantError, match="rotation"):
        SpzGaussians.from_batches([a, b2])


def test_spz_from_batches_mixed_sh_degree():
    from wgpu_3dgs_core_tpu import SpzInvalidMixedVariantError

    a = gaussians_soa().to_spz(SpzEncodeOptions(sh_degree=3))
    b = gaussians_soa().to_spz(SpzEncodeOptions(sh_degree=1))
    with pytest.raises(SpzInvalidMixedVariantError, match="sh"):
        SpzGaussians.from_batches([a, b])
