"""Layout config tests — the for_each_gaussian_pod sweep
(mirrors reference src/buffer/gaussian.rs:386-527 unit tests)."""

import numpy as np
import pytest

from wgpu_3dgs_core_tpu import (
    ALL_LAYOUTS,
    Cov3dFormat,
    GaussianLayout,
    IrreversibleConfigError,
    ShFormat,
    pack,
    unpack,
)

from .common import gaussians_soa

REVERSIBLE = [
    l for l in ALL_LAYOUTS
    if l.sh != ShFormat.NONE and l.cov3d == Cov3dFormat.ROT_SCALE
]
IRREVERSIBLE = [l for l in ALL_LAYOUTS if l not in REVERSIBLE]


def _layout_id(l):
    return f"{l.sh.name.lower()}-{l.cov3d.name.lower()}"


def test_twelve_layouts():
    assert len(ALL_LAYOUTS) == 12


@pytest.mark.parametrize("layout", ALL_LAYOUTS, ids=_layout_id)
def test_features_exactly_two_enabled(layout):
    """(reference: gaussian.rs:472-485)."""
    features = dict(layout.features())
    assert len(features) == 7
    enabled = [k for k, v in features.items() if v]
    assert sorted(enabled) == sorted([layout.sh.value, layout.cov3d.value])


@pytest.mark.parametrize("layout", ALL_LAYOUTS, ids=_layout_id)
def test_pack_shapes_and_dtypes(layout):
    soa = gaussians_soa()
    packed = pack(soa, layout)
    assert packed.pos.shape == (2, 3) and packed.pos.dtype == np.float32
    assert packed.color.shape == (2, 4) and packed.color.dtype == np.uint8
    if layout.sh == ShFormat.NONE:
        assert packed.sh is None
    else:
        assert packed.sh.shape == (2, layout.sh_width)
        assert packed.sh.dtype == layout.sh_dtype
    assert packed.cov3d.shape == (2, layout.cov3d_width)
    assert packed.cov3d.dtype == layout.cov3d_dtype


@pytest.mark.parametrize("layout", REVERSIBLE, ids=_layout_id)
def test_roundtrip_reversible(layout):
    """(reference: gaussian.rs:408-437 non-panicking cases)."""
    soa = gaussians_soa()
    back = unpack(pack(soa, layout))
    np.testing.assert_array_equal(back.pos, soa.pos)
    np.testing.assert_array_equal(back.color, soa.color)
    np.testing.assert_array_equal(back.rot, soa.rot)
    np.testing.assert_array_equal(back.scale, soa.scale)
    atol = {ShFormat.SINGLE: 0.0, ShFormat.HALF: 1e-3, ShFormat.NORM8: 1 / 127}[
        layout.sh
    ]
    np.testing.assert_allclose(back.sh, soa.sh, atol=atol, rtol=0)


@pytest.mark.parametrize("layout", IRREVERSIBLE, ids=_layout_id)
def test_roundtrip_irreversible_raises(layout):
    """(reference: gaussian.rs:390-407 should_panic cases)."""
    packed = pack(gaussians_soa(), layout)
    with pytest.raises(IrreversibleConfigError):
        unpack(packed)


def test_norm8_clamps_to_127():
    soa = gaussians_soa()
    soa.sh[0, 0, 0] = 2.0
    soa.sh[0, 0, 1] = -2.0
    packed = pack(soa, GaussianLayout(sh=ShFormat.NORM8))
    assert packed.sh[0, 0] == 127
    assert packed.sh[0, 1] == -127


def test_cov3d_single_matches_rot_scale_sigma():
    """Packing sigma directly must equal recomputing it from rot+scale."""
    from wgpu_3dgs_core_tpu.ops import unpack_cov3d

    soa = gaussians_soa()
    direct = pack(soa, GaussianLayout(cov3d=Cov3dFormat.SINGLE)).cov3d
    rs = pack(soa, GaussianLayout(cov3d=Cov3dFormat.ROT_SCALE)).cov3d
    recomputed = np.asarray(unpack_cov3d(rs, rot_scale=True))
    np.testing.assert_allclose(direct, recomputed, atol=1e-3, rtol=1e-5)


def test_bytes_per_gaussian():
    """Packed sizes for the corner layouts (reference pod sizes are
    interleaved+padded: 208 B ShSingle/RotScale ... 32 B ShNone/Half,
    src/buffer/gaussian.rs:373-384 — SoA drops the struct padding)."""
    assert GaussianLayout(ShFormat.SINGLE, Cov3dFormat.ROT_SCALE).bytes_per_gaussian == 224
    assert GaussianLayout(ShFormat.NONE, Cov3dFormat.HALF).bytes_per_gaussian == 28
