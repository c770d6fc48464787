"""Pallas fragment-expansion kernel vs the XLA reference expansion.

Both paths of ops/binning.bin_splats must produce identical streams (the
kernel is a restructuring, not an approximation): same tile ids, gaussian
ids, tile ranges, counts, and overflow, over random scenes including
culled gaussians, empty scenes, and overflowing capacities.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from wgpu_3dgs_core_tpu.ops.binning import bin_splats


def _random_scene(n, seed, w=640, h=480, cull_frac=0.2):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-40, [w + 40, h + 40], (n, 2)).astype(np.float32)
    extent = rng.uniform(0.5, 48.0, (n, 2)).astype(np.float32)
    # Some zero-extent and some masked-out gaussians.
    extent[rng.random(n) < 0.1] = 0.0
    depth = rng.uniform(0.1, 50.0, n).astype(np.float32)
    mask = rng.random(n) >= cull_frac
    return (
        jnp.asarray(xy), jnp.asarray(extent), jnp.asarray(depth),
        jnp.asarray(mask),
    )


def _assert_streams_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a.tile_id), np.asarray(b.tile_id))
    np.testing.assert_array_equal(
        np.asarray(a.num_fragments), np.asarray(b.num_fragments)
    )
    assert bool(a.overflow) == bool(b.overflow)
    np.testing.assert_array_equal(
        np.asarray(a.tile_start), np.asarray(b.tile_start)
    )
    np.testing.assert_array_equal(np.asarray(a.tile_end), np.asarray(b.tile_end))
    # gauss_id: only live slots are meaningful (padding gid differs by
    # design: XLA path clamps, Pallas path zeros).
    nf = int(a.num_fragments)
    np.testing.assert_array_equal(
        np.asarray(a.gauss_id)[:nf], np.asarray(b.gauss_id)[:nf]
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [37, 1000])
def test_expand_pallas_matches_xla(seed, n):
    xy, extent, depth, mask = _random_scene(n, seed)
    kw = dict(tiles_x=40, tiles_y=30, max_fragments=65536)
    a = bin_splats(xy, extent, depth, mask, expand_impl="pallas", **kw)
    b = bin_splats(xy, extent, depth, mask, expand_impl="xla", **kw)
    assert int(a.num_fragments) > 0
    _assert_streams_equal(a, b)


def test_expand_overflow_parity():
    xy, extent, depth, mask = _random_scene(500, 7)
    kw = dict(tiles_x=40, tiles_y=30, max_fragments=4096)
    a = bin_splats(xy, extent, depth, mask, expand_impl="pallas", **kw)
    b = bin_splats(xy, extent, depth, mask, expand_impl="xla", **kw)
    assert bool(a.overflow)
    _assert_streams_equal(a, b)


def test_expand_all_culled():
    xy, extent, depth, mask = _random_scene(64, 3)
    mask = jnp.zeros_like(mask)
    kw = dict(tiles_x=40, tiles_y=30, max_fragments=4096)
    a = bin_splats(xy, extent, depth, mask, expand_impl="pallas", **kw)
    b = bin_splats(xy, extent, depth, mask, expand_impl="xla", **kw)
    assert int(a.num_fragments) == 0
    _assert_streams_equal(a, b)


def test_expand_strip_offset_parity():
    xy, extent, depth, mask = _random_scene(800, 11)
    kw = dict(tiles_x=40, tiles_y=8, max_fragments=65536, tile_y_offset=2)
    a = bin_splats(xy, extent, depth, mask, expand_impl="pallas", **kw)
    b = bin_splats(xy, extent, depth, mask, expand_impl="xla", **kw)
    _assert_streams_equal(a, b)
