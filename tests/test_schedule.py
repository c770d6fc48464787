"""pad_schedule blk_flags invariants (ADVICE r4).

The branch-free rasterizer kernels decode a packed per-block word
(tile << 2 | first << 1 | last, ops/binning.pad_schedule) and rely on
invariants that general render tests only exercise indirectly — and that
the hardware dynamic-grid path depends on where CPU tests cannot reach:
dead blocks and mid-segment blocks both carry no first/last bits, every
live tile gets exactly one first and one last, and a truncated stream
flushes at the final live block. Pin them directly against the schedule's
own blk_tile/pad_off/tile_len outputs.
"""

import jax.numpy as jnp
import numpy as np

from wgpu_3dgs_core_tpu.ops.binning import (
    FragmentStream,
    pad_schedule,
)
from wgpu_3dgs_core_tpu.ops.rasterize import FLAG_FIRST, FLAG_LAST

CHUNK = 8


def _stream(lengths, f_cap=1024):
    lengths = np.asarray(lengths, np.int64)
    start = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    end = start + lengths
    t = len(lengths)
    return FragmentStream(
        gauss_id=jnp.zeros(f_cap, jnp.int32),
        tile_id=jnp.zeros(f_cap, jnp.int32),
        num_fragments=jnp.int32(int(lengths.sum())),
        overflow=jnp.asarray(False),
        tile_start=jnp.asarray(start, jnp.int32),
        tile_end=jnp.asarray(end, jnp.int32),
    )


def _decode(sched):
    flags = np.asarray(sched.blk_flags)
    return flags >> 2, (flags & FLAG_FIRST) != 0, (flags & FLAG_LAST) != 0


def _check_invariants(lengths, f_pad_cap, chunk=CHUNK):
    sched = pad_schedule(_stream(lengths), chunk, f_pad_cap)
    tids, firsts, lasts = _decode(sched)
    live = int(sched.live_blocks[0])
    blk_tile = np.asarray(sched.blk_tile)
    pad_off = np.asarray(sched.pad_off)
    ln = np.asarray(sched.tile_len)
    written = np.asarray(sched.tile_written)
    b_cap = len(blk_tile)

    # The +1 lookahead pad word (read by the backward prefetch) is 0.
    assert len(tids) == b_cap + 1 and tids[b_cap] == 0

    # Dead blocks encode as word 0: no tile bits, no first/last.
    for b in range(live, b_cap):
        assert tids[b] == 0 and not firsts[b] and not lasts[b]

    # Live blocks: tile bits match blk_tile; first iff the block starts
    # its tile's padded segment; exactly one last per written tile, at
    # the segment end or the truncation point.
    seen_first = {}
    seen_last = {}
    for b in range(live):
        t = blk_tile[b]
        assert tids[b] == t
        base_rank = b * chunk - pad_off[t]
        assert firsts[b] == (base_rank == 0)
        expect_last = (base_rank + chunk >= ln[t]) or (b == live - 1)
        assert lasts[b] == expect_last
        if firsts[b]:
            seen_first[t] = seen_first.get(t, 0) + 1
        if lasts[b]:
            seen_last[t] = seen_last.get(t, 0) + 1

    for t in np.nonzero(written)[0]:
        assert seen_first.get(t, 0) == 1, f"tile {t}: first != 1"
        assert seen_last.get(t, 0) == 1, f"tile {t}: last != 1"
    # Unwritten tiles own no blocks at all.
    for t in np.nonzero(~written)[0]:
        assert seen_first.get(t, 0) == 0 and seen_last.get(t, 0) == 0

    # src/valid: valid slots enumerate each tile's [start, end) in order.
    src = np.asarray(sched.src)
    valid = np.asarray(sched.valid)
    start = np.asarray(_stream(lengths).tile_start)
    for b in range(live):
        t = blk_tile[b]
        base_rank = b * chunk - pad_off[t]
        for lane in range(chunk):
            slot = b * chunk + lane
            rank = base_rank + lane
            if rank < ln[t]:
                assert valid[slot]
                assert src[slot] == start[t] + rank
            else:
                assert not valid[slot]
    assert not valid[live * chunk:].any()


def test_mixed_tiles():
    # Empty tiles between live ones; lengths off and on chunk boundaries.
    _check_invariants([5, 0, 3 * CHUNK, CHUNK, 0, 1], f_pad_cap=16 * CHUNK)


def test_single_tile():
    _check_invariants([2 * CHUNK + 3], f_pad_cap=8 * CHUNK)


def test_all_empty():
    sched = pad_schedule(_stream([0, 0, 0]), CHUNK, 8 * CHUNK)
    assert int(sched.live_blocks[0]) == 0
    assert not np.asarray(sched.tile_written).any()
    assert (np.asarray(sched.blk_flags) == 0).all()
    assert not np.asarray(sched.valid).any()


def test_truncated_stream():
    # f_pad_cap too small: trailing tiles truncated, the final live block
    # must carry `last` (the kernel flushes the partial tile there), and
    # tile_written marks exactly the tiles whose first block survived.
    lengths = [CHUNK, 3 * CHUNK, 2 * CHUNK]
    _check_invariants(lengths, f_pad_cap=4 * CHUNK)
    sched = pad_schedule(_stream(lengths), CHUNK, 4 * CHUNK)
    written = np.asarray(sched.tile_written)
    assert list(written) == [True, True, False]
    _, _, lasts = _decode(sched)
    assert lasts[int(sched.live_blocks[0]) - 1]


def test_truncation_surfaces_as_overflow():
    """A pad_slack too small for the scene folds schedule truncation into
    the render overflow flag and zeroes the gradients (same contract as
    fragment-capacity overflow)."""
    import jax
    import jax.numpy as jnp

    from wgpu_3dgs_core_tpu import Camera, render
    from wgpu_3dgs_core_tpu.ops.transforms import cov3d_from_rot_scale

    rng = np.random.default_rng(0)
    n = 64
    means = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    cov6 = cov3d_from_rot_scale(
        jnp.asarray(q), jnp.asarray(0.05 + 0.1 * rng.random((n, 3)),
                                    jnp.float32)
    )
    color = jnp.asarray(rng.random((n, 3)), jnp.float32)
    opac = jnp.asarray(0.3 + 0.6 * rng.random(n), jnp.float32)
    cam = Camera.look_at(eye=(0, 0, -4), target=(0, 0, 0), width=128,
                         height=96, fov_y=0.9)

    ok = render(means, cov6, color, opac, cam, max_fragments=8192,
                pad_slack=1.0)
    assert not bool(ok.overflow)

    # Capacity exactly at the live count (no fragment overflow) but zero
    # padding headroom: the tile-padded schedule cannot fit and truncates.
    from wgpu_3dgs_core_tpu import measure_max_fragments

    tight = measure_max_fragments(means, cov6, opac, cam, headroom=1.0)

    def loss(o, slack):
        res = render(means, cov6, color, o, cam, max_fragments=tight,
                     pad_slack=slack)
        return jnp.sum(res.image), res.overflow

    (l0, ovf), g = jax.value_and_grad(loss, has_aux=True)(opac, 0.0)
    assert bool(ovf)  # truncated schedule surfaces as overflow
    assert float(jnp.abs(g).max()) == 0.0  # and the step trains on nothing

    # Sanity: same capacity with full padding headroom does not truncate.
    (_, ovf1), g1 = jax.value_and_grad(loss, has_aux=True)(opac, 1.0)
    assert not bool(ovf1)
    assert float(jnp.abs(g1).max()) > 0.0
