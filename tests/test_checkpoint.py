"""Sharded checkpoint tests (SURVEY.md §5: checkpoint/resume + the new
sharded save/restore for training-scale scenes)."""

import numpy as np
import pytest

from wgpu_3dgs_core_tpu.utils.checkpoint import (
    load_manifest,
    load_sharded,
    save_sharded,
)

from .common import gaussian_soa_with_seeds


def test_roundtrip_full(tmp_path):
    soa = gaussian_soa_with_seeds(list(range(10)))
    save_sharded(str(tmp_path), soa, n_shards=4)
    back, extras = load_sharded(str(tmp_path))
    assert extras == {}
    np.testing.assert_array_equal(back.pos, soa.pos)
    np.testing.assert_array_equal(back.color, soa.color)
    np.testing.assert_array_equal(back.sh, soa.sh)


def test_manifest(tmp_path):
    soa = gaussian_soa_with_seeds(list(range(7)))
    save_sharded(str(tmp_path), soa, n_shards=3)
    m = load_manifest(str(tmp_path))
    assert m["num_gaussians"] == 7
    assert m["num_shards"] == 3


def test_reshard_to_different_host_count(tmp_path):
    """Saved with 4 shards, restored as 3 slices: every gaussian appears
    exactly once across the slices."""
    soa = gaussian_soa_with_seeds(list(range(11)))
    save_sharded(str(tmp_path), soa, n_shards=4)
    parts = [load_sharded(str(tmp_path), shard=s, n_shards=3)[0]
             for s in range(3)]
    joined = np.concatenate([p.pos for p in parts])
    np.testing.assert_array_equal(joined, soa.pos)


def test_extras_roundtrip(tmp_path):
    soa = gaussian_soa_with_seeds(list(range(6)))
    momentum = np.random.default_rng(0).normal(size=(6, 3)).astype(np.float32)
    save_sharded(str(tmp_path), soa, n_shards=2, extra={"momentum": momentum})
    back, extras = load_sharded(str(tmp_path))
    np.testing.assert_array_equal(extras["momentum"], momentum)
    half, extras_half = load_sharded(str(tmp_path), shard=1, n_shards=2)
    np.testing.assert_array_equal(extras_half["momentum"], momentum[3:])


def test_shard_requires_n_shards(tmp_path):
    soa = gaussian_soa_with_seeds([1, 2])
    save_sharded(str(tmp_path), soa, n_shards=1)
    with pytest.raises(ValueError, match="n_shards"):
        load_sharded(str(tmp_path), shard=0)
