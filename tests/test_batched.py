"""Multi-scan batched integration == sequential per-scan integration.

The batched path (``insert_pointclouds``) claims exactness up to float32
sum reassociation for prune-free configs: Beta updates are additive
scatter-adds gated per (scan, voxel) (bgklvoctomap.cpp:236-238, :271-272).
These tests integrate the same real scans both ways and compare the full
pool state.
"""

import numpy as np
import pytest

from tests.conftest import reference_scan


def _scans(n, dataset="sim_structured"):
    return [reference_scan(dataset, i) for i in range(1, n + 1)]


def _pool_state(m):
    slots = m.pool.active_slots()
    keys = {tuple(c): i for i, c in enumerate(m.pool.coords[slots])}
    fields = {k: np.asarray(v)[slots] for k, v in m.pool.fields.items()}
    fields["touched"] = np.asarray(m.pool.touched)[slots]
    return keys, fields


def _compare(m_seq, m_bat, atol):
    k1, f1 = _pool_state(m_seq)
    k2, f2 = _pool_state(m_bat)
    assert set(k1) == set(k2)
    order1 = [k1[c] for c in sorted(k1)]
    order2 = [k2[c] for c in sorted(k2)]
    for name in f1:
        a = f1[name][order1].astype(np.float64)
        b = f2[name][order2].astype(np.float64)
        dev = np.abs(a - b).max()
        assert dev <= atol, f"{name}: max dev {dev}"


def test_bgklv_batched_equals_sequential():
    from la3dm_tpu.models.bgklv import BGKLVOctoMap
    from la3dm_tpu.utils.config import load_method_config

    cfg = load_method_config("bgklv")
    scans = _scans(3)
    m_seq = BGKLVOctoMap(cfg)
    for cloud, origin in scans:
        m_seq.insert_pointcloud(cloud, origin, ds_resolution=cfg.resolution,
                                max_range=6.0)
    m_bat = BGKLVOctoMap(cfg)
    m_bat.insert_pointclouds([c for c, _ in scans], [o for _, o in scans],
                             ds_resolution=cfg.resolution, max_range=6.0)
    # identical kernel values, reassociated sums only
    _compare(m_seq, m_bat, atol=5e-4)


def test_bgklv_batched_original_size_fallback():
    """original_size ⇒ pruning between scans ⇒ batched must fall back and
    remain bit-identical to the sequential loop."""
    import dataclasses

    from la3dm_tpu.models.bgklv import BGKLVOctoMap
    from la3dm_tpu.utils.config import load_method_config

    cfg = dataclasses.replace(load_method_config("bgklv"), original_size=True)
    scans = _scans(2)
    m_seq = BGKLVOctoMap(cfg)
    for cloud, origin in scans:
        m_seq.insert_pointcloud(cloud, origin, ds_resolution=cfg.resolution,
                                max_range=6.0)
    m_bat = BGKLVOctoMap(cfg)
    m_bat.insert_pointclouds([c for c, _ in scans], [o for _, o in scans],
                             ds_resolution=cfg.resolution, max_range=6.0)
    _compare(m_seq, m_bat, atol=0.0)


@pytest.mark.parametrize("method", ["bgk", "bgkl"])
def test_bgk_family_batched_equals_sequential(method):
    """The BGK-family seq engine lax.scans over scans on device, applying
    each scan's gate/update/prune in order — including prune-BETWEEN-scans
    (default block_depth 3), so eff_level state must match the sequential
    loop too."""
    from la3dm_tpu.pipeline import MAP_CLASSES
    from la3dm_tpu.utils.config import load_method_config

    cfg = load_method_config(method)
    scans = _scans(4)
    cls = MAP_CLASSES[method]
    m_seq = cls(cfg)
    for cloud, origin in scans:
        m_seq.insert_pointcloud(cloud, origin, ds_resolution=cfg.resolution)
    m_bat = cls(cfg)
    m_bat.insert_pointclouds([c for c, _ in scans], [o for _, o in scans],
                             ds_resolution=cfg.resolution)
    k1, f1 = _pool_state(m_seq)
    k2, f2 = _pool_state(m_bat)
    assert set(k1) == set(k2)
    order1 = [k1[c] for c in sorted(k1)]
    order2 = [k2[c] for c in sorted(k2)]
    # same engine both ways (K=1 vs K=4) ⇒ identical sums, zero tolerance;
    # eff_level equality proves per-scan pruning ran identically
    e1 = np.asarray(m_seq.pool.eff_level)[m_seq.pool.active_slots()][order1]
    e2 = np.asarray(m_bat.pool.eff_level)[m_bat.pool.active_slots()][order2]
    assert np.array_equal(e1, e2)
    for name in f1:
        a = f1[name][order1]
        b = f2[name][order2]
        assert np.array_equal(a, b), name


def test_gp_batched_equals_sequential():
    """GP sequence engine: per-scan sequential BCM + prune on device must
    match the per-scan loop exactly (same executable both ways)."""
    from la3dm_tpu.models.gp import GPOctoMap
    from la3dm_tpu.utils.config import load_method_config

    cfg = load_method_config("gp")
    scans = _scans(3, dataset="sim_unstructured")
    m_seq = GPOctoMap(cfg)
    for cloud, origin in scans:
        m_seq.insert_pointcloud(cloud, origin, ds_resolution=cfg.resolution,
                                max_range=8.0)
    m_bat = GPOctoMap(cfg)
    m_bat.insert_pointclouds([c for c, _ in scans], [o for _, o in scans],
                             ds_resolution=cfg.resolution, max_range=8.0)
    k1, f1 = _pool_state(m_seq)
    k2, f2 = _pool_state(m_bat)
    assert set(k1) == set(k2)
    order1 = [k1[c] for c in sorted(k1)]
    order2 = [k2[c] for c in sorted(k2)]
    e1 = np.asarray(m_seq.pool.eff_level)[m_seq.pool.active_slots()][order1]
    e2 = np.asarray(m_bat.pool.eff_level)[m_bat.pool.active_slots()][order2]
    assert np.array_equal(e1, e2)
    for name in f1:
        assert np.array_equal(f1[name][order1], f2[name][order2]), name


def test_gp_dense_block_tier():
    """A single dense (4,000-point) block + many small ones exercises the
    overflow tier without padding every model to the max (gpregressor.h:42-51
    trains per-block systems of wildly varying size)."""
    from la3dm_tpu.models.gp import GPOctoMap
    from la3dm_tpu.utils.config import load_method_config

    cfg = load_method_config("gp")
    rng = np.random.default_rng(0)
    bs = cfg.block_size
    dense = (rng.random((4000, 3)) * bs * 0.9).astype(np.float32)
    sparse = (rng.random((400, 3)) * bs * 8 + np.float32([2 * bs, 0, 0])).astype(np.float32)
    pts = np.concatenate([dense, sparse])
    labels = np.where(rng.random(len(pts)) < 0.5, 1.0, -1.0).astype(np.float32)
    m = GPOctoMap(cfg)
    m.insert_training_data(pts, labels)
    assert m.pool.n_blocks > 0
    leaves = m.leaves()
    assert np.isfinite(leaves["prob"][leaves["state"] != 0]).all()


def test_bgk_chunked_long_sequence_equals_sequential():
    """A sequence longer than the per-dispatch scan budget exercises the
    chunk boundary: buffered futures drain into multiple dispatches, each
    resuming from the previous chunk's pool state.  Must equal the
    sequential loop up to f32 reassociation."""
    from la3dm_tpu.models import bgk as B
    from la3dm_tpu.utils.config import load_method_config

    assert B._SCAN_BATCH == 16
    cfg = load_method_config("bgk")
    base = _scans(9)
    scans = base + base  # 18 scans → chunks of 16 + 2
    m_seq = B.BGKOctoMap(cfg)
    for cloud, origin in scans:
        m_seq.insert_pointcloud(cloud, origin, ds_resolution=cfg.resolution,
                                max_range=6.0)
    m_bat = B.BGKOctoMap(cfg)
    m_bat.insert_pointclouds([c for c, _ in scans], [o for _, o in scans],
                             ds_resolution=cfg.resolution, max_range=6.0)
    _compare(m_seq, m_bat, atol=5e-4)
    assert m_bat.pool.eff_level.dtype == m_seq.pool.eff_level.dtype
    np.testing.assert_array_equal(
        np.asarray(m_seq.pool.eff_level[: m_seq.pool.n_blocks]),
        np.asarray(m_bat.pool.eff_level[: m_bat.pool.n_blocks]))


def test_bgklv_chunked_long_sequence_equals_sequential():
    from la3dm_tpu.models import bgklv as LV
    from la3dm_tpu.utils.config import load_method_config

    assert LV._SCAN_BATCH == 12
    cfg = load_method_config("bgklv")
    base = _scans(7)
    scans = base + base  # 14 scans → chunks of 12 + 2
    m_seq = LV.BGKLVOctoMap(cfg)
    for cloud, origin in scans:
        m_seq.insert_pointcloud(cloud, origin, ds_resolution=cfg.resolution,
                                max_range=6.0)
    m_bat = LV.BGKLVOctoMap(cfg)
    m_bat.insert_pointclouds([c for c, _ in scans], [o for _, o in scans],
                             ds_resolution=cfg.resolution, max_range=6.0)
    _compare(m_seq, m_bat, atol=5e-4)
