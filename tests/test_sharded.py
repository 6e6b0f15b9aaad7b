"""Sharded-vs-single-device equivalence on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from la3dm_tpu.models.bgk import BGKOctoMap
from la3dm_tpu.models.bgkl import BGKLOctoMap
from la3dm_tpu.models.bgklv import BGKLVOctoMap
from la3dm_tpu.models.gp import GPOctoMap
from la3dm_tpu.parallel import mesh as pm
from la3dm_tpu.parallel.sharded_map import (
    ShardedBGKOctoMap, ShardedBGKLOctoMap, ShardedBGKLVOctoMap, ShardedGPOctoMap)
from tests.test_bgk_vs_oracle import CFG, synthetic_scan
from tests.test_families_vs_oracle import BGKL_CFG, GP_CFG, LV_CFG


def _as_voxel_dict(m):
    slots = m.pool.active_slots()
    coords = m.pool.coords[slots]
    out = {}
    fields = {k: np.asarray(v)[slots] for k, v in m.pool.fields.items()}
    eff = np.asarray(m.pool.eff_level)[slots]
    for i, c in enumerate(coords):
        out[tuple(c)] = ({k: v[i] for k, v in fields.items()}, eff[i])
    return out


FAMILIES = [
    ((BGKOctoMap, ShardedBGKOctoMap), CFG),
    ((BGKLOctoMap, ShardedBGKLOctoMap), BGKL_CFG),
    ((BGKLVOctoMap, ShardedBGKLVOctoMap), LV_CFG),
    ((GPOctoMap, ShardedGPOctoMap), GP_CFG),
]


def _assert_maps_equal(single, sharded, cfg):
    dv_single = _as_voxel_dict(single)
    dv_sharded = _as_voxel_dict(sharded)
    assert set(dv_single) == set(dv_sharded)
    for c in dv_single:
        fs, es = dv_single[c]
        fh, eh = dv_sharded[c]
        if "m_ivar" in fs:
            # GP's BCM update (m_ivar += μ/σ², σ²→0 near training points)
            # amplifies f32 reduction-order drift without bound, so sharded
            # equivalence is asserted in posterior space — the quantity the
            # ≤1e-2 MAE acceptance criterion is defined on.
            for s_f, h_f in ((fs, fh),):
                p_s = 1.0 / (1.0 + np.exp(-cfg.l * s_f["m_ivar"] / (1.0 / cfg.min_var)))
                p_h = 1.0 / (1.0 + np.exp(-cfg.l * h_f["m_ivar"] / (1.0 / cfg.min_var)))
                np.testing.assert_allclose(p_s, p_h, atol=1e-3, err_msg=f"{c} prob")
                np.testing.assert_allclose(1.0 / s_f["ivar"], 1.0 / h_f["ivar"],
                                           atol=1e-3, rtol=1e-3, err_msg=f"{c} var")
        else:
            for k in fs:
                np.testing.assert_allclose(fs[k], fh[k], atol=1e-5, rtol=1e-5,
                                           err_msg=f"{c} {k}")
        np.testing.assert_array_equal(es, eh, err_msg=str(c))


@pytest.mark.parametrize("cls_pair,cfg", FAMILIES)
def test_sharded_matches_single(rng, cls_pair, cfg):
    single_cls, sharded_cls = cls_pair
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = pm.block_mesh(8)

    single = single_cls(cfg)
    sharded = sharded_cls(cfg, mesh=mesh, capacity=2048)
    for i in range(2):
        cloud, origin = synthetic_scan(rng, n=80, origin=(0.1, -0.2 + 0.3 * i, 0.3))
        single.insert_pointcloud(cloud, origin)
        sharded.insert_pointcloud(cloud, origin)

    _assert_maps_equal(single, sharded, cfg)

    # slots spread across device chunks
    slots = sharded.pool.active_slots()
    chunk = sharded.pool.chunk
    used_devices = {int(s) // chunk for s in slots}
    assert len(used_devices) == 8


def test_sharded_search_and_leaves(rng):
    mesh = pm.block_mesh(8)
    m = ShardedBGKOctoMap(CFG, mesh=mesh, capacity=2048)
    cloud, origin = synthetic_scan(rng, n=60)
    m.insert_pointcloud(cloud, origin)
    leaves = m.leaves()
    assert len(leaves["x"]) > 0
    out = m.search(cloud[:5])
    assert out["prob"].shape == (5,)


@pytest.mark.parametrize("cls_pair,cfg", FAMILIES)
def test_sharded_pool_growth(rng, cls_pair, cfg):
    """A sharded pool that starts too small reshards itself (double capacity,
    re-place every block) and still matches the single-device map per voxel.

    The scans go in as ONE batched insert_pointclouds call, so growth
    triggered by a later scan's ensure() remaps slot ids the engine already
    collected for earlier scans — the cross-table re-resolution path."""
    single_cls, sharded_cls = cls_pair
    mesh = pm.block_mesh(8)
    single = single_cls(cfg)
    sharded = sharded_cls(cfg, mesh=mesh, capacity=16)  # will grow
    clouds, origins = [], []
    for i in range(2):
        cloud, origin = synthetic_scan(rng, n=80, origin=(0.1, -0.2 + 0.3 * i, 0.3))
        clouds.append(cloud)
        origins.append(origin)
    single.insert_pointclouds(clouds, origins)
    sharded.insert_pointclouds(clouds, origins)
    assert sharded.pool.capacity > 16
    assert sharded.pool.capacity % 8 == 0
    assert sharded.pool.generation > 0

    _assert_maps_equal(single, sharded, cfg)


@pytest.mark.parametrize("cls_pair,cfg", FAMILIES)
def test_rebalance_preserves_state_and_flattens_load(rng, cls_pair, cfg):
    """Measured-load rebalance (reshard machinery): per-voxel state is
    preserved across the re-placement, stale slot ids are re-resolved by the
    generation protocol on the next insert, and the per-device touched-voxel
    load lands within the LPT bound (max ≤ mean + heaviest block)."""
    single_cls, sharded_cls = cls_pair
    mesh = pm.block_mesh(8)
    single = single_cls(cfg)
    sharded = sharded_cls(cfg, mesh=mesh, capacity=2048)
    for i in range(2):
        cloud, origin = synthetic_scan(rng, n=80, origin=(0.1, -0.2 + 0.3 * i, 0.3))
        single.insert_pointcloud(cloud, origin)
        sharded.insert_pointcloud(cloud, origin)
        gen = sharded.pool.generation
        sharded.rebalance()   # between scans, as a long-running server would
        assert sharded.pool.generation == gen + 1

    _assert_maps_equal(single, sharded, cfg)

    block_load = np.asarray(sharded.pool.touched).sum(axis=1).astype(np.float64)
    per_dev = block_load.reshape(8, -1).sum(axis=1)
    assert per_dev.max() <= per_dev.mean() + block_load.max() + 1e-9
