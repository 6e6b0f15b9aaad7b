"""Integration tests on the bundled reference datasets (sim_structured)."""

import os

import numpy as np
import pytest

from la3dm_tpu.io.pcd import load_pcd
from la3dm_tpu.models.bgk import BGKOctoMap
from la3dm_tpu.models.bgklv import BGKLVOctoMap
from la3dm_tpu.utils.config import load_dataset_config, load_method_config
from tests.conftest import REFERENCE_DATA
from tests.oracle.oracle_maps import OracleBGK

DATA = f"{REFERENCE_DATA}/sim_structured"
needs_data = pytest.mark.skipif(not os.path.exists(DATA), reason="reference data absent")


@needs_data
def test_bgk_real_scan_posterior_mae():
    """≤1e-2 mean-abs posterior-occupancy deviation vs reference semantics
    (BASELINE.md target) on a real scan, measured against the oracle."""
    cloud, origin = load_pcd(f"{DATA}/sim_structured_1.pcd")
    cloud = cloud[:1200]  # keep the oracle affordable
    cfg = load_method_config("bgk")
    fast = BGKOctoMap(cfg)
    fast.insert_pointcloud(cloud, origin, ds_resolution=cfg.resolution, max_range=8.0)
    om = OracleBGK(cfg)
    om.insert_pointcloud(cloud, origin, cfg.resolution, cfg.free_resolution, 8.0)

    slots = fast.pool.active_slots()
    slot_of = {tuple(c): s for c, s in zip(fast.pool.coords[slots], slots)}
    A = np.asarray(fast.pool.fields["A"])
    B = np.asarray(fast.pool.fields["B"])
    devs = []
    n_touched = 0
    for (bc, v), leaf in om.base_voxel_dict().items():
        if not leaf.classified:
            continue
        n_touched += 1
        s = slot_of[bc]
        p_ref = leaf.value[0] / (leaf.value[0] + leaf.value[1])
        p_ours = A[s, v] / (A[s, v] + B[s, v])
        devs.append(abs(float(p_ours - p_ref)))
    assert n_touched > 2000
    mae = float(np.mean(devs))
    assert mae < 1e-2, mae
    assert max(devs) < 1e-2, max(devs)


@needs_data
def test_bgklv_real_scan_smoke():
    """LV tile engine on a real scan: produces occupied structure."""
    cloud, origin = load_pcd(f"{DATA}/sim_structured_1.pcd")
    cfg = load_method_config("bgklv")
    m = BGKLVOctoMap(cfg)
    m.insert_pointcloud(cloud, origin, ds_resolution=cfg.resolution, max_range=8.0)
    leaves = m.leaves()
    n_occ = int((leaves["state"] == 1).sum())
    n_free = int((leaves["state"] == 0).sum())
    assert n_occ > 500, n_occ
    assert n_free > 5000, n_free


@needs_data
def test_save_load_roundtrip(tmp_path):
    cloud, origin = load_pcd(f"{DATA}/sim_structured_1.pcd")
    cfg = load_method_config("bgk")
    m = BGKOctoMap(cfg)
    m.insert_pointcloud(cloud, origin, ds_resolution=cfg.resolution, max_range=8.0)
    path = str(tmp_path / "map.npz")
    m.save(path)
    m2 = BGKOctoMap(cfg)
    m2.load(path)
    q = cloud[:64]
    out1, out2 = m.search(q), m2.search(q)
    np.testing.assert_allclose(out1["prob"], out2["prob"], atol=1e-7)
    np.testing.assert_array_equal(out1["state"], out2["state"])


@needs_data
def test_rosbag_replay_matches_pcd_scans():
    from la3dm_tpu.io.rosbag import replay

    bags = list(replay(f"{DATA}/sim_structured.bag"))
    assert len(bags) == 12
    pts, origin = bags[1]
    assert pts.shape == (3500, 3)
    # bag origins track the PCD VIEWPOINT origins
    _, pcd_origin = load_pcd(f"{DATA}/sim_structured_2.pcd")
    assert np.linalg.norm(origin - pcd_origin) < 0.2
