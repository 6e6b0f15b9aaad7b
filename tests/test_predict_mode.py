"""The ``predict: true`` 27-neighborhood path vs the oracle.

The reference's -DPREDICT build replaces the 6-face ExtendedBlock with the
full 27-cell ExtendedBlock27 (``include/bgkoctomap/bgkblock.h:22-26``,
``CMakeLists.txt:19``).  Here that's the ``predict`` config flag, which
switches the bucketing neighborhood (``models/base.py`` →
``geometry.blocks.full_neighbor_offsets``) — a silent-wrong-answer risk in
the hot path if untested, since every per-(block, slot) table changes
shape with G=27.
"""

import dataclasses

import numpy as np

from la3dm_tpu.models.bgk import BGKOctoMap
from la3dm_tpu.models.gp import GPOctoMap
from tests.oracle.oracle_maps import OracleBGK, OracleGP
from tests.test_bgk_vs_oracle import CFG, compare_maps, synthetic_scan
from tests.test_families_vs_oracle import GP_CFG


def test_bgk_predict27_matches_oracle():
    rng = np.random.default_rng(3)
    cfg = dataclasses.replace(CFG, predict=True)
    fast = BGKOctoMap(cfg)
    oracle_map = OracleBGK(cfg)
    assert fast.num_slots == 27
    for i in range(2):
        cloud, origin = synthetic_scan(rng, n=80,
                                       origin=(0.1 + 0.3 * i, -0.2, 0.3))
        fast.insert_pointcloud(cloud, origin)
        oracle_map.insert_pointcloud(cloud, origin, cfg.ds_resolution,
                                     cfg.free_resolution, cfg.max_range)
    n, _ = compare_maps(fast, oracle_map, atol=5e-3)
    assert n > 500


def test_bgk_predict27_widens_support():
    """27-neighborhood must reach (±1,±1,±1)-diagonal blocks that the 6-face
    config cannot touch from a single-entry-block update."""
    cfg27 = dataclasses.replace(CFG, predict=True)
    m6 = BGKOctoMap(CFG)
    m27 = BGKOctoMap(cfg27)
    pts = np.array([[0.05, 0.05, 0.05]], np.float32)
    lab = np.ones(1, np.float32)
    m6.insert_training_data(pts, lab)
    m27.insert_training_data(pts, lab)
    c6 = {tuple(c) for c in m6.pool.coords[m6.pool.active_slots()]}
    c27 = {tuple(c) for c in m27.pool.coords[m27.pool.active_slots()]}
    assert c6 < c27
    assert (1, 1, 1) in c27 and (1, 1, 1) not in c6


def test_gp_predict27_matches_oracle():
    rng = np.random.default_rng(3)
    cfg = dataclasses.replace(GP_CFG, predict=True)
    fast = GPOctoMap(cfg)
    oracle_map = OracleGP(cfg)
    assert fast.num_slots == 27
    cloud, origin = synthetic_scan(rng, n=60)
    fast.insert_pointcloud(cloud, origin)
    oracle_map.insert_pointcloud(cloud, origin, cfg.ds_resolution,
                                 cfg.free_resolution, cfg.max_range)
    # GP f32 Cholesky roundoff amplified by 1/σ² BCM weights → relative
    # term, as in test_families_vs_oracle's GP cases; 27 fused models per
    # voxel (vs 7) add further reduction-order drift
    n, _ = compare_maps(fast, oracle_map, atol=5e-2, rtol=0.02)
    assert n > 200
