"""Golden tests: BGKL, BGKLV, GP fast paths vs the numpy oracle."""

import numpy as np
import pytest

from la3dm_tpu.models.bgkl import BGKLOctoMap
from la3dm_tpu.models.bgklv import BGKLVOctoMap
from la3dm_tpu.models.gp import GPOctoMap
from la3dm_tpu.utils.config import MapConfig
from tests.oracle.oracle_maps import OracleBGKL, OracleBGKLV, OracleGP
from tests.test_bgk_vs_oracle import compare_maps, synthetic_scan

BGKL_CFG = MapConfig(method="bgkl", resolution=0.1, block_depth=3, sf2=0.1, ell=0.2,
                     free_resolution=0.3, ds_resolution=0.1, free_thresh=0.3,
                     occupied_thresh=0.7, var_thresh=0.15, prior_A=0.001, prior_B=0.001,
                     max_range=8.0)

LV_CFG = MapConfig(method="bgklv", resolution=0.1, block_depth=3, sf2=0.1, ell=0.2,
                   free_resolution=0.1, ds_resolution=0.1, free_thresh=0.3,
                   occupied_thresh=0.7, var_thresh=0.2, prior_A=0.001, prior_B=0.001,
                   min_W=0.001, max_range=8.0)

GP_CFG = MapConfig(method="gp", resolution=0.1, block_depth=3, sf2=1.0, ell=1.0,
                   free_resolution=0.5, ds_resolution=0.1, free_thresh=0.3,
                   occupied_thresh=0.7, noise=0.01, l=100.0, min_var=0.001,
                   max_var=1000.0, max_known_var=0.02, max_range=8.0)


def test_bgkl_single_scan(rng):
    cloud, origin = synthetic_scan(rng, n=60)
    fast = BGKLOctoMap(BGKL_CFG)
    fast.insert_pointcloud(cloud, origin)
    om = OracleBGKL(BGKL_CFG)
    om.insert_pointcloud(cloud, origin, BGKL_CFG.ds_resolution, BGKL_CFG.free_resolution,
                         BGKL_CFG.max_range)
    n, dev = compare_maps(fast, om, atol=3e-3)
    assert n > 300


def test_bgkl_multi_scan(rng):
    fast, om = BGKLOctoMap(BGKL_CFG), OracleBGKL(BGKL_CFG)
    for i in range(2):
        cloud, origin = synthetic_scan(rng, n=50, origin=(0.1, -0.2 + 0.4 * i, 0.3))
        fast.insert_pointcloud(cloud, origin)
        om.insert_pointcloud(cloud, origin, BGKL_CFG.ds_resolution, BGKL_CFG.free_resolution,
                             BGKL_CFG.max_range)
    compare_maps(fast, om, atol=5e-3)


def test_bgklv_single_scan(rng):
    cloud, origin = synthetic_scan(rng, n=60)
    fast = BGKLVOctoMap(LV_CFG)
    fast.insert_pointcloud(cloud, origin)
    om = OracleBGKLV(LV_CFG)
    om.insert_pointcloud(cloud, origin, LV_CFG.ds_resolution, LV_CFG.free_resolution,
                         LV_CFG.max_range)
    n, dev = compare_maps(fast, om, atol=3e-3, touched_mass_tol=5e-3)
    assert n > 300


def test_bgklv_multi_scan(rng):
    fast, om = BGKLVOctoMap(LV_CFG), OracleBGKLV(LV_CFG)
    for i in range(2):
        cloud, origin = synthetic_scan(rng, n=40, origin=(0.1, -0.2 + 0.4 * i, 0.3))
        fast.insert_pointcloud(cloud, origin)
        om.insert_pointcloud(cloud, origin, LV_CFG.ds_resolution, LV_CFG.free_resolution,
                             LV_CFG.max_range)
    compare_maps(fast, om, atol=5e-3, touched_mass_tol=5e-3)


def test_gp_single_scan(rng):
    cloud, origin = synthetic_scan(rng, n=40)
    fast = GPOctoMap(GP_CFG)
    fast.insert_pointcloud(cloud, origin)
    om = OracleGP(GP_CFG)
    om.insert_pointcloud(cloud, origin, GP_CFG.ds_resolution, GP_CFG.free_resolution,
                         GP_CFG.max_range)
    # GP float32 Cholesky roundoff is amplified by the 1/σ² BCM weights
    # (σ² ≈ noise near training points); compare with a relative term
    n, dev = compare_maps(fast, om, atol=5e-2, rtol=0.02)
    assert n > 300


def test_gp_multi_scan(rng):
    fast, om = GPOctoMap(GP_CFG), OracleGP(GP_CFG)
    for i in range(2):
        cloud, origin = synthetic_scan(rng, n=30, origin=(0.1, -0.2 + 0.4 * i, 0.3))
        fast.insert_pointcloud(cloud, origin)
        om.insert_pointcloud(cloud, origin, GP_CFG.ds_resolution, GP_CFG.free_resolution,
                             GP_CFG.max_range)
    compare_maps(fast, om, atol=1e-1, rtol=0.05)
