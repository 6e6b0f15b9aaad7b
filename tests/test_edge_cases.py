"""Degenerate-input robustness: empty scans, out-of-range clouds, NaNs,
single points.  The reference tolerates these implicitly (PCL filters,
loops over empty vectors); the engines must not crash or corrupt state."""

import numpy as np
import pytest

from la3dm_tpu.models.bgk import BGKOctoMap
from la3dm_tpu.models.bgkl import BGKLOctoMap
from la3dm_tpu.models.bgklv import BGKLVOctoMap
from la3dm_tpu.models.gp import GPOctoMap
from la3dm_tpu.utils.config import MapConfig

CFGS = {
    BGKOctoMap: MapConfig(method="bgk", resolution=0.1, block_depth=3,
                          sf2=1.0, ell=0.2, max_range=6.0),
    BGKLOctoMap: MapConfig(method="bgkl", resolution=0.1, block_depth=3,
                           sf2=0.1, ell=0.2, max_range=6.0),
    BGKLVOctoMap: MapConfig(method="bgklv", resolution=0.1, block_depth=3,
                            sf2=0.1, ell=0.2, min_W=0.001, max_range=6.0),
    GPOctoMap: MapConfig(method="gp", resolution=0.1, block_depth=3, sf2=1.0,
                         ell=1.0, noise=0.01, l=100.0, min_var=0.001,
                         max_var=1000.0, max_known_var=0.02, max_range=6.0),
}
ORIGIN = np.zeros(3, np.float32)


@pytest.mark.parametrize("cls", list(CFGS))
def test_empty_cloud(cls):
    m = cls(CFGS[cls])
    m.insert_pointcloud(np.zeros((0, 3), np.float32), ORIGIN)
    assert m.pool.n_blocks == 0
    out = m.search(np.array([[0.0, 0.0, 0.0]], np.float32))
    assert not out["touched"][0]


@pytest.mark.parametrize("cls", list(CFGS))
def test_all_out_of_range(cls):
    """Every hit beyond max_range: BGK/GP drop them entirely; BGKL/LV keep
    the free ray clipped at max_range (the reference's over-range handling)."""
    m = cls(CFGS[cls])
    cloud = np.full((50, 3), 50.0, np.float32)
    m.insert_pointcloud(cloud, ORIGIN)  # must not crash
    leaves = m.leaves()
    assert (leaves["state"] != 1).all()  # nothing occupied


@pytest.mark.parametrize("cls", list(CFGS))
def test_nan_points_filtered(cls):
    m = cls(CFGS[cls])
    cloud = np.array([[2.0, 0.0, 0.5], [np.nan, 0.0, 0.0],
                      [2.0, 0.2, 0.5], [np.inf, 1.0, 1.0]], np.float32)
    m.insert_pointcloud(cloud, ORIGIN)
    leaves = m.leaves()
    assert np.isfinite(leaves["prob"][leaves["state"] != 2]).all()


@pytest.mark.parametrize("cls", [BGKOctoMap, BGKLVOctoMap])
def test_single_point(cls):
    m = cls(CFGS[cls])
    m.insert_pointcloud(np.array([[1.0, 0.5, 0.3]], np.float32), ORIGIN)
    out = m.search(np.array([[1.0, 0.5, 0.3]], np.float32))
    assert out["touched"][0]
    assert out["prob"][0] > 0.5


def test_batched_empty_mixed():
    """insert_pointclouds with a mix of empty and real scans."""
    m = BGKOctoMap(CFGS[BGKOctoMap])
    clouds = [np.zeros((0, 3), np.float32),
              np.array([[1.0, 0.0, 0.3]], np.float32),
              np.zeros((0, 3), np.float32)]
    m.insert_pointclouds(clouds, [ORIGIN] * 3)
    assert m.pool.n_blocks > 0
