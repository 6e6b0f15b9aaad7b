"""RayCaster — cross-block DDA traversal over the voxel map.

The reference ships a RayCaster (bgkoctomap.h:91-214, 3-D Amanatides-Woo
stepping across block boundaries) that no executable uses; the only caller
is a commented-out demo (bgkloctomap_static_node.cpp:117-129).  Provided
here as a vectorized batch traversal: N rays advance in lockstep, each
reporting the first voxel whose state matches a target (default OCCUPIED)
plus the traversed cell count.
"""

from __future__ import annotations

import numpy as np

from la3dm_tpu.models import posterior


def raycast(m, origins: np.ndarray, directions: np.ndarray, max_range: float,
            target_state: int = posterior.OCCUPIED) -> dict:
    """Batched DDA over the map's base-resolution grid.

    Args:
      m: an OccupancyMapBase instance.
      origins: [N,3] ray origins.
      directions: [N,3] (normalized internally).
      max_range: traversal limit in meters.
      target_state: stop when a voxel of this state is hit.
    Returns dict with hit [N] bool, point [N,3], distance [N], steps [N].
    """
    res = m.cfg.resolution
    origins = np.atleast_2d(origins).astype(np.float64)
    d = np.atleast_2d(directions).astype(np.float64)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    N = len(origins)

    # current voxel index (global integer grid at base resolution, centered
    # frame: voxel i spans [i·res − res/2, i·res + res/2))
    idx = np.floor(origins / res + 0.5).astype(np.int64)
    step = np.where(d > 0, 1, -1).astype(np.int64)
    safe_d = np.where(np.abs(d) < 1e-12, 1e-12, d)
    # distance to the next voxel boundary per axis
    bound = (idx + (step > 0)) * res - res / 2.0
    t_max = (bound - origins) / safe_d
    t_max = np.where(np.abs(d) < 1e-12, np.inf, t_max)
    t_delta = np.abs(res / safe_d)

    hit = np.zeros(N, bool)
    dist = np.full(N, np.inf)
    steps = np.zeros(N, np.int64)
    active = np.ones(N, bool)
    t = np.zeros(N)

    max_steps = int(np.ceil(max_range / res) * 3 + 8)
    for _ in range(max_steps):
        if not active.any():
            break
        centers = idx[active] * res
        out = m.search(centers.astype(np.float32))
        found = out["state"] == target_state
        sel = np.nonzero(active)[0]
        newly = sel[found]
        hit[newly] = True
        dist[newly] = t[newly]
        active[newly] = False

        sel = np.nonzero(active)[0]
        if len(sel) == 0:
            break
        ax = np.argmin(t_max[sel], axis=1)
        rows = (sel, ax)
        t[sel] = t_max[rows]
        idx[rows] += step[rows]
        t_max[rows] += t_delta[rows]
        steps[sel] += 1
        active[sel] &= t[sel] <= max_range
    point = origins + d * np.minimum(dist, max_range)[:, None]
    return {"hit": hit, "point": point.astype(np.float32),
            "distance": dist.astype(np.float32), "steps": steps}
