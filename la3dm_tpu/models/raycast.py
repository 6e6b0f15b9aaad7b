"""RayCaster — cross-block DDA traversal over the voxel map.

The reference ships a RayCaster (bgkoctomap.h:91-214, 3-D Amanatides-Woo
stepping across block boundaries) that no executable uses; the only caller
is a commented-out demo (bgkloctomap_static_node.cpp:117-129).  Two batch
implementations, N rays advancing in lockstep, each reporting the first
voxel whose state matches a target (default OCCUPIED):

* :func:`raycast` — host numpy, stepping against ``map.search``;
* :func:`raycast_device` — fully on-device: the map's posterior STATE table
  and a dense block-coord → pool-slot grid live on device, and the whole
  Amanatides-Woo loop runs under one jit (``lax.fori_loop``), so casting a
  million rays costs one dispatch instead of max_steps × search round trips.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from la3dm_tpu.geometry import blocks as geo
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


@functools.partial(
    jax.jit,
    static_argnames=("res", "bs", "n", "max_steps", "target", "max_range"))
def _raycast_loop(state_tab, slot_grid, grid_lo, origins, d,
                  res: float, bs: float, n: int, max_steps: int,
                  target: int, max_range: float):
    """One-dispatch Amanatides-Woo over the device-resident state tables.

    state_tab [cap+1, V] int8 (last row = UNKNOWN guard); slot_grid
    [ex, ey, ez] int32 block coord → pool slot (cap ⇒ absent), offset by
    grid_lo [3].  Semantics match :func:`raycast` (same voxel/block math as
    ``search``: nearest-block hashing + trunc local index).
    """
    N = origins.shape[0]
    resf = jnp.float32(res)
    half_n = jnp.float32(n) / 2.0
    cap = state_tab.shape[0] - 1
    ext = jnp.asarray(slot_grid.shape, jnp.int32)

    idx0 = jnp.floor(origins / resf + 0.5).astype(jnp.int32)
    step = jnp.where(d > 0, 1, -1).astype(jnp.int32)
    tiny = jnp.abs(d) < 1e-12
    safe_d = jnp.where(tiny, 1e-12, d)
    bound = (idx0 + (step > 0)).astype(jnp.float32) * resf - resf / 2.0
    t_max0 = jnp.where(tiny, jnp.inf, (bound - origins) / safe_d)
    t_delta = jnp.abs(resf / safe_d)

    def state_at(idx):
        p = idx.astype(jnp.float32) * resf                        # voxel center
        blk = jnp.floor(p / jnp.float32(bs) + 0.5).astype(jnp.int32)
        g = blk - grid_lo[None, :]
        inside = jnp.all((g >= 0) & (g < ext[None, :]), axis=-1)
        gc = jnp.clip(g, 0, ext[None, :] - 1)
        slot = slot_grid[gc[:, 0], gc[:, 1], gc[:, 2]]
        slot = jnp.where(inside, slot, cap)
        # local index via the same f32 expression as search() →
        # point_to_voxel_index: trunc((p − center)/res + n/2), center in f32
        c = blk.astype(jnp.float32) * jnp.float32(bs)
        v = jnp.clip(((p - c) / resf + half_n).astype(jnp.int32), 0, n - 1)
        vi = v[:, 0] + v[:, 1] * n + v[:, 2] * n * n
        return state_tab[jnp.minimum(slot, cap), vi]

    def body(_, carry):
        idx, t_max, t, hit, dist, steps, active = carry
        st = state_at(idx)
        found = active & (st == target)
        hit = hit | found
        dist = jnp.where(found, t, dist)
        active = active & ~found
        ax = jnp.argmin(t_max, axis=1)
        t_new = t_max[jnp.arange(N), ax]
        adv = active
        t = jnp.where(adv, t_new, t)
        bump = jax.nn.one_hot(ax, 3, dtype=jnp.int32) * step
        idx = jnp.where(adv[:, None], idx + bump, idx)
        t_max = jnp.where(adv[:, None],
                          t_max + jax.nn.one_hot(ax, 3, dtype=jnp.float32) * t_delta,
                          t_max)
        steps = jnp.where(adv, steps + 1, steps)
        active = adv & (t <= jnp.float32(max_range))
        return idx, t_max, t, hit, dist, steps, active

    init = (idx0, t_max0, jnp.zeros(N, jnp.float32),
            jnp.zeros(N, bool), jnp.full(N, jnp.inf, jnp.float32),
            jnp.zeros(N, jnp.int32), jnp.ones(N, bool))
    idx, t_max, t, hit, dist, steps, active = jax.lax.fori_loop(
        0, max_steps, body, init)
    return hit, dist, steps


def raycast_device(m, origins: np.ndarray, directions: np.ndarray,
                   max_range: float,
                   target_state: int = posterior.OCCUPIED) -> dict:
    """Device-side batched DDA (same contract as :func:`raycast`).

    Builds a per-call snapshot: the map's int8 state table ([cap+1, V], the
    family's posterior state fn applied on device) and a dense block-coord →
    slot grid over the active blocks' bbox, then runs the whole traversal in
    one jitted dispatch.
    """
    res = m.cfg.resolution
    origins = np.atleast_2d(origins).astype(np.float32)
    d = np.atleast_2d(directions).astype(np.float64)
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)

    nb = m.pool.n_blocks
    cap = m.pool.capacity
    coords = m.pool.coords[m.pool.active_slots()] if nb else np.zeros((1, 3), np.int64)
    lo = coords.min(0)
    ext = (coords.max(0) - lo + 1).astype(np.int64)
    slot_grid = np.full(tuple(ext), cap, np.int32)
    if nb:
        slots = m.pool.active_slots()
        g = m.pool.coords[slots] - lo
        slot_grid[g[:, 0], g[:, 1], g[:, 2]] = slots

    vals = {k: v for k, v in m.pool.fields.items()}
    vals["touched"] = m.pool.touched
    st = m._state_fn(vals)                                        # [cap, V] int8
    state_tab = jnp.concatenate(
        [st, jnp.full((1, st.shape[1]), posterior.UNKNOWN, jnp.int8)])

    max_steps = int(np.ceil(max_range / res) * 3 + 8)
    hit, dist, steps = _raycast_loop(
        state_tab, jnp.asarray(slot_grid), jnp.asarray(lo.astype(np.int32)),
        jnp.asarray(origins), jnp.asarray(d),
        res=float(res), bs=float(m.block_size), n=int(m.n),
        max_steps=max_steps, target=int(target_state),
        max_range=float(max_range))
    hit = np.asarray(hit)
    dist = np.asarray(dist)
    point = origins + d * np.minimum(dist, max_range)[:, None]
    return {"hit": hit, "point": point.astype(np.float32),
            "distance": dist, "steps": np.asarray(steps)}
