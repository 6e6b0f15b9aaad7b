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


#: multiplicative hash constants (odd, int32 wrap on host and device alike)
_HC1 = np.int32(-1640531527)   # 2654435769 = 2^32/φ
_HC2 = np.int32(-862048943)    # 3432918353

#: bias matching geo.pack_key / the reference BlockHashKey (bgkblock.cpp:73-77)
_KB = 524288


def _split_keys(coords):
    """Block coords → two int32 keys (30 bits each; hi ≥ 0, −1 = empty)."""
    c = np.asarray(coords, np.int64) + _KB
    hi = ((c[..., 0] << 10) | (c[..., 1] >> 10)).astype(np.int32)
    lo = (((c[..., 1] & 1023) << 20) | c[..., 2]).astype(np.int32)
    return hi, lo


def _build_block_hash(coords: np.ndarray, slots: np.ndarray, cap: int):
    """Open-addressing (linear probe) block-coord → slot table, host-built.

    Sized at ≤50% load; returns (tab_hi, tab_lo, tab_slot, H, max_probes).
    Replaces the dense bbox grid: memory is O(active blocks) regardless of
    map extent, so a long diagonal trajectory cannot blow it up.
    """
    nb = len(coords)
    H = max(64, 1 << int(np.ceil(np.log2(max(2 * nb, 2)))))
    tab_hi = np.full(H, -1, np.int32)
    tab_lo = np.zeros(H, np.int32)
    tab_slot = np.full(H, cap, np.int32)
    hi, lo = _split_keys(coords)
    probe = ((hi * _HC1) ^ (lo * _HC2)) & np.int32(H - 1)
    remaining = np.arange(nb)
    max_probes = 0
    while len(remaining):
        max_probes += 1
        p = probe[remaining]
        order = np.argsort(p, kind="stable")
        first = np.concatenate([[True], p[order][1:] != p[order][:-1]])
        cand_rows = order[first]
        free = tab_hi[p[cand_rows]] == -1
        w = remaining[cand_rows[free]]
        tab_hi[probe[w]] = hi[w]
        tab_lo[probe[w]] = lo[w]
        tab_slot[probe[w]] = slots[w]
        placed = np.zeros(len(remaining), bool)
        placed[cand_rows[free]] = True
        remaining = remaining[~placed]
        probe[remaining] = (probe[remaining] + 1) & np.int32(H - 1)
    return tab_hi, tab_lo, tab_slot, H, max(max_probes, 1)


@functools.partial(
    jax.jit,
    static_argnames=("res", "bs", "n", "max_steps", "target", "max_range",
                     "max_probes"))
def _raycast_loop(state_tab, tab_hi, tab_lo, tab_slot, origins, d,
                  res: float, bs: float, n: int, max_steps: int,
                  target: int, max_range: float, max_probes: int):
    """One-dispatch Amanatides-Woo over the device-resident state tables.

    state_tab [cap+1, V] int8 (last row = UNKNOWN guard); tab_* [H] an
    open-addressing block-coord → pool-slot hash (hi == −1 ⇒ empty, slot ==
    cap ⇒ absent).  Semantics match :func:`raycast` (same voxel/block math
    as ``search``: nearest-block hashing + trunc local index).
    """
    N = origins.shape[0]
    resf = jnp.float32(res)
    half_n = jnp.float32(n) / 2.0
    cap = state_tab.shape[0] - 1
    H = tab_hi.shape[0]

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
        c32 = blk + jnp.int32(_KB)
        hi = (c32[:, 0] << 10) | (c32[:, 1] >> 10)
        lo = ((c32[:, 1] & 1023) << 20) | c32[:, 2]
        h = ((hi * _HC1) ^ (lo * _HC2)) & jnp.int32(H - 1)
        slot = jnp.full((N,), cap, jnp.int32)
        done = jnp.zeros((N,), bool)
        for j in range(max_probes):                 # static, short (≤~8)
            pos = (h + j) & jnp.int32(H - 1)
            match = (tab_hi[pos] == hi) & (tab_lo[pos] == lo)
            slot = jnp.where(~done & match, tab_slot[pos], slot)
            done = done | match | (tab_hi[pos] == -1)
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


class RaycastSnapshot:
    """Device-resident map snapshot for repeated raycast queries.

    Holds the int8 posterior state table ([cap+1, V]) and the hashed
    block-coord → slot table.  Build once (``raycast_snapshot``), query many
    times — a query-heavy consumer (frontier sweeps, visibility checks) pays
    the state materialization once per map version instead of per call.
    """

    def __init__(self, m):
        nb = m.pool.n_blocks
        cap = m.pool.capacity
        if nb:
            slots = m.pool.active_slots()
            coords = m.pool.coords[slots]
        else:
            slots = np.zeros(1, np.int32)
            coords = np.full((1, 3), 1 << 19, np.int64)  # out-of-map sentinel
        hi, lo, sl, H, maxp = _build_block_hash(coords, slots, cap)
        self.tab_hi = jnp.asarray(hi)
        self.tab_lo = jnp.asarray(lo)
        self.tab_slot = jnp.asarray(sl)
        # round the probe bound so snapshot rebuilds reuse the executable
        self.max_probes = max(4, 1 << int(np.ceil(np.log2(maxp))))
        vals = {k: v for k, v in m.pool.fields.items()}
        vals["touched"] = m.pool.touched
        # stored→raster: the DDA indexes voxels in raster order
        st = m._stored_to_raster_dev(m._state_fn(vals))   # [cap, V] int8
        self.state_tab = jnp.concatenate(
            [st, jnp.full((1, st.shape[1]), posterior.UNKNOWN, jnp.int8)])
        self.res = float(m.cfg.resolution)
        self.bs = float(m.block_size)
        self.n = int(m.n)


def raycast_snapshot(m) -> RaycastSnapshot:
    return RaycastSnapshot(m)


def raycast_device(m, origins: np.ndarray, directions: np.ndarray,
                   max_range: float,
                   target_state: int = posterior.OCCUPIED,
                   snapshot: RaycastSnapshot | None = None) -> dict:
    """Device-side batched DDA (same contract as :func:`raycast`).

    The map snapshot (int8 state table + hashed block→slot table, both
    O(active blocks) — no dense bbox grid) is built per call unless the
    caller passes a reusable ``snapshot``; the whole traversal then runs in
    one jitted dispatch.
    """
    origins = np.atleast_2d(origins).astype(np.float32)
    d = np.atleast_2d(directions).astype(np.float64)
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)

    s = snapshot if snapshot is not None else RaycastSnapshot(m)
    max_steps = int(np.ceil(max_range / s.res) * 3 + 8)
    hit, dist, steps = _raycast_loop(
        s.state_tab, s.tab_hi, s.tab_lo, s.tab_slot,
        jnp.asarray(origins), jnp.asarray(d),
        res=s.res, bs=s.bs, n=s.n,
        max_steps=max_steps, target=int(target_state),
        max_range=float(max_range), max_probes=s.max_probes)
    hit = np.asarray(hit)
    dist = np.asarray(dist)
    point = origins + d * np.minimum(dist, max_range)[:, None]
    return {"hit": hit, "point": point.astype(np.float32),
            "distance": dist, "steps": np.asarray(steps)}
