"""BGKLVOctoMap — evidence-mass occupancy with per-voxel ℓ-ball inference.

Reference (``src/bgklvoctomap/bgklvoctomap.cpp:89-285``): every block in the
scan's bbox is materialized; each *base-resolution* leaf queries the R-tree
in an axis-aligned ±ℓ cube around its center (:152-171), builds a per-voxel
training set (hits as degenerate segments + per-voxel-deduplicated free
rays, :176-207), and runs a single-test-point BGKLV predict with gate
k̄ > 0.001 (:236-238).  Leaves above base resolution are skipped (:157-160);
pruning only runs with original_size (:271-272).

TPU design — the **tile engine**: the reference's O(voxels) tiny GEMVs
become dense masked products over 8³-voxel tiles.  Each tile carries the
indices of the rays/hits whose R-tree proxy samples fall in the tile's
ℓ-halo; tiles are tiered by entry count so near-sensor tiles don't inflate
the padding of the whole map.  Ray-sample cube membership is evaluated in
closed form (interval arithmetic over the beam's sample grid) instead of
materializing proxy samples.  Scatters address the pool as a flat
[capacity·V] array.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from la3dm_tpu.geometry import blocks as geo, preprocess
from la3dm_tpu.kernels import math as km
from la3dm_tpu.models import base, posterior, pruning
from la3dm_tpu.utils.config import MapConfig

# ray/hit-count tiers: fixed ladder so the jitted step compiles once per tier
_TIERS = (32, 128, 512, 2048, 8192)

# monotone pad sizes shared across map instances with the same config
_GLOBAL_PADS: dict = {}


def _ray_membership(vox, rays, rays_valid, free_res, ell):
    """[V,R] bool: does any R-tree proxy sample of ray r lie in vox v's ±ℓ cube?

    The reference inserts, per free ray, its origin plus backward beam samples
    at d ∈ {l − k·fr > 0} and queries the closed cube (bgklvoctomap.cpp:
    121-124, 152-171, beam_sample :431-447).  Samples lie on the segment, so
    cube membership reduces to interval arithmetic: intersect the cube's
    per-axis d-intervals, then ask whether an integer k lands inside — O(1)
    per (voxel, ray) instead of per sample.
    """
    ellf = jnp.float32(ell)
    fr = jnp.float32(free_res)
    a = rays[:, 0:3]                       # free origin (the d = 0 sample)
    b = rays[:, 3:6]
    u = b - a                              # [R,3]
    l = jnp.linalg.norm(u, axis=-1)        # [R]
    nd = u / jnp.maximum(l, 1e-30)[:, None]

    lo = (vox - ellf)[:, None, :]          # [V,1,3]
    hi = (vox + ellf)[:, None, :]

    in_a = jnp.all((a[None] >= lo) & (a[None] <= hi), axis=-1)  # [V,R]

    n_ = nd[None, :, :]                    # [1,R,3]
    a_ = a[None, :, :]
    safe_n = jnp.where(jnp.abs(n_) < 1e-12, 1.0, n_)
    t0 = (lo - a_) / safe_n
    t1 = (hi - a_) / safe_n
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    flat = jnp.abs(n_) < 1e-12
    slab_ok = (a_ >= lo) & (a_ <= hi)
    tmin = jnp.where(flat, jnp.where(slab_ok, -jnp.inf, jnp.inf), tmin)
    tmax = jnp.where(flat, jnp.where(slab_ok, jnp.inf, -jnp.inf), tmax)
    dlo = jnp.max(tmin, axis=-1)           # [V,R]
    dhi = jnp.min(tmax, axis=-1)

    lr = l[None, :]
    k_min = jnp.maximum(jnp.ceil((lr - dhi) / fr), 1.0)
    k_max = jnp.minimum(jnp.floor((lr - jnp.maximum(dlo, 0.0)) / fr),
                        jnp.ceil(lr / fr) - 1.0)  # d_k > 0
    in_beam = (k_min <= k_max) & (dhi >= dlo)
    return (in_a | in_beam) & rays_valid[None, :]


@functools.partial(
    jax.jit,
    static_argnames=("V", "Rt", "Ht", "sf2", "ell", "free_res", "gate"),
    donate_argnames=("A", "Bv", "touched"),
)
def _lv_tile_step(A, Bv, touched, eff, slots, pos_id, block_centers,
                  tile_vox_map, vox_base,
                  rays, hits, ray_ids, r_start, r_count, hit_ids, h_start, h_count,
                  V: int, Rt: int, Ht: int,
                  sf2: float, ell: float, free_res: float, gate: float):
    """One tier's tile batch: per-voxel LV inference + flat scatter.

    A/Bv/touched/eff: flat [capacity·V] pool views (eff read-only).
    slots [T] pool block slots (== capacity ⇒ padding), pos_id [T] tile
    position within block; tile_vox_map [tpb,Vt] and vox_base [V,3] are
    device-resident constants — flat addresses and voxel offsets are
    reconstructed on device to keep the per-scan transfer small.
    rays [R,6] / hits [H,3]: this scan's global entries (sentinel last row).
    ray_ids/hit_ids: flat tile-sorted entry-id tables (shared by all tiers,
    shipped once per scan); r_/h_start+count [T]: this tier's contiguous
    segments into them — the padded [T,Rt]/[T,Ht] index matrices are built
    on device instead of filled and shipped per tier.
    """
    ellf = jnp.float32(ell)
    vox_map = tile_vox_map[pos_id]                             # [T,Vt]
    flat_idx = slots[:, None].astype(jnp.int64) * V + vox_map  # padding ⇒ ≥ len

    rcol = jnp.arange(Rt, dtype=jnp.int32)[None, :]
    ray_valid = rcol < r_count[:, None]                        # [T,Rt]
    ray_idx = ray_ids[jnp.minimum(r_start[:, None] + rcol, ray_ids.shape[0] - 1)]
    hcol = jnp.arange(Ht, dtype=jnp.int32)[None, :]
    hit_valid = hcol < h_count[:, None]                        # [T,Ht]
    hit_idx = hit_ids[jnp.minimum(h_start[:, None] + hcol, hit_ids.shape[0] - 1)]

    def per_tile(args):
        vmap_row, ctr, ridx, rmask, hidx, hmask = args
        vox = ctr[None, :] + vox_base[vmap_row]                # [Vt,3]
        rv = rays[ridx]                                        # [Rt,6]
        hv = hits[hidx]                                        # [Ht,3]

        lo = vox - ellf
        hi = vox + ellf
        member_h = jnp.all(
            (hv[None, :, :] >= lo[:, None, :]) & (hv[None, :, :] <= hi[:, None, :]),
            axis=-1) & hmask[None, :]
        dh = km.pairwise_dist(vox, hv)
        Kh = jnp.where(member_h, km.sparse_kernel_lv(dh / ellf, sf2), 0.0)

        member_r = _ray_membership(vox, rv, rmask, free_res, ell)
        dr = km.point_to_segment_dist(vox, rv)
        Kr = jnp.where(member_r, km.sparse_kernel_lv(dr / ellf, sf2), 0.0)

        ybar = jnp.sum(Kh, axis=1)
        kbar = ybar + jnp.sum(Kr, axis=1)
        return ybar, kbar

    # chunked vmap: lax.map's per-iteration overhead dwarfs a single tile's
    # work; batch tiles and let lax.map step over chunks.  Chunk size scales
    # inversely with the tier's ray width to bound the [chunk,Vt,Rt] live set.
    T = vox_map.shape[0]
    chunk = min(max(16384 // max(ray_idx.shape[1], 1), 1), 32, T)
    while T % chunk:
        chunk //= 2
    nchunk = T // chunk

    def rc(x):
        return x.reshape(nchunk, chunk, *x.shape[1:])

    ybar, kbar = jax.lax.map(
        lambda args: jax.vmap(lambda *a: per_tile(a))(*args),
        tuple(rc(x) for x in (vox_map, block_centers,
                              ray_idx, ray_valid, hit_idx, hit_valid)))
    ybar = ybar.reshape(T, -1)
    kbar = kbar.reshape(T, -1)                                  # [T,Vt]

    g = kbar > jnp.float32(gate)
    live = eff[jnp.minimum(flat_idx, eff.shape[0] - 1)] == 0   # base leaves only
    g = g & live
    fi = flat_idx.reshape(-1)
    A = A.at[fi].add(jnp.where(g, ybar, 0.0).reshape(-1), mode="drop")
    Bv = Bv.at[fi].add(jnp.where(g, kbar - ybar, 0.0).reshape(-1), mode="drop")
    touched = touched.at[fi].max(g.reshape(-1), mode="drop")
    return A, Bv, touched


def _halo_blocks(points: np.ndarray, cell: float, halo: float) -> tuple[np.ndarray, np.ndarray]:
    """(cell coord, point idx) pairs where the ±halo-expanded cell [i·c, (i+1)·c]
    contains the point (closed; superset — exact membership re-tested on device)."""
    p = points.astype(np.float64)
    i_min = np.floor((p - halo) / cell).astype(np.int64)
    i_max = np.floor((p + halo) / cell).astype(np.int64)
    span = i_max - i_min
    max_span = span.max(axis=0) if len(p) else np.zeros(3, np.int64)
    coords_list, idx_list = [], []
    for dx in range(int(max_span[0]) + 1):
        for dy in range(int(max_span[1]) + 1):
            for dz in range(int(max_span[2]) + 1):
                d = np.array([dx, dy, dz])
                ok = np.all(d <= span, axis=1)
                if ok.any():
                    coords_list.append(i_min[ok] + d)
                    idx_list.append(np.nonzero(ok)[0])
    if not coords_list:
        return np.zeros((0, 3), np.int64), np.zeros((0,), np.int64)
    return np.concatenate(coords_list), np.concatenate(idx_list)


class BGKLVOctoMap(base.OccupancyMapBase):
    GATE = 0.001

    def __init__(self, cfg: MapConfig):
        super().__init__(cfg)
        self._vox_base = geo.voxel_offsets(cfg.resolution, cfg.block_depth)
        # tile geometry: 8³ voxels (or the whole block when smaller)
        self.tile_edge = min(8, self.n)
        self.tiles_per_axis = self.n // self.tile_edge
        self.Vt = self.tile_edge ** 3
        # [tiles_per_block, Vt] raster voxel indices per tile position
        tpa, te, n = self.tiles_per_axis, self.tile_edge, self.n
        maps = []
        for tz in range(tpa):
            for ty in range(tpa):
                for tx in range(tpa):
                    idx = []
                    for z in range(te):
                        for y in range(te):
                            for x in range(te):
                                idx.append((tx * te + x) + (ty * te + y) * n
                                           + (tz * te + z) * n * n)
                    maps.append(idx)
        self._tile_vox_map = np.asarray(maps, np.int32)       # [tpb, Vt]
        self._pad_state: dict = {}

    def _field_fills(self):
        return {"A": self.cfg.prior_A, "B": self.cfg.prior_B}

    def insert_pointcloud(self, cloud, origin, ds_resolution=None,
                          free_resolution=None, max_range=None) -> None:
        cfg = self.cfg
        ds = cfg.ds_resolution if ds_resolution is None else ds_resolution
        ds = min(ds, cfg.resolution)  # clamp (bgklvoctomap.cpp:102-104)
        fr = cfg.free_resolution if free_resolution is None else free_resolution
        mr = cfg.max_range if max_range is None else max_range
        self._last_free_res = float(fr)
        from la3dm_tpu.geometry import native

        td = native.lv_training_data(cloud, origin, ds, fr, mr, cfg.ell)
        if td is None:  # no native toolchain — numpy fallback
            td = preprocess.bgklv_training_data(cloud, origin, ds, fr, mr, cfg.ell)
        self._integrate(td)

    def _integrate(self, td: preprocess.SegmentTrainingData) -> None:
        cfg = self.cfg
        all_pts = np.concatenate([td.hits, td.samples], axis=0)
        if len(all_pts) == 0:
            return
        # candidate blocks: the reference's float-stepped bbox sweep creates
        # every block from lim_min−bs to lim_max+2bs (bgkloctomap.cpp:409-418)
        bs = self.block_size
        lim_min, lim_max = all_pts.min(0).astype(np.float64), all_pts.max(0).astype(np.float64)
        los, his = [], []
        for ax in range(3):
            k_max = int(np.floor((lim_max[ax] + 2 * bs - (lim_min[ax] - bs)) / bs))
            los.append(int(np.floor((lim_min[ax] - bs) / bs + 0.5)))
            his.append(int(np.floor((lim_min[ax] - bs + k_max * bs) / bs + 0.5)))
        gx, gy, gz = np.meshgrid(*[np.arange(lo, hi + 1) for lo, hi in zip(los, his)],
                                 indexing="ij")
        cand = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.int64)
        self.pool.ensure(cand)

        # tile grid in the block-corner frame: blocks are CENTERED at k·bs
        # (round-half-up hashing), so shift by bs/2 to make tile m cover
        # q ∈ [m·ts, (m+1)·ts) with block k = floor(m / tpa) exactly aligned
        ts = bs / self.tiles_per_axis
        halo = cfg.ell  # voxel cubes reach ≤ ts − res/2 + ell from tile corners
        shift = np.float64(bs) / 2.0
        from la3dm_tpu.geometry import native

        tables = native.lv_tile_tables(td.hits, td.samples, td.sample_ray,
                                       ts, halo, float(shift))
        if tables is not None:
            (active_keys, h_start, h_count, r_start, r_count,
             hits_sorted, rays_sorted) = tables
            T = len(active_keys)
            if T == 0:
                return
        else:  # numpy fallback (no native toolchain)
            ht_coords, ht_idx = _halo_blocks(td.hits.astype(np.float64) + shift, ts, halo)
            st_coords, st_idx = _halo_blocks(td.samples.astype(np.float64) + shift, ts, halo)

            ht_keys = geo.pack_key(ht_coords)
            st_keys = geo.pack_key(st_coords)
            # dedup (tile, ray) pairs via lexsort — np.unique(axis=0)'s
            # void-dtype sort costs ~9× more on these ~100k-row tables
            st_rays = td.sample_ray[st_idx]
            order = np.lexsort((st_rays, st_keys))
            sk, sr = st_keys[order], st_rays[order]
            keep = np.empty(len(sk), bool)
            if len(sk):
                keep[0] = True
                keep[1:] = (sk[1:] != sk[:-1]) | (sr[1:] != sr[:-1])
            ray_pairs = np.stack([sk[keep], sr[keep]], 1) if len(sk) \
                else np.zeros((0, 2), np.int64)

            active_keys = np.unique(np.concatenate([ht_keys, ray_pairs[:, 0]]))
            T = len(active_keys)
            if T == 0:
                return

            def segments(keys, payload):
                """Sorted payload + per-active-tile (start,count)."""
                order = np.argsort(keys, kind="stable")
                ks, ps = keys[order], payload[order]
                uk, st, ct = np.unique(ks, return_index=True, return_counts=True)
                if len(uk) == 0:  # e.g. no hits when max_range ≤ 0 (ref :323-334)
                    z = np.zeros(T, np.int64)
                    return ps, z, z
                pos = np.searchsorted(uk, active_keys)
                pos = np.clip(pos, 0, max(len(uk) - 1, 0))
                hit = (uk[pos] == active_keys) if len(uk) else np.zeros(T, bool)
                return ps, np.where(hit, st[pos], 0), np.where(hit, ct[pos], 0)

            hits_sorted, h_start, h_count = segments(ht_keys, ht_idx.astype(np.int32))
            rays_sorted, r_start, r_count = segments(ray_pairs[:, 0],
                                                     ray_pairs[:, 1].astype(np.int32))

        tile_coords = geo.unpack_key(active_keys)               # [T,3]
        tpa = self.tiles_per_axis
        blk_coords = np.floor_divide(tile_coords, tpa)
        tile_pos = tile_coords - blk_coords * tpa               # [T,3] ∈ [0,tpa)
        pos_id = (tile_pos[:, 0] + tile_pos[:, 1] * tpa
                  + tile_pos[:, 2] * tpa * tpa).astype(np.int32)
        slots = self.pool.lookup(blk_coords)
        # only blocks in THIS scan's candidate sweep are updated (the reference
        # iterates the sweep's blocks); halo spill outside it is dropped too
        cand_keys = np.sort(geo.pack_key(cand))
        bk = geo.pack_key(blk_coords)
        pos = np.searchsorted(cand_keys, bk)
        pos = np.clip(pos, 0, max(len(cand_keys) - 1, 0))
        in_sweep = cand_keys[pos] == bk if len(cand_keys) else np.zeros(len(bk), bool)
        keep = (slots >= 0) & in_sweep
        blk_coords, pos_id, slots = blk_coords[keep], pos_id[keep], slots[keep]
        h_start, h_count = h_start[keep], h_count[keep]
        r_start, r_count = r_start[keep], r_count[keep]
        T = len(slots)
        if T == 0:
            return

        centers = geo.block_center(blk_coords, bs)              # [T,3]
        hit_n, ray_n = h_count, r_count
        self.stats["kernel_evals"] += int((hit_n + ray_n).sum()) * self.Vt
        self.stats["scans"] += 1

        R = len(td.rays)
        H = len(td.hits)
        rays_dev = jnp.asarray(np.concatenate(
            [td.rays, np.zeros((1, 6), np.float32)]))           # sentinel row
        hits_dev = jnp.asarray(np.concatenate(
            [td.hits, np.zeros((1, 3), np.float32)]))

        # flat tile-sorted entry-id tables, shipped once per scan; padding
        # points at the sentinel rows (monotone pow2 shapes)
        fpads = _GLOBAL_PADS.setdefault(("LVflat", self.cfg), {"PR": 1024, "PH": 256})
        fpads["PR"] = max(fpads["PR"], base.next_pow2(max(len(rays_sorted), 1024)))
        fpads["PH"] = max(fpads["PH"], base.next_pow2(max(len(hits_sorted), 256)))
        ray_ids_p = np.full(fpads["PR"], R, np.int32)
        ray_ids_p[:len(rays_sorted)] = rays_sorted
        hit_ids_p = np.full(fpads["PH"], H, np.int32)
        hit_ids_p[:len(hits_sorted)] = hits_sorted
        ray_ids_dev = jnp.asarray(ray_ids_p)
        hit_ids_dev = jnp.asarray(hit_ids_p)

        if not hasattr(self, "_dev_consts"):
            self._dev_consts = (jnp.asarray(self._tile_vox_map),
                                jnp.asarray(self._vox_base))
        tvm_dev, vb_dev = self._dev_consts

        total = np.maximum(hit_n, ray_n)
        Af = self.pool.fields["A"].reshape(-1)
        Bf = self.pool.fields["B"].reshape(-1)
        Tf = self.pool.touched.reshape(-1)
        Ef = self.pool.eff_level.reshape(-1)
        prev = 0
        for tier in _TIERS:
            sel = np.nonzero((total > prev) & (total <= tier))[0] if prev \
                else np.nonzero(total <= tier)[0]
            prev = tier
            if len(sel) == 0:
                continue
            pads = _GLOBAL_PADS.setdefault((type(self).__name__, self.cfg), {})
            p = pads.setdefault(tier, {"T": 8})
            p["T"] = max(p["T"], base.next_pow2(max(len(sel), 8)))
            Tp, Rt, Ht = p["T"], tier, tier

            slots_p = np.full(Tp, self.pool.capacity, np.int32)
            pos_p = np.zeros(Tp, np.int32)
            ctrs = np.zeros((Tp, 3), np.float32)
            rs_p = np.zeros(Tp, np.int32)
            rc_p = np.zeros(Tp, np.int32)
            hs_p = np.zeros(Tp, np.int32)
            hc_p = np.zeros(Tp, np.int32)
            slots_p[:len(sel)] = slots[sel]
            pos_p[:len(sel)] = pos_id[sel]
            ctrs[:len(sel)] = centers[sel]
            rs_p[:len(sel)] = r_start[sel]
            rc_p[:len(sel)] = r_count[sel]
            hs_p[:len(sel)] = h_start[sel]
            hc_p[:len(sel)] = h_count[sel]

            Af, Bf, Tf = _lv_tile_step(
                Af, Bf, Tf, Ef,
                jnp.asarray(slots_p), jnp.asarray(pos_p), jnp.asarray(ctrs),
                tvm_dev, vb_dev, rays_dev, hits_dev,
                ray_ids_dev, jnp.asarray(rs_p), jnp.asarray(rc_p),
                hit_ids_dev, jnp.asarray(hs_p), jnp.asarray(hc_p),
                V=self.V, Rt=Rt, Ht=Ht, sf2=cfg.sf2, ell=cfg.ell,
                free_res=self._last_free_res, gate=self.GATE)

        self.pool.fields["A"] = Af.reshape(self.pool.capacity, self.V)
        self.pool.fields["B"] = Bf.reshape(self.pool.capacity, self.V)
        self.pool.touched = Tf.reshape(self.pool.capacity, self.V)

        if cfg.original_size and cfg.block_depth > 1:
            self._prune(np.unique(slots))

    def _make_state_fn(self):
        cfg = self.cfg
        return posterior.LVStateFn(cfg.min_W, cfg.var_thresh, cfg.free_thresh,
                                   cfg.occupied_thresh)

    def _posterior(self, fields):
        cfg = self.cfg
        A, B = fields["A"], fields["B"]
        with np.errstate(divide="ignore", invalid="ignore"):
            W = np.maximum(A + B, cfg.min_W)
            occ = A / (W - B) + (W - A - B) * 0.5 / (W - B)
            free = 0.5 * (W - B - A) / (W - A)
            prob = np.where(A > B, occ, free)
            var = (A / W) * (1 - prob) ** 2 + ((W - A - B) / W) * (0.5 - prob) ** 2 \
                + (B / W) * prob ** 2
        st = np.where(prob > cfg.occupied_thresh, posterior.OCCUPIED,
                      np.where(prob < cfg.free_thresh, posterior.FREE, posterior.UNKNOWN))
        st = np.where(var > cfg.var_thresh, posterior.UNCERTAIN, st)
        st = np.where(fields["touched"], st, posterior.UNKNOWN).astype(np.int8)
        return {"prob": prob, "var": var, "state": st, "A": np.asarray(A), "B": np.asarray(B)}
