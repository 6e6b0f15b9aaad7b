"""BGKLVOctoMap — evidence-mass occupancy with per-voxel ℓ-ball inference.

Reference (``src/bgklvoctomap/bgklvoctomap.cpp:89-285``): every block in the
scan's bbox is materialized; each *base-resolution* leaf queries the R-tree
in an axis-aligned ±ℓ cube around its center (:152-171), builds a per-voxel
training set (hits as degenerate segments + per-voxel-deduplicated free
rays, :176-207), and runs a single-test-point BGKLV predict with gate
k̄ > 0.001 (:236-238).  Leaves above base resolution are skipped (:157-160);
pruning only runs with original_size (:271-272).

TPU design: the reference's O(voxels) tiny GEMVs become, per block, one
dense masked product: kernel [V × entries] with an L∞ membership mask, the
ray-sample→ray reduction expressed as a one-hot matmul on the MXU.
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


@functools.partial(
    jax.jit,
    static_argnames=("sf2", "ell", "gate", "n", "max_level", "state_fn", "do_prune"),
    donate_argnames=("A", "Bv", "touched", "eff"),
)
def _lv_update_step(A, Bv, touched, eff, slots, vox_base, centers,
                    hits, hits_valid, rays, rays_valid, samples, sample_ray, samples_valid,
                    sf2: float, ell: float, gate: float,
                    n: int = 0, max_level: int = 0, state_fn=None, do_prune: bool = False):
    """Per-voxel LV inference for a batch of blocks (world coordinates).

    hits [B,H,3]; rays [B,R,6]; samples [B,S,3] with sample_ray [B,S] int32;
    centers [B,3] block centers (vox_base holds block-local base offsets).
    """
    ellf = jnp.float32(ell)

    def per_block(args):
        ctr, hv, hm, rv, rm, sv, sr, sm = args
        vox = vox_base + ctr[None, :]
        # ±ℓ cube membership as closed f32 interval tests, matching the
        # R-tree query bounds lim = p ± ell (bgklvoctomap.cpp:152-171)
        lo = vox - ellf  # [V,3], f32 exactly as the reference's p − half_size
        hi = vox + ellf

        # -- hits: degenerate segments → plain point distance
        dh = km.pairwise_dist(vox, hv)                            # [V,H]
        member_h = jnp.all(
            (hv[None, :, :] >= lo[:, None, :]) & (hv[None, :, :] <= hi[:, None, :]),
            axis=-1) & hm[None, :]
        Kh = jnp.where(member_h, km.sparse_kernel_lv(dh / ellf, sf2), 0.0)

        # -- rays: membership via any proxy sample in the ±ℓ cube (R-tree query)
        member_s = jnp.all(
            (sv[None, :, :] >= lo[:, None, :]) & (sv[None, :, :] <= hi[:, None, :]),
            axis=-1) & sm[None, :]
        onehot = (sr[:, None] == jnp.arange(rv.shape[0])[None, :]) & sm[:, None]
        member_r = jnp.dot(member_s.astype(jnp.float32), onehot.astype(jnp.float32),
                           preferred_element_type=jnp.float32) > 0.0  # [V,R]
        dr = km.point_to_segment_dist(vox, rv)
        Kr = jnp.where(member_r & rm[None, :], km.sparse_kernel_lv(dr / ellf, sf2), 0.0)

        ybar = jnp.sum(Kh, axis=1)
        kbar = ybar + jnp.sum(Kr, axis=1)
        return ybar, kbar

    ybar, kbar = jax.lax.map(
        per_block, (centers, hits, hits_valid, rays, rays_valid, samples, sample_ray, samples_valid))

    g = kbar > jnp.float32(gate)
    live = eff[jnp.minimum(slots, eff.shape[0] - 1)] == 0  # base-res leaves only
    g = g & live
    A = A.at[slots].add(jnp.where(g, ybar, 0.0), mode="drop")
    Bv = Bv.at[slots].add(jnp.where(g, kbar - ybar, 0.0), mode="drop")
    touched = touched.at[slots].max(g, mode="drop")

    if do_prune:
        from la3dm_tpu.models import pruning

        safe = jnp.minimum(slots, eff.shape[0] - 1)
        vals = {"A": A[safe], "B": Bv[safe], "touched": touched[safe].astype(jnp.float32)}
        new_vals, new_eff = pruning.prune_blocks(vals, eff[safe], n=n,
                                                 max_level=max_level, state_fn=state_fn)
        A = A.at[slots].set(new_vals["A"], mode="drop")
        Bv = Bv.at[slots].set(new_vals["B"], mode="drop")
        touched = touched.at[slots].set(new_vals["touched"] > 0, mode="drop")
        eff = eff.at[slots].set(new_eff, mode="drop")
    return A, Bv, touched, eff


def _halo_blocks(points: np.ndarray, block_size: float, halo: float) -> tuple[np.ndarray, np.ndarray]:
    """All (block, point-index) pairs where the block's ±halo-expanded bbox
    contains the point (closed bounds, matching the R-tree overlap test)."""
    p = points.astype(np.float64)
    bs = float(block_size)
    i_min = np.ceil((p - bs / 2 - halo) / bs).astype(np.int64)
    i_max = np.floor((p + bs / 2 + halo) / bs).astype(np.int64)
    span = i_max - i_min  # per axis, ≥0
    max_span = span.max(axis=0) if len(p) else np.zeros(3, np.int64)
    coords_list, idx_list = [], []
    for dx in range(int(max_span[0]) + 1):
        for dy in range(int(max_span[1]) + 1):
            for dz in range(int(max_span[2]) + 1):
                d = np.array([dx, dy, dz])
                ok = np.all(d <= span, axis=1)
                coords_list.append(i_min[ok] + d)
                idx_list.append(np.nonzero(ok)[0])
    return np.concatenate(coords_list), np.concatenate(idx_list)


class BGKLVOctoMap(base.OccupancyMapBase):
    GATE = 0.001

    def __init__(self, cfg: MapConfig):
        super().__init__(cfg)
        self._vox_base = jnp.asarray(geo.voxel_offsets(cfg.resolution, cfg.block_depth))

    def _field_fills(self):
        return {"A": self.cfg.prior_A, "B": self.cfg.prior_B}

    def insert_pointcloud(self, cloud, origin, ds_resolution=None,
                          free_resolution=None, max_range=None) -> None:
        cfg = self.cfg
        ds = cfg.ds_resolution if ds_resolution is None else ds_resolution
        ds = min(ds, cfg.resolution)  # clamp (bgklvoctomap.cpp:102-104)
        td = preprocess.bgklv_training_data(
            cloud, origin, ds,
            cfg.free_resolution if free_resolution is None else free_resolution,
            cfg.max_range if max_range is None else max_range, cfg.ell)
        self._integrate(td)

    def _integrate(self, td: preprocess.SegmentTrainingData) -> None:
        cfg = self.cfg
        all_pts = np.concatenate([td.hits, td.samples], axis=0)
        if len(all_pts) == 0:
            return
        # candidate blocks: the reference's float-stepped bbox sweep
        # (get_blocks_in_bbox via bgkloctomap.cpp:409-418) — every block from
        # lim_min−bs to lim_max+2bs is created in block_arr
        bs = self.block_size
        lim_min, lim_max = all_pts.min(0).astype(np.float64), all_pts.max(0).astype(np.float64)
        los, his = [], []
        for ax in range(3):
            k_max = int(np.floor((lim_max[ax] + 2 * bs - (lim_min[ax] - bs)) / bs))
            los.append(int(np.floor((lim_min[ax] - bs) / bs + 0.5)))
            his.append(int(np.floor((lim_min[ax] - bs + k_max * bs) / bs + 0.5)))
        gx, gy, gz = np.meshgrid(*[np.arange(lo, hi + 1) for lo, hi in zip(los, his)], indexing="ij")
        cand = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.int64)
        self.pool.ensure(cand)

        halo = cfg.ell  # voxel cubes reach ≤ bs/2 − res/2 + ℓ from center
        hb_coords, hb_idx = _halo_blocks(td.hits, bs, halo)
        sb_coords, sb_idx = _halo_blocks(td.samples, bs, halo)

        # group per block
        hb_keys, sb_keys = geo.pack_key(hb_coords), geo.pack_key(sb_coords)
        # rays follow their samples: dedupe (block, ray)
        ray_pairs = np.unique(np.stack([sb_keys, td.sample_ray[sb_idx]], 1), axis=0)

        active_keys = np.unique(np.concatenate([hb_keys, ray_pairs[:, 0]]))
        key_to_b = {int(k): i for i, k in enumerate(active_keys)}
        B = len(active_keys)
        if B == 0:
            return

        def group(keys, payload_idx):
            by_b = [[] for _ in range(B)]
            for k, i in zip(keys, payload_idx):
                by_b[key_to_b[int(k)]].append(i)
            return by_b

        hits_by_b = group(hb_keys, hb_idx)
        rays_by_b = group(ray_pairs[:, 0], ray_pairs[:, 1])
        # samples grouped by block, but only those of rays active in the block
        samp_by_b = group(sb_keys, sb_idx)

        # monotone pow2 padding on every axis: stable jit shapes across scans
        pad = self._pad_state = getattr(self, "_pad_state", {"H": 8, "R": 8, "S": 8, "B": 8})
        pad["H"] = max(pad["H"], base.next_pow2(max(max((len(x) for x in hits_by_b), default=1), 8)))
        pad["R"] = max(pad["R"], base.next_pow2(max(max((len(x) for x in rays_by_b), default=1), 8)))
        pad["S"] = max(pad["S"], base.next_pow2(max(max((len(x) for x in samp_by_b), default=1), 8)))
        pad["B"] = max(pad["B"], base.next_pow2(max(B, 8)))
        Hm, Rm, Sm, B_pad = pad["H"], pad["R"], pad["S"], pad["B"]

        coords_b = geo.unpack_key(active_keys)
        centers_act = geo.block_center(coords_b, bs)
        centers = np.zeros((B_pad, 3), np.float32)
        centers[:B] = centers_act
        hits = np.zeros((B_pad, Hm, 3), np.float32)
        hits_valid = np.zeros((B_pad, Hm), bool)
        rays = np.zeros((B_pad, Rm, 6), np.float32)
        rays_valid = np.zeros((B_pad, Rm), bool)
        samples = np.zeros((B_pad, Sm, 3), np.float32)
        sample_ray = np.full((B_pad, Sm), -1, np.int32)
        samples_valid = np.zeros((B_pad, Sm), bool)
        for b in range(B):
            hi = hits_by_b[b]
            hits[b, :len(hi)] = td.hits[hi]
            hits_valid[b, :len(hi)] = True
            ri = rays_by_b[b]
            local_ray = {int(r): j for j, r in enumerate(ri)}
            rays[b, :len(ri)] = td.rays[ri]
            rays_valid[b, :len(ri)] = True
            si = [i for i in samp_by_b[b] if int(td.sample_ray[i]) in local_ray]
            samples[b, :len(si)] = td.samples[si]
            sample_ray[b, :len(si)] = [local_ray[int(td.sample_ray[i])] for i in si]
            samples_valid[b, :len(si)] = True

        self.stats["kernel_evals"] += int(hits_valid.sum() + rays_valid.sum()) * self.V
        self.stats["scans"] += 1
        slots_act = self.pool.lookup(coords_b)
        assert (slots_act >= 0).all()
        slots = np.full(B_pad, self.pool.capacity, np.int32)
        slots[:B] = slots_act
        (self.pool.fields["A"], self.pool.fields["B"], self.pool.touched,
         self.pool.eff_level) = _lv_update_step(
            self.pool.fields["A"], self.pool.fields["B"], self.pool.touched,
            self.pool.eff_level, jnp.asarray(slots), self._vox_base,
            jnp.asarray(centers), jnp.asarray(hits), jnp.asarray(hits_valid),
            jnp.asarray(rays), jnp.asarray(rays_valid),
            jnp.asarray(samples), jnp.asarray(sample_ray), jnp.asarray(samples_valid),
            sf2=cfg.sf2, ell=cfg.ell, gate=self.GATE,
            n=self.n, max_level=cfg.block_depth - 1, state_fn=self._state_fn,
            do_prune=bool(cfg.original_size and cfg.block_depth > 1))

    def _make_state_fn(self):
        cfg = self.cfg

        def state_fn(v):
            return posterior.lv_state(v["A"], v["B"], v["touched"] > 0, cfg.min_W,
                                      cfg.var_thresh, cfg.free_thresh, cfg.occupied_thresh)

        return state_fn

    def _posterior(self, fields):
        cfg = self.cfg
        A, B = fields["A"], fields["B"]
        W = np.maximum(A + B, cfg.min_W)
        occ = A / (W - B) + (W - A - B) * 0.5 / (W - B)
        free = 0.5 * (W - B - A) / (W - A)
        prob = np.where(A > B, occ, free)
        var = (A / W) * (1 - prob) ** 2 + ((W - A - B) / W) * (0.5 - prob) ** 2 + (B / W) * prob ** 2
        st = np.where(prob > cfg.occupied_thresh, posterior.OCCUPIED,
                      np.where(prob < cfg.free_thresh, posterior.FREE, posterior.UNKNOWN))
        st = np.where(var > cfg.var_thresh, posterior.UNCERTAIN, st)
        st = np.where(fields["touched"], st, posterior.UNKNOWN).astype(np.int8)
        return {"prob": prob, "var": var, "state": st, "A": np.asarray(A), "B": np.asarray(B)}
