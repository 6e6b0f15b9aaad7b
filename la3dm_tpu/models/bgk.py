"""BGKOctoMap — Bayesian generalized kernel inference with Beta posteriors.

TPU-native re-design of the reference BGK family pipeline
(``src/bgkoctomap/bgkoctomap.cpp:214-366``): the per-scan
training→prediction→update→prune phases become

  host:   scan → training points (geometry/preprocess) → block buckets
  device: one fused batched kernel: distance → sparse kernel → per-slot
          (ȳ, k̄) matvec → gated Beta update → scatter into the pool →
          dense prune.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from la3dm_tpu.geometry import blocks as geo, preprocess
from la3dm_tpu.kernels import predict as kp
from la3dm_tpu.models import base, bucketing, posterior, pruning
from la3dm_tpu.utils.config import MapConfig

_CHUNK_B = 32  # blocks per lax.map chunk: bounds the [b,V,S] kernel intermediate


@functools.partial(
    jax.jit,
    static_argnames=("num_slots", "sf2", "ell", "gate", "n", "max_level",
                     "segments", "update_pruned", "state_fn", "do_prune"),
    donate_argnames=("A", "Bv", "touched", "eff"),
)
def _bgk_update_step(A, Bv, touched, eff, level_tab, slots, centers, entries, labels,
                     pslots, pvalid,
                     num_slots: int, sf2: float, ell: float, gate: float,
                     n: int, max_level: int,
                     segments: bool, update_pruned: bool,
                     state_fn=None, do_prune: bool = False):
    """One scan's prediction + Beta update (+ prune), one device dispatch.

    ``slots`` is int32 [B] pool slots (== pool.capacity ⇒ padding row, dropped
    by the scatter).  ``entries`` [B,S,3|6] and ``centers`` [B,3] are
    world-frame (kernel parity requires world coordinates; see bucketing).
    """
    eff_b = eff[jnp.minimum(slots, eff.shape[0] - 1)]  # [B,V]
    off = jnp.take_along_axis(
        level_tab[None], eff_b[:, None, :, None].astype(jnp.int32), axis=1)[:, 0]  # [B,V,3]
    # Block::get_point = key_loc_map offset + block center (bgkblock.cpp:137-139)
    vox = off + centers[:, None, :]

    def chunk_fn(args):
        vx, en, lb, sl, va = args
        if segments:
            ybar, kbar = _segment_chunk(vx, en, lb, sl, va, num_slots, sf2, ell)
        else:
            ybar, kbar = _point_chunk(vx, en, lb, sl, va, num_slots, sf2, ell)
        return kp.beta_update(ybar, kbar, gate)

    B = slots.shape[0]
    nchunk = B // _CHUNK_B

    def reshape_c(x):
        return x.reshape(nchunk, _CHUNK_B, *x.shape[1:])
    dA, dB, tch = jax.lax.map(
        chunk_fn,
        tuple(reshape_c(x) for x in (vox, entries, labels, pslots, pvalid)))
    dA, dB, tch = (x.reshape(B, -1) for x in (dA, dB, tch))

    if not update_pruned:
        live = eff_b == 0  # LV skips leaves above base resolution (bgklvoctomap.cpp:157-160)
        dA = jnp.where(live, dA, 0.0)
        dB = jnp.where(live, dB, 0.0)
        tch = tch & live

    A = A.at[slots].add(dA, mode="drop")
    Bv = Bv.at[slots].add(dB, mode="drop")
    touched = touched.at[slots].max(tch, mode="drop")

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


def _point_chunk(vox, pts, lab, slot, val, num_slots, sf2, ell):
    return jax.vmap(
        lambda v, p, l, s, m: _one_block_points(v, p, l, s, m, num_slots, sf2, ell)
    )(vox, pts, lab, slot, val)


def _one_block_points(vox, pts, lab, slot, val, num_slots, sf2, ell):
    from la3dm_tpu.kernels import math as km
    K = km.cov_sparse(vox, pts, sf2, ell)
    K = jnp.where(val[None, :], K, 0.0)
    rhs = kp._slot_rhs(lab, slot, val, num_slots)
    out = jnp.dot(K, rhs, preferred_element_type=jnp.float32)
    return out[:, :num_slots], out[:, num_slots:]


def _segment_chunk(vox, seg, lab, slot, val, num_slots, sf2, ell):
    return jax.vmap(
        lambda v, p, l, s, m: _one_block_segments(v, p, l, s, m, num_slots, sf2, ell)
    )(vox, seg, lab, slot, val)


def _one_block_segments(vox, seg, lab, slot, val, num_slots, sf2, ell):
    from la3dm_tpu.kernels import math as km
    K = km.cov_sparse_segment(vox, seg, sf2, ell, lv=False)
    K = jnp.where(val[None, :], K, 0.0)
    rhs = kp._slot_rhs(lab, slot, val, num_slots)
    out = jnp.dot(K, rhs, preferred_element_type=jnp.float32)
    return out[:, :num_slots], out[:, num_slots:]


class BGKOctoMap(base.OccupancyMapBase):
    """BGK occupancy map (ctor params: bgkoctomap.cpp:31-56)."""

    SEGMENTS = False
    GATE = 0.0  # update gate: k̄ > 0 (bgkoctomap.cpp:332)

    def _field_fills(self):
        # prior pseudo-counts are the pool fill values (bgkoctree_node.h:33)
        return {"A": self.cfg.prior_A, "B": self.cfg.prior_B}

    # ------------------------------------------------------------------ API

    def insert_pointcloud(self, cloud: np.ndarray, origin: np.ndarray,
                          ds_resolution: float | None = None,
                          free_resolution: float | None = None,
                          max_range: float | None = None) -> None:
        """Integrate one scan (reference insert_pointcloud, bgkoctomap.cpp:214)."""
        cfg = self.cfg
        td = preprocess.bgk_training_data(
            cloud, origin,
            cfg.ds_resolution if ds_resolution is None else ds_resolution,
            cfg.free_resolution if free_resolution is None else free_resolution,
            cfg.max_range if max_range is None else max_range,
            free_label=0.0)
        if len(td.points) == 0:
            return
        self.insert_training_data(td.points, td.labels)

    def insert_training_data(self, points: np.ndarray, labels: np.ndarray) -> None:
        """Integrate pre-labeled training points (bgkoctomap.cpp:82-212)."""
        points = points.astype(np.float32)
        coords, idx = geo.point_block_memberships(points, self.block_size)
        buckets = bucketing.bucket_by_block(
            coords, points[idx], labels.astype(np.float32)[idx],
            self._neighbor_offsets, self.block_size)
        self._apply_buckets(buckets)

    # ------------------------------------------------------------- internals

    def _apply_buckets(self, buckets: bucketing.BlockBuckets) -> None:
        B = len(buckets.test_coords)
        if B == 0:
            return
        self.stats["kernel_evals"] += int(buckets.valid.sum()) * self.V
        self.stats["scans"] += 1
        slots = self.pool.ensure(buckets.test_coords)
        B_pad = base.round_up(max(B, _CHUNK_B), _CHUNK_B)
        S_pad = base.next_pow2(max(buckets.entries.shape[1], 128))
        D = buckets.entries.shape[2]

        entries = np.zeros((B_pad, S_pad, D), np.float32)
        entries[:B, :buckets.entries.shape[1]] = buckets.entries
        labels = np.zeros((B_pad, S_pad), np.float32)
        labels[:B, :buckets.labels.shape[1]] = buckets.labels
        pslots = np.zeros((B_pad, S_pad), np.int32)
        pslots[:B, :buckets.slots.shape[1]] = buckets.slots
        valid = np.zeros((B_pad, S_pad), bool)
        valid[:B, :buckets.valid.shape[1]] = buckets.valid
        slots_pad = np.full(B_pad, self.pool.capacity, np.int32)
        slots_pad[:B] = slots
        centers = np.zeros((B_pad, 3), np.float32)
        centers[:B] = self.block_centers(buckets.test_coords)

        cfg = self.cfg
        (self.pool.fields["A"], self.pool.fields["B"], self.pool.touched,
         self.pool.eff_level) = _bgk_update_step(
            self.pool.fields["A"], self.pool.fields["B"], self.pool.touched,
            self.pool.eff_level, self._level_offsets,
            jnp.asarray(slots_pad), jnp.asarray(centers),
            jnp.asarray(entries), jnp.asarray(labels),
            jnp.asarray(pslots), jnp.asarray(valid),
            num_slots=self.num_slots, sf2=cfg.sf2, ell=cfg.ell, gate=self.GATE,
            n=self.n, max_level=cfg.block_depth - 1,
            segments=self.SEGMENTS, update_pruned=True,
            state_fn=self._state_fn, do_prune=cfg.block_depth > 1)

    def _make_state_fn(self):
        cfg = self.cfg

        def state_fn(v):
            return posterior.beta_state(v["A"], v["B"], v["touched"] > 0,
                                        cfg.var_thresh, cfg.free_thresh, cfg.occupied_thresh)

        return state_fn

    def _posterior(self, fields: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        cfg = self.cfg
        A, B = fields["A"], fields["B"]
        prob = np.asarray(A / (A + B))
        var = np.asarray((A * B) / ((A + B) ** 2 * (A + B + 1.0)))
        st = np.where(prob > cfg.occupied_thresh, posterior.OCCUPIED,
                      np.where(prob < cfg.free_thresh, posterior.FREE, posterior.UNKNOWN))
        st = np.where(var > cfg.var_thresh, posterior.UNKNOWN, st)
        st = np.where(fields["touched"], st, posterior.UNKNOWN).astype(np.int8)
        return {"prob": prob, "var": var, "state": st, "A": np.asarray(A), "B": np.asarray(B)}
