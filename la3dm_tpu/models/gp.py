"""GPOctoMap — per-block exact GP regression + BCM fusion.

Reference (``src/gpoctomap/gpoctomap.cpp``, ``gpregressor.h``,
``gpoctree_node.cpp``): each block with training points trains an exact GP
(Matérn-3/2 + Cholesky) on its own points; each test block queries the
models of its extended neighborhood and fuses them with the BCM
information-filter update ``ivar += 1/σ² − sf2; m_ivar += μ/σ²`` including
the order-dependent persistent ivar chop (gpoctree_node.cpp:36-49).
Free-space label is −1 (gpoctomap.cpp:399); there is no k̄ gate.

TPU design: models are bucketed into power-of-two point-count tiers and
solved as batched Cholesky factorizations on the MXU; each model then
predicts all G neighbor test blocks in one batched triangular solve, and
results scatter back to (test block, slot) for the sequential BCM scan.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from la3dm_tpu.geometry import blocks as geo, preprocess
from la3dm_tpu.kernels import gp as kgp
from la3dm_tpu.models import base, bucketing, posterior, pruning
from la3dm_tpu.utils.config import MapConfig


@functools.partial(jax.jit, static_argnames=("sf2", "ell", "noise"))
def _train_predict_tier(points, labels, valid, xs, sf2, ell, noise):
    """Train a tier of models and predict their neighbor voxels.

    points/labels/valid: [Bc,S,*]; xs: [Bc,M,3] model-local query points.
    Returns mean, var [Bc,M].
    """
    L, alpha = kgp.gp_train_blocks(points, labels, valid, sf2, ell, noise)
    return kgp.gp_predict_blocks(L, alpha, points, valid, xs, sf2, ell)


@functools.partial(
    jax.jit,
    static_argnames=("sf2", "min_known_ivar", "max_ivar", "n", "max_level",
                     "state_fn", "do_prune"),
    donate_argnames=("m_ivar", "ivar", "touched", "eff"),
)
def _bcm_apply(m_ivar, ivar, touched, eff, slots, means, variances, present,
               sf2, min_known_ivar, max_ivar, n, max_level, state_fn, do_prune):
    """Sequential BCM fusion over slots + scatter into the pool (+ prune)."""
    cur_mi = m_ivar[jnp.minimum(slots, m_ivar.shape[0] - 1)]
    cur_iv = ivar[jnp.minimum(slots, ivar.shape[0] - 1)]
    new_mi, new_iv = kgp.bcm_update_sequential(
        cur_mi, cur_iv, means, variances, present[:, None, :].repeat(means.shape[1], 1),
        sf2, min_known_ivar, max_ivar)
    any_present = jnp.any(present, axis=-1)[:, None]
    m_ivar = m_ivar.at[slots].set(jnp.where(any_present, new_mi, cur_mi), mode="drop")
    ivar = ivar.at[slots].set(jnp.where(any_present, new_iv, cur_iv), mode="drop")
    touched = touched.at[slots].max(
        jnp.broadcast_to(any_present, new_mi.shape), mode="drop")

    if do_prune:
        from la3dm_tpu.models import pruning

        safe = jnp.minimum(slots, eff.shape[0] - 1)
        vals = {"m_ivar": m_ivar[safe], "ivar": ivar[safe],
                "touched": touched[safe].astype(jnp.float32)}
        new_vals, new_eff = pruning.prune_blocks(vals, eff[safe], n=n,
                                                 max_level=max_level, state_fn=state_fn)
        m_ivar = m_ivar.at[slots].set(new_vals["m_ivar"], mode="drop")
        ivar = ivar.at[slots].set(new_vals["ivar"], mode="drop")
        touched = touched.at[slots].set(new_vals["touched"] > 0, mode="drop")
        eff = eff.at[slots].set(new_eff, mode="drop")
    return m_ivar, ivar, touched, eff


class GPOctoMap(base.OccupancyMapBase):
    def __init__(self, cfg: MapConfig):
        # min_ivar = 1/max_var etc. (gpoctomap.cpp:39-41)
        self.min_ivar = 1.0 / cfg.max_var
        self.max_ivar = 1.0 / cfg.min_var
        self.min_known_ivar = 1.0 / cfg.max_known_var
        super().__init__(cfg)

    def _field_fills(self):
        return {"m_ivar": 0.0, "ivar": self.min_ivar}

    def insert_pointcloud(self, cloud, origin, ds_resolution=None,
                          free_resolution=None, max_range=None) -> None:
        cfg = self.cfg
        td = preprocess.bgk_training_data(
            cloud, origin,
            cfg.ds_resolution if ds_resolution is None else ds_resolution,
            cfg.free_resolution if free_resolution is None else free_resolution,
            cfg.max_range if max_range is None else max_range,
            free_label=-1.0)  # gpoctomap.cpp:399
        if len(td.points) == 0:
            return
        self.insert_training_data(td.points, td.labels)

    def insert_training_data(self, points: np.ndarray, labels: np.ndarray) -> None:
        cfg = self.cfg
        points = points.astype(np.float32)
        coords, pidx = geo.point_block_memberships(points, self.block_size)
        order, ukeys, starts, counts = bucketing.group_by_block(coords)
        pts_s, lab_s = points[pidx][order], labels.astype(np.float32)[pidx][order]
        model_coords = geo.unpack_key(ukeys)
        M = len(model_coords)

        test_coords = bucketing.test_blocks_for(ukeys, self._neighbor_offsets)
        slots = self.pool.ensure(test_coords)
        B = len(test_coords)
        t_index = {int(k): i for i, k in enumerate(geo.pack_key(test_coords))}

        # world-frame eff voxel centers of every test block
        vox = self.eff_voxel_centers(slots)  # [B,V,3]
        G, V = self.num_slots, self.V

        # model m at coord c serves test block c − off[s] at slot s
        nb_t = np.empty((M, G), np.int64)
        for s, off in enumerate(self._neighbor_offsets):
            keys = geo.pack_key(model_coords - off[None, :])
            nb_t[:, s] = [t_index[int(k)] for k in keys]  # always present

        means = np.zeros((B, V, G), np.float32)
        variances = np.ones((B, V, G), np.float32)
        present = np.zeros((B, G), bool)

        self.stats["kernel_evals"] += int((counts ** 2).sum() + counts.sum() * G * V)
        self.stats["scans"] += 1
        tier_of = np.power(2, np.ceil(np.log2(np.maximum(counts, 8)))).astype(np.int64)
        for tier in sorted(set(tier_of.tolist())):
            sel = np.where(tier_of == tier)[0]
            if len(sel) == 0:
                continue
            Bc = len(sel)
            P = np.zeros((Bc, tier, 3), np.float32)
            Y = np.zeros((Bc, tier), np.float32)
            Vd = np.zeros((Bc, tier), bool)
            xs = np.zeros((Bc, G * V, 3), np.float32)
            for i, m in enumerate(sel):
                c = int(counts[m])
                P[i, :c] = pts_s[starts[m]:starts[m] + c]
                Y[i, :c] = lab_s[starts[m]:starts[m] + c]
                Vd[i, :c] = True
                for s in range(G):
                    # model at block c serves test block t = c − off[s] at slot s
                    xs[i, s * V:(s + 1) * V] = vox[nb_t[m, s]]
            mean, var = _train_predict_tier(
                jnp.asarray(P), jnp.asarray(Y), jnp.asarray(Vd), jnp.asarray(xs),
                cfg.sf2, cfg.ell, cfg.noise)
            mean = np.asarray(mean).reshape(Bc, G, V)
            var = np.asarray(var).reshape(Bc, G, V)
            for i, m in enumerate(sel):
                for s in range(G):
                    t = nb_t[m, s]
                    means[t, :, s] = mean[i, s]
                    variances[t, :, s] = var[i, s]
                    present[t, s] = True

        B_pad = base.next_pow2(max(B, 8))
        slots_pad = np.full(B_pad, self.pool.capacity, np.int32)
        slots_pad[:B] = slots

        def pad(a, fill=0.0):
            out = np.full((B_pad,) + a.shape[1:], fill, a.dtype)
            out[:B] = a
            return out

        (self.pool.fields["m_ivar"], self.pool.fields["ivar"], self.pool.touched,
         self.pool.eff_level) = _bcm_apply(
            self.pool.fields["m_ivar"], self.pool.fields["ivar"], self.pool.touched,
            self.pool.eff_level,
            jnp.asarray(slots_pad), jnp.asarray(pad(means)),
            jnp.asarray(pad(variances, 1.0)), jnp.asarray(pad(present)),
            cfg.sf2, self.min_known_ivar, self.max_ivar,
            self.n, cfg.block_depth - 1, self._state_fn, cfg.block_depth > 1)

    def _make_state_fn(self):
        cfg = self.cfg
        return posterior.GPStateFn(cfg.l, 1.0 / cfg.min_var, 1.0 / cfg.max_known_var,
                                   cfg.free_thresh, cfg.occupied_thresh)

    def _posterior(self, fields):
        cfg = self.cfg
        mi, iv = fields["m_ivar"], fields["ivar"]
        with np.errstate(over="ignore", divide="ignore"):
            prob = 1.0 / (1.0 + np.exp(-cfg.l * mi / self.max_ivar))
            var = 1.0 / iv
        st = np.where(prob > cfg.occupied_thresh, posterior.OCCUPIED,
                      np.where(prob < cfg.free_thresh, posterior.FREE, posterior.UNKNOWN))
        st = np.where(iv < self.min_known_ivar, posterior.UNKNOWN, st)
        st = np.where(fields["touched"], st, posterior.UNKNOWN).astype(np.int8)
        return {"prob": prob, "var": var, "state": st,
                "m_ivar": np.asarray(mi), "ivar": np.asarray(iv)}
