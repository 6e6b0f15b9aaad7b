"""Oracle map families — literal reference pipelines over OracleBlock trees."""

from __future__ import annotations

import numpy as np

from tests.oracle.reference_impl import (
    OracleMapBase, OracleBlock, beam_sample_backward, beam_sample_forward,
    cov_matern32, cov_sparse, cov_sparse_line, voxel_downsample, f32,
)

FREE, OCCUPIED, UNKNOWN, UNCERTAIN = 0, 1, 2, 3


def _in_box(points, lo, hi):
    """Closed-interval box query (the R-tree overlap test is closed)."""
    return np.all((points >= lo) & (points <= hi), axis=1)


class OracleBGK(OracleMapBase):
    GATE = 0.0
    free_label = 0.0

    def default_value(self):
        return np.array([self.cfg.prior_A, self.cfg.prior_B], f32)

    def classify(self, val):
        A, B = float(val[0]), float(val[1])
        var = (A * B) / ((A + B) ** 2 * (A + B + 1.0))
        if var > self.cfg.var_thresh:
            return UNKNOWN
        p = A / (A + B)
        return OCCUPIED if p > self.cfg.occupied_thresh else (FREE if p < self.cfg.free_thresh else UNKNOWN)

    def training_data(self, cloud, origin, ds, fr, mr):
        origin = np.asarray(origin, f32)
        hits = voxel_downsample(cloud, ds)
        keep, frees = [], []
        for p in hits:
            if mr > 0 and np.linalg.norm(p.astype(np.float64) - origin.astype(np.float64)) > mr:
                continue
            keep.append(p)
            frees.append(origin)
            frees.extend(beam_sample_forward(p, origin, f32(fr)))
        keep = np.array(keep, f32).reshape(-1, 3)
        frees = voxel_downsample(np.array(frees, f32).reshape(-1, 3), ds)
        pts = np.concatenate([keep, frees])
        labels = np.concatenate([np.ones(len(keep), f32),
                                 np.full(len(frees), self.free_label, f32)])
        return pts, labels

    def insert_pointcloud(self, cloud, origin, ds, fr, mr):
        pts, labels = self.training_data(cloud, origin, ds, fr, mr)
        if len(pts) == 0:
            return
        self.insert_training(pts, labels)

    def insert_training(self, pts, labels):
        point_blocks = self.point_blocks(pts)
        candidates = set()
        for c in point_blocks:
            candidates.update(self.extended(c))
        half = self.bs / 2.0
        models = {}
        test_blocks = []
        for c in sorted(candidates):
            ctr = self.block_center_of(c)
            if any(tuple(b) in point_blocks or _in_box(
                    pts, self.block_center_of(b) - half, self.block_center_of(b) + half).any()
                   for b in self.extended(c)):
                test_blocks.append(c)
        for c in sorted(point_blocks | candidates):
            ctr = self.block_center_of(c)
            m = _in_box(pts, ctr - half, ctr + half)
            if m.any():
                models[c] = (pts[m], labels[m])
        for c in test_blocks:
            blk = self.get_block(c)
            items = blk.leaf_items()
            xs = np.array([blk.node_center(d, i) for (d, i), _ in items], f32).reshape(-1, 3)
            for nb in self.extended(c):
                if nb not in models:
                    continue
                X, y = models[nb]
                K = cov_sparse(xs, X, self.cfg.sf2, self.cfg.ell)
                ybar = (K @ y.astype(f32)).astype(f32)
                kbar = K.sum(axis=1).astype(f32)
                for j, ((d, i), leaf) in enumerate(items):
                    if kbar[j] > self.GATE:
                        leaf.value[0] = f32(leaf.value[0] + ybar[j])
                        leaf.value[1] = f32(leaf.value[1] + (kbar[j] - ybar[j]))
                        leaf.classified = True
                        leaf.state = self.classify(leaf.value)
        for c in test_blocks:
            self.blocks[c].prune(self.classify)


class OracleGP(OracleMapBase):
    free_label = -1.0

    def __init__(self, cfg):
        super().__init__(cfg)
        self.min_ivar = 1.0 / cfg.max_var
        self.max_ivar = 1.0 / cfg.min_var
        self.min_known_ivar = 1.0 / cfg.max_known_var

    def default_value(self):
        return np.array([0.0, self.min_ivar], f32)  # (m_ivar, ivar)

    def classify(self, val):
        mi, iv = float(val[0]), float(val[1])
        if iv < self.min_known_ivar:
            return UNKNOWN
        p = 1.0 / (1.0 + np.exp(-self.cfg.l * mi / self.max_ivar))
        return OCCUPIED if p > self.cfg.occupied_thresh else (FREE if p < self.cfg.free_thresh else UNKNOWN)

    training_data = OracleBGK.training_data
    insert_pointcloud = OracleBGK.insert_pointcloud

    def insert_training(self, pts, labels):
        point_blocks = self.point_blocks(pts)
        candidates = set()
        for c in point_blocks:
            candidates.update(self.extended(c))
        half = self.bs / 2.0
        models, test_blocks = {}, []
        for c in sorted(candidates):
            if any(_in_box(pts, self.block_center_of(b) - half, self.block_center_of(b) + half).any()
                   for b in self.extended(c)):
                test_blocks.append(c)
        for c in sorted(point_blocks | candidates):
            ctr = self.block_center_of(c)
            m = _in_box(pts, ctr - half, ctr + half)
            if m.any():
                X, y = pts[m], labels[m]
                K = cov_matern32(X, X, self.cfg.sf2, self.cfg.ell) + f32(self.cfg.noise) * np.eye(len(X), dtype=f32)
                L = np.linalg.cholesky(K.astype(np.float64)).astype(f32)
                alpha = np.linalg.solve(L.T.astype(np.float64),
                                        np.linalg.solve(L.astype(np.float64), y.astype(np.float64))).astype(f32)
                models[c] = (X, L, alpha)
        for c in test_blocks:
            blk = self.get_block(c)
            items = blk.leaf_items()
            xs = np.array([blk.node_center(d, i) for (d, i), _ in items], f32).reshape(-1, 3)
            for nb in self.extended(c):
                if nb not in models:
                    continue
                X, L, alpha = models[nb]
                Ks = cov_matern32(X, xs, self.cfg.sf2, self.cfg.ell)
                mean = (Ks.T @ alpha).astype(f32)
                v = np.linalg.solve(L.astype(np.float64), Ks.astype(np.float64)).astype(f32)
                var = (f32(self.cfg.sf2) - (v * v).sum(axis=0)).astype(f32)
                for j, ((d, i), leaf) in enumerate(items):
                    # gpoctree_node.cpp:36-49 (sequential, persistent chop)
                    leaf.value[1] = f32(leaf.value[1] + 1.0 / var[j] - self.cfg.sf2)
                    leaf.value[0] = f32(leaf.value[0] + mean[j] / var[j])
                    leaf.classified = True
                    if leaf.value[1] >= self.min_known_ivar:
                        leaf.value[1] = min(leaf.value[1], f32(self.max_ivar))
                    leaf.state = self.classify(leaf.value)
        for c in test_blocks:
            self.blocks[c].prune(self.classify)


class OracleBGKL(OracleMapBase):
    GATE = 0.001

    def default_value(self):
        return np.array([self.cfg.prior_A, self.cfg.prior_B], f32)

    classify = OracleBGK.classify

    def training_data(self, cloud, origin, ds, fr, mr):
        """bgkloctomap.cpp:285-344: xy points (hit/origin/samples), rays, ray_idx."""
        origin = np.asarray(origin, f32)
        hits = voxel_downsample(cloud, ds)
        xy, ray_idx, rays = [], [], []
        idx = 0
        for p in hits:
            if mr > 0 and np.linalg.norm(p.astype(np.float64) - origin.astype(np.float64)) > mr:
                continue
            l = f32(np.sqrt(((p - origin) ** 2).sum()))
            n = (p - origin) / l
            occ = origin + n * l
            xy.append((occ, 1.0)); ray_idx.append(-1)
            xy.append((origin, 0.0)); ray_idx.append(idx)
            for s in beam_sample_backward(occ, origin, f32(fr)):
                xy.append((s, 0.0)); ray_idx.append(idx)
            end = origin + n * f32(l - fr)
            rays.append(np.concatenate([origin, end]))
            idx += 1
        return xy, np.array(ray_idx), np.array(rays, f32).reshape(-1, 6)

    def insert_pointcloud(self, cloud, origin, ds, fr, mr):
        xy, ray_idx, rays = self.training_data(cloud, origin, ds, fr, mr)
        if not xy:
            return
        pts = np.array([p for p, _ in xy], f32)
        point_blocks = self.point_blocks(pts)
        candidates = set()
        for c in point_blocks:
            candidates.update(self.extended(c))
        half = self.bs / 2.0
        models, test_blocks = {}, []
        for c in sorted(candidates):
            if any(_in_box(pts, self.block_center_of(b) - half, self.block_center_of(b) + half).any()
                   for b in self.extended(c)):
                test_blocks.append(c)
        for c in sorted(point_blocks | candidates):
            ctr = self.block_center_of(c)
            sel = np.nonzero(_in_box(pts, ctr - half, ctr + half))[0]
            if len(sel) == 0:
                continue
            segs, labels, seen = [], [], set()
            for k in sel:  # bgkloctomap.cpp:145-172
                r = int(ray_idx[k])
                if r == -1:
                    segs.append(np.concatenate([pts[k], pts[k]])); labels.append(1.0)
                elif r not in seen:
                    seen.add(r)
                    segs.append(rays[r]); labels.append(0.0)
            models[c] = (np.array(segs, f32), np.array(labels, f32))
        for c in test_blocks:
            blk = self.get_block(c)
            items = blk.leaf_items()
            xs = np.array([blk.node_center(d, i) for (d, i), _ in items], f32).reshape(-1, 3)
            for nb in self.extended(c):
                if nb not in models:
                    continue
                S, y = models[nb]
                K = cov_sparse_line(xs, S, self.cfg.sf2, self.cfg.ell, lv=False)
                ybar = (K @ y).astype(f32)
                kbar = K.sum(axis=1).astype(f32)
                for j, ((d, i), leaf) in enumerate(items):
                    if kbar[j] > self.GATE:
                        leaf.value[0] = f32(leaf.value[0] + ybar[j])
                        leaf.value[1] = f32(leaf.value[1] + (kbar[j] - ybar[j]))
                        leaf.classified = True
                        leaf.state = self.classify(leaf.value)
        for c in test_blocks:
            self.blocks[c].prune(self.classify)


class OracleBGKLV(OracleMapBase):
    GATE = 0.001

    def default_value(self):
        return np.array([self.cfg.prior_A, self.cfg.prior_B], f32)

    def classify(self, val):
        A, B = float(val[0]), float(val[1])
        W = max(A + B, self.cfg.min_W)
        p = (A / (W - B) + (W - A - B) * 0.5 / (W - B)) if A > B else 0.5 * (W - B - A) / (W - A)
        var = A / W * (1 - p) ** 2 + (W - A - B) / W * (0.5 - p) ** 2 + B / W * p ** 2
        if var > self.cfg.var_thresh:
            return UNCERTAIN
        return OCCUPIED if p > self.cfg.occupied_thresh else (FREE if p < self.cfg.free_thresh else UNKNOWN)

    def training_data(self, cloud, origin, ds, fr, mr):
        """bgklvoctomap.cpp:303-423, literal per-hit loops."""
        origin = np.asarray(origin, f32)
        o64 = origin.astype(np.float64)
        hits = voxel_downsample(cloud, ds)
        offset = self.cfg.ell * np.sqrt(2.0)
        influence = float(self.cfg.ell)
        xy, ray_idx, rays = [], [], []
        idx = 0
        for p in hits:
            l = float(np.linalg.norm(p.astype(np.float64) - o64))
            nx = (p - origin) / f32(l)
            if mr > 0:
                if l < mr:
                    l = float(f32(np.sqrt(((p - origin) ** 2).sum()))) - offset
                    xy.append((p, 1.0)); ray_idx.append(-1)
                else:
                    l = mr - offset
            nearest_point = p.astype(np.float64)
            free_endpt = origin + nx * f32(l)
            nearby = []
            for p0 in hits:
                if mr > 0 and np.linalg.norm(p0.astype(np.float64) - o64) > mr:
                    continue
                if p[2] > offset + o64[2] and p0[2] < o64[2] + influence:
                    continue
                d1 = float(np.linalg.norm(free_endpt.astype(np.float64) - p0.astype(np.float64)))
                d2 = float(np.linalg.norm(o64 - p0.astype(np.float64)))
                if d1 < influence or (d1 < l and d2 < l):
                    nearby.append(p0)
            line_vec = (free_endpt - origin).astype(f32)
            lv_sq = float(np.dot(line_vec.astype(np.float64), line_vec.astype(np.float64)))
            for p1 in nearby:
                b = float(np.dot(p1.astype(np.float64) - o64, line_vec.astype(np.float64)))
                if b > l ** 2:
                    continue
                nearest = o64 + line_vec.astype(np.float64) * (b / lv_sq)
                dist = float(np.linalg.norm(p1.astype(np.float64) - nearest))
                if dist < influence:
                    nearest_point = p1.astype(np.float64)
                    l = b / np.sqrt(lv_sq)
            # dropped rays do NOT consume an idx: the reference's continue
            # skips the ++idx at the loop end (bgklvoctomap.cpp:388-391, :420)
            if l < mr / 5.0 and l / (offset - nearest_point[2]) > 0:
                continue
            free_endpt = origin + nx * f32(l)
            mu = 1.0
            if l > influence * mu:
                free_origin = origin + nx * f32(influence * mu)
            else:
                free_origin = free_endpt
            xy.append((free_origin, 0.0)); ray_idx.append(idx)
            for s in beam_sample_backward(free_endpt, free_origin, f32(fr)):
                xy.append((s, 0.0)); ray_idx.append(idx)
            rays.append(np.concatenate([free_origin, free_endpt]))
            idx += 1
        return xy, np.array(ray_idx), np.array(rays, f32).reshape(-1, 6)

    def insert_pointcloud(self, cloud, origin, ds, fr, mr):
        ds = min(ds, self.cfg.resolution)
        xy, ray_idx, rays = self.training_data(cloud, origin, ds, fr, mr)
        if not xy:
            return
        pts = np.array([p for p, _ in xy], f32)
        lim_min, lim_max = pts.min(0).astype(np.float64), pts.max(0).astype(np.float64)
        # literal float-stepped candidate sweep (bgkloctomap.cpp:409-418)
        cands = []
        x = lim_min[0] - self.bs
        while x <= lim_max[0] + 2 * self.bs:
            y = lim_min[1] - self.bs
            while y <= lim_max[1] + 2 * self.bs:
                z = lim_min[2] - self.bs
                while z <= lim_max[2] + 2 * self.bs:
                    cands.append(self.block_coord((x, y, z)))
                    z += self.bs
                y += self.bs
            x += self.bs
        ell = f32(self.cfg.ell)
        test_blocks = []
        for c in cands:
            blk = self.get_block(c)
            updated = False
            for (d, i), leaf in blk.leaf_items():
                if blk.node_size(d) > self.res:
                    continue
                p = blk.node_center(d, i)
                sel = np.nonzero(_in_box(pts, p - ell, p + ell))[0]
                if len(sel) == 0:
                    continue
                segs, labels, seen = [], [], set()
                for k in sel:  # bgklvoctomap.cpp:184-205
                    r = int(ray_idx[k])
                    if r == -1:
                        segs.append(np.concatenate([pts[k], pts[k]])); labels.append(1.0)
                    elif r not in seen:
                        seen.add(r)
                        segs.append(rays[r]); labels.append(0.0)
                K = cov_sparse_line(p[None, :], np.array(segs, f32),
                                    self.cfg.sf2, self.cfg.ell, lv=True)
                ybar = float((K @ np.array(labels, f32))[0])
                kbar = float(K.sum())
                if kbar > self.GATE:
                    leaf.value[0] = f32(leaf.value[0] + ybar)
                    leaf.value[1] = f32(leaf.value[1] + (kbar - ybar))
                    leaf.classified = True
                    leaf.state = self.classify(leaf.value)
                    updated = True
            if updated:
                test_blocks.append(c)
        if self.cfg.original_size:
            for c in test_blocks:
                self.blocks[c].prune(self.classify)
