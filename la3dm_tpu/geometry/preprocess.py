"""Scan → training-data generation (host-side, vectorized numpy).

Reproduces the reference's per-method ``get_training_data`` pipelines:

* BGK/GP: ``src/bgkoctomap/bgkoctomap.cpp:383-458`` — voxel-grid downsample of
  hits, max-range filter, free-space points sampled along each beam, then a
  second downsample of the free cloud.  GP labels free space −1
  (``src/gpoctomap/gpoctomap.cpp:399``), BGK labels it 0.
* BGKL: ``src/bgkloctomap/bgkloctomap.cpp:285-344`` — per-beam free-space
  *line segments* plus sample points used only for spatial indexing.
* BGKLV: ``src/bgklvoctomap/bgklvoctomap.cpp:303-423`` — BGKL plus ray
  shortening near other hits, over-range free rays, sensor-offset ray
  origins, and floor/downward-ray filtering.

All functions are pure numpy; shapes are data-dependent here (host side),
and are padded/bucketed before entering jitted device code.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def voxel_downsample(points: np.ndarray, leaf: float) -> np.ndarray:
    """Voxel-grid downsample: centroid of points per occupied voxel.

    Matches pcl::VoxelGrid (used at bgkoctomap.cpp:419-431): voxel index =
    floor(p/leaf) per axis, output = per-voxel centroid, ordered by
    (z-major) voxel index.  ``leaf < 0`` is a passthrough.
    """
    if leaf < 0 or len(points) == 0:
        return np.asarray(points, dtype=np.float32)
    pts = np.asarray(points, dtype=np.float32)
    ijk = np.floor(pts * np.float32(1.0 / leaf)).astype(np.int64)
    # PCL orders leaves by flattened index (x fastest, z slowest) — z-major
    # lexicographic.  The order matters downstream: LV's sequential
    # ray-shortening recurrence iterates hits in this order.
    order = np.lexsort((ijk[:, 0], ijk[:, 1], ijk[:, 2]))
    ijk_s, pts_s = ijk[order], pts[order]
    change = np.any(ijk_s[1:] != ijk_s[:-1], axis=1)
    start = np.concatenate([[0], np.nonzero(change)[0] + 1])
    counts = np.diff(np.concatenate([start, [len(ijk_s)]]))
    sums = np.add.reduceat(pts_s.astype(np.float64), start, axis=0)
    return (sums / counts[:, None]).astype(np.float32)


def beam_free_points(hits: np.ndarray, origin: np.ndarray, free_resolution: float,
                     backward: bool) -> tuple[np.ndarray, np.ndarray]:
    """Sample free-space points along each origin→hit beam.

    forward (BGK/GP, bgkoctomap.cpp:433-458): d = fr, 2fr, … < l, plus one
    point at l − fr if l > fr.
    backward (BGKL/LV, bgkloctomap.cpp:360-383): d = l − fr, l − 2fr, … > 0.

    Returns (points [M,3], beam_index [M]) with beam_index into ``hits``.
    """
    hits = np.asarray(hits, dtype=np.float32).reshape(-1, 3)
    origin = np.asarray(origin, dtype=np.float32).reshape(3)
    H = len(hits)
    if H == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0,), np.int64)
    diff = hits - origin
    l = np.sqrt((diff.astype(np.float32) ** 2).sum(-1)).astype(np.float32)
    n = diff / l[:, None]
    fr = np.float32(free_resolution)

    Kmax = max(int(np.floor(float(l.max()) / float(fr))) + 1, 1)
    k = np.arange(1, Kmax + 1, dtype=np.float32)[None, :]          # [1,K]
    if backward:
        d = l[:, None] - k * fr                                    # l−fr, l−2fr, …
        mask = d > 0.0
    else:
        d = (k * fr).astype(np.float32) * np.ones((H, 1), np.float32)
        mask = d < l[:, None]
    rows, cols = np.nonzero(mask)
    pts = origin + n[rows] * d[rows, cols][:, None]
    idx = rows.astype(np.int64)
    if not backward:
        # the extra point at l − fr for beams longer than fr (bgkoctomap.cpp:456-457)
        extra = l > fr
        epts = origin + n[extra] * (l[extra] - fr)[:, None]
        # interleave per beam: order within a beam doesn't matter downstream
        pts = np.concatenate([pts, epts.astype(np.float32)])
        idx = np.concatenate([idx, np.nonzero(extra)[0].astype(np.int64)])
        order = np.argsort(idx, kind="stable")
        pts, idx = pts[order], idx[order]
    return pts.astype(np.float32), idx


@dataclasses.dataclass
class PointTrainingData:
    """BGK/GP training set: labeled points (hits first, then frees)."""

    points: np.ndarray  # [N,3] f32
    labels: np.ndarray  # [N]   f32 (1 occupied; 0 free for BGK, -1 for GP)


@dataclasses.dataclass
class SegmentTrainingData:
    """BGKL/LV training set: occupied points + free rays + ray sample points.

    ``samples``/``sample_ray`` are the R-tree proxy points of each ray
    (origin + beam samples); ``hits`` are the occupied endpoints (degenerate
    segments in the reference).
    """

    hits: np.ndarray        # [H,3] f32 occupied endpoints
    rays: np.ndarray        # [R,6] f32 free segments (start,end)
    samples: np.ndarray     # [S,3] f32 free sample points (incl. ray origins)
    sample_ray: np.ndarray  # [S]   int64 ray id per sample
    #: optional [2,3] (min,max) over hits ∪ samples — the R-tree extent used
    #: by the candidate block sweep; filled by the native path to spare a
    #: host reduction over the sample table
    bbox: np.ndarray | None = None


def bgk_training_data(cloud: np.ndarray, origin: np.ndarray, ds_resolution: float,
                      free_resolution: float, max_range: float,
                      free_label: float = 0.0) -> PointTrainingData:
    """BGK/GP pipeline (bgkoctomap.cpp:383-417; free_label=-1 for GP)."""
    origin = np.asarray(origin, dtype=np.float32).reshape(3)
    hits = voxel_downsample(cloud, ds_resolution)
    if len(hits):
        # max-range filter in double precision (bgkoctomap.cpp:394-397)
        d = np.linalg.norm(hits.astype(np.float64) - origin.astype(np.float64), axis=1)
        hits = hits[(max_range <= 0) | (d <= max_range)]
    free_pts, beam_idx = beam_free_points(hits, origin, free_resolution, backward=False)
    # frees cloud includes the origin once per hit (bgkoctomap.cpp:404)
    origins = np.repeat(origin[None, :], len(hits), axis=0)
    frees = np.concatenate([origins, free_pts], axis=0) if len(hits) else free_pts
    frees = voxel_downsample(frees, ds_resolution)
    points = np.concatenate([hits, frees], axis=0).astype(np.float32)
    labels = np.concatenate(
        [np.ones(len(hits), np.float32), np.full(len(frees), free_label, np.float32)]
    )
    return PointTrainingData(points=points, labels=labels)


def bgkl_training_data(cloud: np.ndarray, origin: np.ndarray, ds_resolution: float,
                       free_resolution: float, max_range: float) -> SegmentTrainingData:
    """BGKL pipeline (bgkloctomap.cpp:285-344).

    Per in-range hit: the hit endpoint (recomputed as origin + n·l in float32,
    :316), a free ray (origin, origin + n·(l−fr)) (:335-338), and the ray's
    R-tree proxy samples: the origin (:328) plus backward beam samples (:325).
    """
    origin = np.asarray(origin, dtype=np.float32).reshape(3)
    hits_ds = voxel_downsample(cloud, ds_resolution)
    if len(hits_ds):
        d = np.linalg.norm(hits_ds.astype(np.float64) - origin.astype(np.float64), axis=1)
        hits_ds = hits_ds[(max_range <= 0) | (d <= max_range)]
    diff = hits_ds - origin
    l = np.sqrt((diff ** 2).sum(-1)).astype(np.float32)
    n = diff / np.maximum(l, 1e-30)[:, None]
    occ = (origin + n * l[:, None]).astype(np.float32)

    free_pts, beam_idx = beam_free_points(occ, origin, free_resolution, backward=True)
    ray_ends = (origin + n * (l - np.float32(free_resolution))[:, None]).astype(np.float32)
    rays = np.concatenate([np.repeat(origin[None], len(occ), 0), ray_ends], axis=1)

    samples = np.concatenate([np.repeat(origin[None], len(occ), 0), free_pts], axis=0)
    sample_ray = np.concatenate([np.arange(len(occ), dtype=np.int64), beam_idx])
    return SegmentTrainingData(hits=occ, rays=rays.astype(np.float32),
                               samples=samples.astype(np.float32), sample_ray=sample_ray)


def bgklv_training_data(cloud: np.ndarray, origin: np.ndarray, ds_resolution: float,
                        free_resolution: float, max_range: float,
                        ell: float) -> SegmentTrainingData:
    """BGKLV pipeline (bgklvoctomap.cpp:303-423).

    Ray preprocessing: beams shortened by ℓ√2; over-range beams kept as free
    rays at max_range; beams shrunk where they pass within ℓ of other hits;
    free-ray origins pushed ≥ ℓ from the sensor; short downward rays dropped;
    floor-aware nearby-point filtering.
    """
    origin64 = np.asarray(origin, dtype=np.float64).reshape(3)
    origin = np.asarray(origin, dtype=np.float32).reshape(3)
    hits_ds = voxel_downsample(cloud, ds_resolution)
    offset = np.float64(ell) * np.sqrt(2.0)
    influence = np.float64(ell)

    H = len(hits_ds)
    if H == 0:
        return SegmentTrainingData(
            hits=np.zeros((0, 3), np.float32), rays=np.zeros((0, 6), np.float32),
            samples=np.zeros((0, 3), np.float32), sample_ray=np.zeros((0,), np.int64))

    p64 = hits_ds.astype(np.float64)
    l0 = np.linalg.norm(p64 - origin64, axis=1)                      # double norm (:317)
    ndir = ((hits_ds - origin) / np.maximum(l0, 1e-300)[:, None].astype(np.float32)).astype(np.float32)

    in_range = (max_range > 0) & (l0 < max_range)
    # float32 recompute then shorten (:324-333)
    l_f32 = np.sqrt(((hits_ds - origin) ** 2).sum(-1)).astype(np.float32)
    l_work = np.where(in_range, l_f32 - offset, np.float64(max_range) - offset)
    if max_range <= 0:
        l_work = l0.copy()  # quirk: no shortening, no hits emitted (ref :323-334)

    # nearby-point candidate masks (:339-366), computed densely over hit pairs
    range_ok = (max_range <= 0) | (l0 <= max_range)
    free_endpt = origin + ndir * l_work[:, None].astype(np.float32)
    # floor filter: skip p0 if p.z > offset+origin.z and p0.z < origin.z+influence (:352-354)
    floor_skip = (p64[:, 2] > offset + origin64[2])[:, None] & \
                 (p64[None, :, 2] < origin64[2] + influence)
    dist1 = np.linalg.norm(free_endpt.astype(np.float64)[:, None, :] - p64[None, :, :], axis=2)
    dist2 = np.linalg.norm(origin64[None, :] - p64, axis=1)[None, :]
    nearby = range_ok[None, :] & ~floor_skip & (
        (dist1 < influence) | ((dist1 < l_work[:, None]) & (dist2 < l_work[:, None]))
    )

    # sequential ray shortening (:368-386): for each ray i iterate nearby j in
    # hit order; l updates feed later iterations (b > l² check uses running l)
    line_vec = (free_endpt - origin).astype(np.float32)
    lv_sq = (line_vec.astype(np.float64) ** 2).sum(-1)
    lv_norm = np.sqrt(lv_sq)
    l_run = l_work.astype(np.float64).copy()
    nearest_pt = p64.copy()  # nearest_point initialised to the hit (:336)
    for j in range(H):
        pnt_vec = p64[j][None, :] - origin64[None, :]
        b = (pnt_vec * line_vec.astype(np.float64)).sum(-1)          # [H]
        proj_ok = b <= l_run ** 2
        nearest = origin64[None, :] + line_vec.astype(np.float64) * (b / np.maximum(lv_sq, 1e-300))[:, None]
        dist = np.linalg.norm(p64[j][None, :] - nearest, axis=1)
        upd = nearby[:, j] & proj_ok & (dist < influence)
        l_run = np.where(upd, b / np.maximum(lv_norm, 1e-300), l_run)
        nearest_pt = np.where(upd[:, None], p64[j][None, :], nearest_pt)

    # drop short downward rays (:388-391)
    drop = (l_run < np.float64(max_range) / 5.0) & (l_run / (offset - nearest_pt[:, 2]) > 0)

    keep = ~drop
    l_fin = l_run[keep].astype(np.float32)
    nk = ndir[keep]
    end = origin + nk * l_fin[:, None]
    mu = 1.0
    push = np.float32(influence * mu)
    far = l_fin > push
    free_origin = np.where(far[:, None], origin + nk * push, end).astype(np.float32)

    free_pts, beam_idx = _beam_backward_pairs(end, free_origin, free_resolution)
    samples = np.concatenate([free_origin, free_pts], axis=0)
    sample_ray = np.concatenate([np.arange(keep.sum(), dtype=np.int64), beam_idx])
    rays = np.concatenate([free_origin, end], axis=1).astype(np.float32)
    return SegmentTrainingData(
        hits=hits_ds[in_range].astype(np.float32),
        rays=rays, samples=samples.astype(np.float32), sample_ray=sample_ray)


def _beam_backward_pairs(ends: np.ndarray, starts: np.ndarray,
                         free_resolution: float) -> tuple[np.ndarray, np.ndarray]:
    """Backward beam samples between per-ray start/end (bgklvoctomap beam_sample)."""
    pts, idx = [], []
    fr = np.float32(free_resolution)
    for i in range(len(ends)):
        diff = ends[i] - starts[i]
        l = np.float32(np.sqrt((diff ** 2).sum()))
        if l <= 0:
            continue
        n = diff / l
        k = np.arange(1, int(np.ceil(l / fr)) + 1, dtype=np.float32)
        d = l - k * fr
        d = d[d > 0]
        if len(d):
            pts.append(starts[i] + n * d[:, None])
            idx.append(np.full(len(d), i, dtype=np.int64))
    if not pts:
        return np.zeros((0, 3), np.float32), np.zeros((0,), np.int64)
    return np.concatenate(pts).astype(np.float32), np.concatenate(idx)
