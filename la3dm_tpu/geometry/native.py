"""ctypes bindings for the native host-preprocessing library.

Builds/loads ``native/libla3dm_host.so`` (C++, see native/host_preprocess.cpp)
and exposes :func:`lv_training_data` with the same output contract as the
numpy implementation in geometry/preprocess.py.  Falls back silently to
numpy when no compiler/library is available (``available()`` reports which).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO = os.path.join(_NATIVE_DIR, "libla3dm_host.so")
_SRC = os.path.join(_NATIVE_DIR, "host_preprocess.cpp")

_lib = None
_tried = False
_load_lock = threading.Lock()  # insert_pointclouds preprocesses in a pool


def _load():
    global _lib, _tried
    if _tried:  # benign race: worst case a few threads fall through to the lock
        return _lib
    with _load_lock:
        if _tried:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                # -ffp-contract=off: no FMA contraction — float expressions
                # round exactly like numpy's, keeping training points
                # bit-identical to the numpy path (the k̄ update gate sits on
                # the sparse kernel's support boundary, so ulps matter).
                # Build to a temp path + atomic rename so a concurrent process
                # never dlopens a partially written library.
                tmp = f"{_SO}.build.{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-ffp-contract=off",
                     "-shared", "-fPIC", "-o", tmp, _SRC],
                    check=True, capture_output=True)
                os.replace(tmp, _SO)
            _lib = _bind(ctypes.CDLL(_SO))
        except Exception:
            _lib = None
        _tried = True
        return _lib


def _bind(lib):
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        ip = ctypes.POINTER(ctypes.c_int)
        lib.lv_training_data.restype = ctypes.c_int
        lib.lv_training_data.argtypes = [
            f32p, ctypes.c_int, f32p,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            f32p, ip, f32p, ip, f32p, i32p, ip,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
        ]
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.lv_tile_tables.restype = ctypes.c_int
        lib.lv_tile_tables.argtypes = [
            f32p, ctypes.c_int, f32p, i32p, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            i64p, i32p, i32p, i32p, i32p, i32p, i32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ip, ip, ip,
        ]
        lib.lv_tile_tables_ray.restype = ctypes.c_int
        lib.lv_tile_tables_ray.argtypes = [
            f32p, ctypes.c_int, f32p, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            i64p, i32p, i32p, i32p, i32p, i32p, i32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ip, ip, ip,
        ]
        lib.bgk_training_data.restype = ctypes.c_int
        lib.bgk_training_data.argtypes = [
            f32p, ctypes.c_int, f32p,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            f32p, ip, f32p, ip,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.bgkl_training_data.restype = ctypes.c_int
        lib.bgkl_training_data.argtypes = [
            f32p, ctypes.c_int, f32p,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            f32p, ip, f32p, ip, f32p, i32p, ip,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        lp = ctypes.POINTER(ctypes.c_longlong)
        lib.row_tables.restype = ctypes.c_int
        lib.row_tables.argtypes = [
            i32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i32p, i8p, lp,
            i32p, i64p, i32p, lp, i64p,
            ctypes.c_longlong, ctypes.c_longlong,
        ]
        lib.bgkl_scan_tables.restype = ctypes.c_int
        lib.bgkl_scan_tables.argtypes = [
            f32p, ctypes.c_int, f32p, ctypes.c_int,
            f32p, i32p, ctypes.c_int,
            ctypes.c_double, i64p, ctypes.c_int,
            f32p, f32p, ip,
            i64p, i32p, i32p, ip,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.scan_bucket_tables.restype = ctypes.c_int
        lib.scan_bucket_tables.argtypes = [
            f32p, f32p, ctypes.c_int, ctypes.c_double,
            i64p, ctypes.c_int,
            f32p, f32p, ip,
            i64p, i32p, i32p, i32p, ip,
            i64p, i32p, i32p, ip,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        return lib


def available() -> bool:
    return _load() is not None


def lv_training_data(cloud: np.ndarray, origin: np.ndarray, ds: float, fr: float,
                     max_range: float, ell: float):
    """Native BGKLV training-data build; returns a SegmentTrainingData or
    None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    from la3dm_tpu.geometry.preprocess import SegmentTrainingData

    cloud = np.ascontiguousarray(cloud, np.float32)
    origin = np.ascontiguousarray(np.asarray(origin, np.float32).reshape(3))
    n = len(cloud)
    max_h, max_r = n + 8, n + 8
    max_s = 64
    while True:
        max_s = max(max_s, int((max_range / max(fr, 1e-6) + 2) * max_r))
        hits = np.empty((max_h, 3), np.float32)
        rays = np.empty((max_r, 6), np.float32)
        samples = np.empty((max_s, 3), np.float32)
        sample_ray = np.empty(max_s, np.int32)
        nh, nr, ns = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
        bbox = np.empty(6, np.float32)
        rc = lib.lv_training_data(
            cloud.reshape(-1), n, origin, ds, fr, max_range, ell,
            hits.reshape(-1), ctypes.byref(nh), rays.reshape(-1), ctypes.byref(nr),
            samples.reshape(-1), sample_ray, ctypes.byref(ns),
            max_h, max_r, max_s, bbox)
        if rc == 0:
            break
        max_h *= 2
        max_r *= 2
        max_s *= 2
    return SegmentTrainingData(
        hits=hits[:nh.value].copy(), rays=rays[:nr.value].copy(),
        samples=samples[:ns.value].copy(),
        sample_ray=sample_ray[:ns.value].astype(np.int64),
        bbox=bbox.reshape(2, 3).copy() if (nh.value or ns.value) else None)


def lv_tile_tables(hits: np.ndarray, samples: np.ndarray, sample_ray: np.ndarray,
                   ts: float, halo: float, shift: float):
    """Per-tile hit/ray segment tables (see host_preprocess.cpp).

    Returns (tile_keys [Ta], h_start, h_count, r_start, r_count,
    hits_flat, rays_flat) or None when the library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    hits = np.ascontiguousarray(hits, np.float32)
    samples = np.ascontiguousarray(samples, np.float32)
    sample_ray = np.ascontiguousarray(sample_ray, np.int32)
    H, S = len(hits), len(samples)
    max_t = 32 * max(H + S, 8)
    max_hf = 32 * max(H, 8)
    max_rf = 32 * max(S, 8)
    while True:
        keys = np.empty(max_t, np.int64)
        hs = np.empty(max_t, np.int32)
        hc = np.empty(max_t, np.int32)
        rs = np.empty(max_t, np.int32)
        rc_ = np.empty(max_t, np.int32)
        hf = np.empty(max_hf, np.int32)
        rf = np.empty(max_rf, np.int32)
        nt, nhf, nrf = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
        rc = lib.lv_tile_tables(
            hits.reshape(-1), H, samples.reshape(-1), sample_ray, S,
            float(ts), float(halo), float(shift),
            keys, hs, hc, rs, rc_, hf, rf,
            max_t, max_hf, max_rf,
            ctypes.byref(nt), ctypes.byref(nhf), ctypes.byref(nrf))
        if rc == 0:
            break
        max_t *= 2
        max_hf *= 2
        max_rf *= 2
    Ta = nt.value
    return (keys[:Ta].copy(), hs[:Ta].copy(), hc[:Ta].copy(),
            rs[:Ta].copy(), rc_[:Ta].copy(),
            hf[:nhf.value].copy(), rf[:nrf.value].copy())


def lv_tile_tables_ray(hits: np.ndarray, rays: np.ndarray,
                       ts: float, halo: float, shift: float):
    """Segment event-walk tile tables (see host_preprocess.cpp) — same output
    contract as :func:`lv_tile_tables`, built from ray segments directly
    (a slight superset of the proxy-sample set; exact membership is re-tested
    on device).  Returns None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    hits = np.ascontiguousarray(hits, np.float32)
    rays = np.ascontiguousarray(rays, np.float32)
    H, R = len(hits), len(rays)
    max_t = 64 * max(H + R, 8)
    max_hf = 16 * max(H, 8)
    max_rf = 128 * max(R, 8)
    while True:
        keys = np.empty(max_t, np.int64)
        hs = np.empty(max_t, np.int32)
        hc = np.empty(max_t, np.int32)
        rs = np.empty(max_t, np.int32)
        rc_ = np.empty(max_t, np.int32)
        hf = np.empty(max_hf, np.int32)
        rf = np.empty(max_rf, np.int32)
        nt, nhf, nrf = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
        rc = lib.lv_tile_tables_ray(
            hits.reshape(-1), H, rays.reshape(-1), R,
            float(ts), float(halo), float(shift),
            keys, hs, hc, rs, rc_, hf, rf,
            max_t, max_hf, max_rf,
            ctypes.byref(nt), ctypes.byref(nhf), ctypes.byref(nrf))
        if rc == 0:
            break
        max_t *= 2
        max_hf *= 2
        max_rf *= 2
    Ta = nt.value
    return (keys[:Ta].copy(), hs[:Ta].copy(), hc[:Ta].copy(),
            rs[:Ta].copy(), rc_[:Ta].copy(),
            hf[:nhf.value].copy(), rf[:nrf.value].copy())


def bgk_training_data(cloud: np.ndarray, origin: np.ndarray, ds: float, fr: float,
                      max_range: float, free_label: float = 0.0):
    """Native BGK/GP training-data build (hits + downsampled frees); returns
    a PointTrainingData or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    from la3dm_tpu.geometry.preprocess import PointTrainingData

    cloud = np.ascontiguousarray(cloud, np.float32)
    origin = np.ascontiguousarray(np.asarray(origin, np.float32).reshape(3))
    n = len(cloud)
    max_h = n + 8
    # frees are downsampled to ds cells — bounded by beam volume; start
    # generous and double on overflow
    max_f = max(4 * n, 1024)
    while True:
        hits = np.empty((max_h, 3), np.float32)
        frees = np.empty((max_f, 3), np.float32)
        nh, nf = ctypes.c_int(), ctypes.c_int()
        rc = lib.bgk_training_data(
            cloud.reshape(-1), n, origin, ds, fr, max_range,
            hits.reshape(-1), ctypes.byref(nh), frees.reshape(-1), ctypes.byref(nf),
            max_h, max_f)
        if rc == 0:
            break
        max_h *= 2
        max_f *= 2
    H, F = nh.value, nf.value
    points = np.concatenate([hits[:H], frees[:F]], axis=0)
    labels = np.concatenate([np.ones(H, np.float32),
                             np.full(F, free_label, np.float32)])
    return PointTrainingData(points=points, labels=labels)


def bgkl_training_data(cloud: np.ndarray, origin: np.ndarray, ds: float, fr: float,
                       max_range: float):
    """Native BGKL training-data build; returns a SegmentTrainingData or
    None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    from la3dm_tpu.geometry.preprocess import SegmentTrainingData

    cloud = np.ascontiguousarray(cloud, np.float32)
    origin = np.ascontiguousarray(np.asarray(origin, np.float32).reshape(3))
    n = len(cloud)
    max_h = n + 8
    max_s = 64
    while True:
        max_s = max(max_s, int((max(max_range, 1.0) / max(fr, 1e-6) + 2) * max_h))
        hits = np.empty((max_h, 3), np.float32)
        rays = np.empty((max_h, 6), np.float32)
        samples = np.empty((max_s, 3), np.float32)
        sample_ray = np.empty(max_s, np.int32)
        nh, nr, ns = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
        rc = lib.bgkl_training_data(
            cloud.reshape(-1), n, origin, ds, fr, max_range,
            hits.reshape(-1), ctypes.byref(nh), rays.reshape(-1), ctypes.byref(nr),
            samples.reshape(-1), sample_ray, ctypes.byref(ns),
            max_h, max_h, max_s)
        if rc == 0:
            break
        max_h *= 2
        max_s *= 2
    return SegmentTrainingData(
        hits=hits[:nh.value].copy(), rays=rays[:nr.value].copy(),
        samples=samples[:ns.value].copy(),
        sample_ray=sample_ray[:ns.value].astype(np.int64))


def scan_bucket_tables(points: np.ndarray, labels: np.ndarray,
                       block_size: float, nb_offsets: np.ndarray):
    """Fused block bucketing for the point families (see host_preprocess.cpp).

    Returns a dict with the sorted entry table and both the model-side and
    test-side views (BGK consumes entries/test/starts/counts; GP additionally
    model_starts/model_counts/nb_t), or None when the library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float32)
    labels = np.ascontiguousarray(labels, np.float32)
    off = np.ascontiguousarray(np.asarray(nb_offsets, np.int64))
    n, G = len(points), len(off)
    max_ent = 2 * n + 64  # boundary double-membership is rare but systematic
    max_test = 8 * n + 1024  # retry-doubled on overflow
    while True:
        max_models = max_ent
        ent = np.empty((max_ent, 3), np.float32)
        lab = np.empty(max_ent, np.float32)
        mc = np.empty((max_models, 3), np.int64)
        ms = np.empty(max_models, np.int32)
        mn = np.empty(max_models, np.int32)
        nbt = np.empty((max_models, G), np.int32)
        tc = np.empty((max_test, 3), np.int64)
        ts = np.empty((max_test, G), np.int32)
        tn = np.empty((max_test, G), np.int32)
        ne, nm, nt = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
        rc = lib.scan_bucket_tables(
            points.reshape(-1), labels, n, float(block_size),
            off.reshape(-1), G,
            ent.reshape(-1), lab, ctypes.byref(ne),
            mc.reshape(-1), ms, mn, nbt.reshape(-1), ctypes.byref(nm),
            tc.reshape(-1), ts.reshape(-1), tn.reshape(-1), ctypes.byref(nt),
            max_ent, max_models, max_test)
        if rc == 0:
            break
        max_ent *= 2
        max_test *= 2
    E, M, B = ne.value, nm.value, nt.value
    return {
        "entries": ent[:E].copy(), "labels": lab[:E].copy(),
        "model_coords": mc[:M].copy(), "model_starts": ms[:M].copy(),
        "model_counts": mn[:M].copy(), "nb_t": nbt[:M].copy(),
        "test_coords": tc[:B].copy(), "starts": ts[:B].copy(),
        "counts": tn[:B].copy(),
    }


def row_tables(starts: np.ndarray, counts: np.ndarray, W: int):
    """Native fixed-width row tables (models/bgk.py::_row_tables contract).

    Returns (ids, gslot, row_block, row_start, row_count, totals) or None
    when the library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    starts = np.ascontiguousarray(starts, np.int32)
    counts = np.ascontiguousarray(counts, np.int32)
    B, G = counts.shape
    F = int(counts.sum())
    R = int(((counts.sum(axis=1) + W - 1) // W).sum()) if B else 0
    ids = np.empty(max(F, 1), np.int32)
    gslot = np.empty(max(F, 1), np.int8)
    row_block = np.empty(max(R, 1), np.int32)
    row_start = np.empty(max(R, 1), np.int64)
    row_count = np.empty(max(R, 1), np.int32)
    totals = np.empty(max(B, 1), np.int64)
    nf, nr = ctypes.c_longlong(), ctypes.c_longlong()
    rc = lib.row_tables(starts.reshape(-1), counts.reshape(-1), B, G, W,
                        ids, gslot, ctypes.byref(nf),
                        row_block, row_start, row_count, ctypes.byref(nr),
                        totals, len(ids), len(row_block))
    if rc != 0:
        return None
    return (ids[:nf.value], gslot[:nf.value], row_block[:nr.value],
            row_start[:nr.value], row_count[:nr.value], totals[:B])


def bgkl_scan_tables(hits: np.ndarray, rays: np.ndarray, samples: np.ndarray,
                     sample_ray: np.ndarray, block_size: float,
                     nb_offsets: np.ndarray):
    """Fused BGKL bucketing (segment entries with per-block ray dedup; see
    host_preprocess.cpp).  Returns the BucketTables fields as a dict, or
    None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    hits = np.ascontiguousarray(hits, np.float32)
    rays = np.ascontiguousarray(rays, np.float32)
    samples = np.ascontiguousarray(samples, np.float32)
    sample_ray = np.ascontiguousarray(sample_ray, np.int32)
    off = np.ascontiguousarray(np.asarray(nb_offsets, np.int64))
    H, R, S, G = len(hits), len(rays), len(samples), len(off)
    max_ent = 2 * H + 24 * max(R, 1) + 64  # rays touch many blocks
    max_test = 8 * (H + R) + 1024  # retry-doubled on overflow
    while True:
        ent = np.empty((max_ent, 6), np.float32)
        lab = np.empty(max_ent, np.float32)
        tc = np.empty((max_test, 3), np.int64)
        ts = np.empty((max_test, G), np.int32)
        tn = np.empty((max_test, G), np.int32)
        ne, nt = ctypes.c_int(), ctypes.c_int()
        rc = lib.bgkl_scan_tables(
            hits.reshape(-1), H, rays.reshape(-1), R,
            samples.reshape(-1), sample_ray, S,
            float(block_size), off.reshape(-1), G,
            ent.reshape(-1), lab, ctypes.byref(ne),
            tc.reshape(-1), ts.reshape(-1), tn.reshape(-1), ctypes.byref(nt),
            max_ent, max_test)
        if rc == 0:
            break
        max_ent *= 2
        max_test *= 2
    E, B = ne.value, nt.value
    return {"entries": ent[:E].copy(), "labels": lab[:E].copy(),
            "test_coords": tc[:B].copy(), "starts": ts[:B].copy(),
            "counts": tn[:B].copy()}
