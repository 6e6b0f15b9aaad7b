"""Device-side scan ingestion: raw point clouds → engine tables, on TPU.

The reference's ``get_training_data`` + R-tree indexing pipeline
(``src/bgkoctomap/bgkoctomap.cpp:383-458``, ``:240-243``) is host work: voxel
downsample, per-beam free-space sampling, a second downsample, then spatial
bucketing.  Rounds 1–3 ran it as vectorized numpy / native C++ on the host,
which BENCH_r03 proved to be the throughput ceiling for the cheap methods
(host_frac 0.65–0.82 on a 2-core box).  This module moves the whole pipeline
onto the device as ONE jitted, fixed-shape program per scan batch:

  [K, P, 3] raw clouds ──► downsample (sort + segment-mean)
                        ──► max-range filter + beam free sampling ([P, Kf] grid)
                        ──► free-cloud downsample
                        ──► block memberships (≤8 per entry, closed-box faces)
                        ──► sort by block key → per-(test block, slot) segments
                        ──► (BGK) fixed-width row tables      → models/bgk.py
                        ──► (GP) per-model segments + slot map → models/gp.py

Everything is static-shaped: ragged results live in padded arrays with
validity masks, compaction happens for free inside the key sorts (invalid
rows carry a +inf sentinel key).  The only host round-trip per batch is the
tiny test-block key table needed for pool slot allocation (a few KB).

Semantics match geometry/preprocess.py with two deliberate deviations,
both far inside the ≤1e-2 MAE acceptance tolerance (BASELINE.md):
* centroid accumulation in float32 (host sums in float64 before the f32
  cast) — relative error ~1e-7 per centroid;
* beam lengths/range tests in float32 (host computes the max-range norm in
  float64, bgkoctomap.cpp:394-397) — flips only exact-boundary points.
The host path (numpy + native C++) remains the bit-exact parity/reference
path and the fallback for configs this path cannot bound statically
(``max_range <= 0``, or local windows larger than 2^10 cells/blocks).

Block keys are packed into *scan-local* 30-bit int32 keys (10 bits/axis
relative to the scan's min corner) so sorts run on native int32 lanes — the
global int64 BlockHashKey (bgkblock.cpp:73-77) never reaches the device.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

#: sentinel key: sorts after every valid 30-bit packed key
_SENT = np.int32(0x7FFFFFFF)
#: cells per axis of the scan-local packing window (10 bits)
_WIN = 1024
#: monotone pad ladder shared across map instances (raw-cloud pad etc.)
_SPEC_PADS: dict = {}


@dataclasses.dataclass(frozen=True)
class IngestSpec:
    """Static shape/parameter bundle (one compiled executable per spec)."""

    P: int            # raw points per scan (padded)
    Pf: int           # downsampled free voxels per scan (padded)
    Kf: int           # free-sample slots per beam (⌈mr/fr⌉ + 1)
    Bu: int           # unique entry blocks per scan (padded)
    T: int            # test blocks per scan (padded)
    ds: float         # downsample leaf (the static nodes pass `resolution`)
    fr: float         # free_resolution
    mr: float         # max_range (> 0 required for the static beam bound)
    block_size: float
    free_label: float  # 0 for BGK, −1 for GP (gpoctomap.cpp:399)

    @property
    def E(self) -> int:  # entries per scan: hits (≤P) then frees (≤Pf)
        return self.P + self.Pf

    @property
    def M(self) -> int:  # block memberships per scan (≤8 per entry)
        return 8 * self.E


def spec_for(cfg, ds_resolution: float, free_resolution: float,
             max_range: float, P: int) -> IngestSpec | None:
    """Build a spec for this config, or None when it can't be bounded."""
    if max_range is None or max_range <= 0:
        return None  # beam length unbounded → no static sample count
    # the scan-local windows must hold the reachable extent (+margins)
    if 2.0 * max_range / ds_resolution + 8 > _WIN:
        return None
    if 2.0 * max_range / cfg.block_size + 8 > _WIN:
        return None
    Kf = int(np.floor(max_range / free_resolution)) + 1
    free_label = -1.0 if cfg.method == "gp" else 0.0
    return IngestSpec(
        P=P, Pf=8192, Kf=Kf, Bu=1024, T=1024,
        ds=float(ds_resolution), fr=float(free_resolution),
        mr=float(max_range), block_size=float(cfg.block_size),
        free_label=free_label)


# --------------------------------------------------------------------------
# building blocks (single scan; vmapped over the batch)
# --------------------------------------------------------------------------


def _downsample(points: jax.Array, valid: jax.Array, leaf: float,
                n_out: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Voxel-grid downsample, z-major voxel order (pcl::VoxelGrid semantics,
    geometry/preprocess.py::voxel_downsample).

    Returns (centroids [n_out,3], valid [n_out], n_voxels scalar) — voxels
    beyond ``n_out`` are dropped (the caller checks ``n_voxels``).
    """
    ijk = jnp.floor(points * jnp.float32(1.0 / leaf)).astype(jnp.int32)
    big = jnp.int32(1 << 29)
    ijk_m = jnp.where(valid[:, None], ijk, big)
    m0 = jnp.min(ijk_m, axis=0)                      # per-axis window origin
    loc = jnp.clip(ijk - m0[None, :], 0, _WIN - 1)
    key = jnp.where(
        valid,
        (loc[:, 2] << 20) | (loc[:, 1] << 10) | loc[:, 0],  # z-major order
        _SENT)
    order = jnp.argsort(key, stable=True)
    key_s = key[order]
    pts_s = points[order]
    new = jnp.concatenate([jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    sid = jnp.cumsum(new.astype(jnp.int32)) - 1
    ok = key_s != _SENT
    sums = jax.ops.segment_sum(
        jnp.where(ok[:, None], pts_s, 0.0), sid, num_segments=n_out)
    cnts = jax.ops.segment_sum(ok.astype(jnp.float32), sid, num_segments=n_out)
    cent = sums / jnp.maximum(cnts, 1.0)[:, None]
    n_vox = jnp.max(jnp.where(ok, sid, -1)) + 1
    return cent, cnts > 0, n_vox


def _unique_compact(keys_sorted: jax.Array, n_out: int) -> tuple[jax.Array, jax.Array]:
    """Sorted keys (sentinel-padded) → first ``n_out`` unique keys + count."""
    new = jnp.concatenate(
        [keys_sorted[:1] != _SENT,
         (keys_sorted[1:] != keys_sorted[:-1]) & (keys_sorted[1:] != _SENT)])
    idx = jnp.cumsum(new.astype(jnp.int32)) - 1
    out = jnp.full((n_out + 1,), _SENT, jnp.int32)
    out = out.at[jnp.where(new, jnp.minimum(idx, n_out), n_out)].set(
        keys_sorted, mode="drop")
    return out[:n_out], jnp.max(jnp.where(new, idx, -1)) + 1


def _pack_offsets(offsets: np.ndarray) -> np.ndarray:
    """Neighbor offsets [G,3] → packed-key deltas (valid while no axis field
    under/overflows, which the ±1-cell margins below guarantee)."""
    o = offsets.astype(np.int64)
    return (o[:, 2] * (1 << 20) + o[:, 1] * (1 << 10) + o[:, 0]).astype(np.int32)


def _ingest_scan(cloud: jax.Array, npts: jax.Array, origin: jax.Array,
                 spec: IngestSpec, off_keys: jax.Array) -> dict:
    """One scan's full pipeline (fixed shapes; see module docstring)."""
    P, Pf, Kf = spec.P, spec.Pf, spec.Kf
    valid_in = jnp.arange(P, dtype=jnp.int32) < npts

    # 1. hits: downsample at the ds leaf (bgkoctomap.cpp:419-431)
    hits, hit_ok, n_hit_vox = _downsample(cloud, valid_in, spec.ds, P)

    # 2. max-range filter (f32 here; host uses f64 — boundary-ulp deviation)
    diff = hits - origin[None, :]
    l = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    inr = hit_ok & (l <= jnp.float32(spec.mr)) & (l > 0)
    ndir = diff / jnp.maximum(l, 1e-30)[:, None]

    # 3. free-space beam samples: d = fr, 2fr, … < l, plus l − fr (l > fr),
    #    plus the origin once per hit (bgkoctomap.cpp:433-458, :404)
    karr = (jnp.arange(1, Kf + 1, dtype=jnp.float32) * jnp.float32(spec.fr))
    d = jnp.concatenate([
        jnp.broadcast_to(karr[None, :], (P, Kf)),
        (l - jnp.float32(spec.fr))[:, None],
        jnp.zeros((P, 1), jnp.float32),
    ], axis=1)                                               # [P, Kf+2]
    fmask = jnp.concatenate([
        karr[None, :] < l[:, None],
        (l > jnp.float32(spec.fr))[:, None],
        jnp.ones((P, 1), bool),
    ], axis=1) & inr[:, None]
    fpts = origin[None, None, :] + ndir[:, None, :] * d[:, :, None]

    # 4. second downsample over the free cloud
    frees, free_ok, n_free_vox = _downsample(
        fpts.reshape(-1, 3), fmask.reshape(-1), spec.ds, Pf)

    # 5. entries: hits (label 1) then frees (free_label), both in z-major
    #    voxel order — matching the host pipeline's concatenation order
    ent = jnp.concatenate([hits, frees], axis=0)             # [E,3]
    lab = jnp.concatenate([
        jnp.ones((P,), jnp.float32),
        jnp.full((Pf,), jnp.float32(spec.free_label)),
    ])
    evalid = jnp.concatenate([inr, free_ok])

    # 6. block memberships: closed-box face duplication (blocks.py::
    #    point_block_memberships) — per axis at most 2 of {base−1, base,
    #    base+1} contain the point, so 8 candidates per entry suffice
    bs = jnp.float32(spec.block_size)
    half = jnp.float32(spec.block_size / 2.0)
    base = jnp.floor(ent / bs + 0.5).astype(jnp.int32)       # [E,3]

    def in_box(coord):
        ctr = coord.astype(jnp.float32) * bs
        return (ctr - half <= ent) & (ent <= ctr + half)     # [E,3] per axis

    base_ok = in_box(base)
    hi_ok = in_box(base + 1)
    lo_ok = in_box(base - 1)
    sec = jnp.where(hi_ok, 1, -1).astype(jnp.int32)          # second candidate
    sec_ok = hi_ok | lo_ok
    bits = jnp.stack(jnp.meshgrid(  # [8,3] axis-bit selector
        jnp.arange(2), jnp.arange(2), jnp.arange(2), indexing="ij"),
        axis=-1).reshape(8, 3).astype(jnp.int32)
    mcoord = base[:, None, :] + bits[None, :, :] * sec[:, None, :]  # [E,8,3]
    mok = jnp.where(bits[None].astype(bool), sec_ok[:, None, :],
                    base_ok[:, None, :]).all(-1) & evalid[:, None]  # [E,8]

    # 7. scan-local block keys (margin 1 cell: neighbor offsets stay in-field)
    bbig = jnp.int32(1 << 29)
    bmin = jnp.min(jnp.where(mok[..., None], mcoord, bbig), axis=(0, 1)) - 1
    bloc = jnp.clip(mcoord - bmin[None, None, :], 1, _WIN - 2)
    mkey = jnp.where(
        mok, (bloc[..., 2] << 20) | (bloc[..., 1] << 10) | bloc[..., 0], _SENT)
    mkey = mkey.reshape(-1)                                  # [M], entry-major
    ordm = jnp.argsort(mkey, stable=True)
    mkey_s = mkey[ordm]
    eid = ordm >> 3                                          # membership → entry
    ent_s = ent[eid]
    lab_s = lab[eid]
    n_mem = jnp.sum(mok)

    # 8. unique entry blocks + segments into the sorted membership array
    newb = jnp.concatenate(
        [mkey_s[:1] != _SENT,
         (mkey_s[1:] != mkey_s[:-1]) & (mkey_s[1:] != _SENT)])
    sidb = jnp.cumsum(newb.astype(jnp.int32)) - 1
    Bu = spec.Bu
    arange_m = jnp.arange(spec.M, dtype=jnp.int32)
    ustart = jax.ops.segment_min(
        jnp.where(mkey_s != _SENT, arange_m, spec.M), sidb, num_segments=Bu)
    ucount = jax.ops.segment_sum(
        (mkey_s != _SENT).astype(jnp.int32), sidb, num_segments=Bu)
    ukey = jax.ops.segment_min(
        jnp.where(mkey_s != _SENT, mkey_s, _SENT), sidb, num_segments=Bu)
    ukey = jnp.where(ucount > 0, ukey, _SENT)
    ustart = jnp.where(ucount > 0, ustart, 0)
    n_ublk = jnp.max(jnp.where(mkey_s != _SENT, sidb, -1)) + 1

    # 9. test blocks = every block whose G-neighborhood holds ≥1 entry block
    #    (bucketing.test_blocks_for; symmetric offset sets ⇒ u ± off equal)
    cand = jnp.where(ukey[:, None] != _SENT,
                     ukey[:, None] + off_keys[None, :], _SENT).reshape(-1)
    tkey, n_test = _unique_compact(jnp.sort(cand), spec.T)

    # 10. per-(test block, slot) segments (bucketing.bucket_tables)
    G = off_keys.shape[0]
    nbk = tkey[:, None] + off_keys[None, :]                  # [T,G]
    pos = jnp.clip(jnp.searchsorted(ukey, nbk.reshape(-1)), 0, Bu - 1)
    tvalid = jnp.broadcast_to((tkey != _SENT)[:, None], (spec.T, G))
    hit = (ukey[pos] == nbk.reshape(-1)) & tvalid.reshape(-1)
    tstart = jnp.where(hit, ustart[pos], 0).reshape(spec.T, G)
    tcount = jnp.where(hit, ucount[pos], 0).reshape(spec.T, G)

    # 11. GP extra: the test-block row each model serves at slot g
    #    (gp.py::_model_tables nb_t; u − off is always a test block)
    mpos = jnp.clip(jnp.searchsorted(
        tkey, ukey[:, None] - off_keys[None, :]), 0, spec.T - 1)
    nb_row = jnp.where((ukey != _SENT)[:, None], mpos, spec.T)

    return {
        "ent": ent_s, "lab": lab_s,                # [M,3], [M] block-sorted
        "ukey": ukey, "ustart": ustart, "ucount": ucount,  # [Bu]
        "tkey": tkey, "tstart": tstart, "tcount": tcount,  # [T], [T,G]
        "nb_row": nb_row,                          # [Bu,G]
        "bias": bmin,                              # [3] local→global block
        "counts": jnp.stack([
            n_hit_vox, n_free_vox, n_mem, n_ublk, n_test]),
    }


@functools.partial(jax.jit, static_argnames=("spec",))
def ingest_batch(clouds: jax.Array, npts: jax.Array, origins: jax.Array,
                 off_keys: jax.Array, spec: IngestSpec) -> dict:
    """Vmapped ingestion: [K,P,3] clouds → per-scan table dict (leading K)."""
    return jax.vmap(
        lambda c, n, o: _ingest_scan(c, n, o, spec, off_keys)
    )(clouds, npts, origins)


# --------------------------------------------------------------------------
# BGK row tables (models/bgk.py::_row_tables, built on device)
# --------------------------------------------------------------------------


def _ragged_expand(counts: jax.Array, n_out: int) -> tuple[jax.Array, jax.Array]:
    """Segment id + within-segment offset for each output position.

    The classic scatter+cumsum construction (binary-searchsorted and
    scatter-min/max lower poorly on TPU; scatter-ADD + cumsum are fast
    vector ops): mark each nonempty segment's start position, prefix-sum
    the marks to get each position's nonempty-rank, then map ranks back to
    segment ids through a uniquely-hit scatter-add table.

    Returns (seg [n_out], within [n_out]); positions past the total are
    clamped into the last segment (callers mask by the live count).
    """
    S = counts.shape[0]
    ends = jnp.cumsum(counts)
    pos = ends - counts                                       # segment starts
    nz = counts > 0
    rank = jnp.cumsum(nz.astype(jnp.int32)) - 1               # [S]
    segid_of_rank = jnp.zeros(S + 1, jnp.int32).at[
        jnp.where(nz, rank, S)].add(
        jnp.arange(S, dtype=jnp.int32) * nz, mode="drop")[:S]
    mark = jnp.zeros(n_out, jnp.int32).at[pos].add(
        nz.astype(jnp.int32), mode="drop")
    r = jnp.clip(jnp.cumsum(mark) - 1, 0, S - 1)
    seg = segid_of_rank[r]
    within = jnp.arange(n_out, dtype=jnp.int32) - pos[seg]
    return seg, within


def _rows_scan(tstart: jax.Array, tcount: jax.Array, W: int,
               Fp: int, Rp: int) -> dict:
    """One scan's merged entry-id list + fixed-width rows.

    Mirrors the host construction exactly: ids = per test block, its G
    neighbor segments concatenated (slot-major within the block); rows cut
    the per-block lists into width-W pieces.
    """
    T, G = tstart.shape
    totals = jnp.sum(tcount, axis=1)                         # [T]
    mstart = jnp.cumsum(totals) - totals                     # exclusive
    segcnt = tcount.reshape(-1)                              # [T*G] merged order
    F_act = jnp.sum(segcnt)

    seg, within = _ragged_expand(segcnt, Fp)
    f = jnp.arange(Fp, dtype=jnp.int32)
    ids = jnp.where(f < F_act, tstart.reshape(-1)[seg] + within, 0)
    gslot = (seg % G).astype(jnp.int8)

    nrows = (totals + (W - 1)) // W
    R_act = jnp.sum(nrows)
    b, j = _ragged_expand(nrows, Rp)
    live = jnp.arange(Rp, dtype=jnp.int32) < R_act
    row_block = jnp.where(live, b, -1)
    row_start = jnp.where(live, mstart[b] + j * W, 0)
    row_count = jnp.where(live, jnp.clip(totals[b] - j * W, 0, W), 0)
    return {"ids": ids, "gslot": gslot, "row_block": row_block,
            "row_start": row_start, "row_count": row_count,
            "F": F_act, "R": R_act}


@functools.partial(jax.jit, static_argnames=("W", "Fp", "Rp", "M", "T"))
def rows_batch(tstart: jax.Array, tcount: jax.Array, W: int, Fp: int, Rp: int,
               M: int, T: int) -> dict:
    """Row tables for a K-scan batch, flattened with static per-scan offsets.

    ``ids`` index the [K·M] flattened entry table; ``row_block`` the [K·T]
    flattened test-block list; ``row_start`` the [K·Fp] flattened id list.
    Padding rows keep count 0 (heavy-pass no-ops) and block −1 → remapped to
    the caller's dead slot.
    """
    K = tstart.shape[0]
    per = jax.vmap(lambda ts, tc: _rows_scan(ts, tc, W, Fp, Rp))(tstart, tcount)
    soff = jnp.arange(K, dtype=jnp.int32)
    ids = (per["ids"] + (soff * M)[:, None]).reshape(-1)
    row_block = jnp.where(per["row_block"] >= 0,
                          per["row_block"] + (soff * T)[:, None],
                          K * T).reshape(-1)
    row_start = (per["row_start"] + (soff * Fp)[:, None]).reshape(-1)
    return {"ids": ids, "gslot": per["gslot"].reshape(-1),
            "row_block": row_block, "row_start": row_start,
            "row_count": per["row_count"].reshape(-1)}


def unpack_local_keys(keys: np.ndarray, bias: np.ndarray) -> np.ndarray:
    """Host helper: [.., ] scan-local int32 keys + [3] bias → global coords."""
    k = keys.astype(np.int64)
    loc = np.stack([k & 0x3FF, (k >> 10) & 0x3FF, (k >> 20) & 0x3FF], axis=-1)
    return loc + np.asarray(bias, np.int64)
