"""Native (C++) vs numpy preprocessing equivalence."""

import numpy as np
import pytest

from la3dm_tpu.geometry import native, preprocess
from tests.test_bgk_vs_oracle import synthetic_scan


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_lv_training_data_matches_numpy(rng):
    cloud, origin = synthetic_scan(rng, n=150)
    args = (cloud, origin, 0.1, 0.1, 8.0, 0.2)
    td_c = native.lv_training_data(*args)
    td_np = preprocess.bgklv_training_data(*args)

    def as_set(a, scale=1e5):
        return {tuple(np.round(np.asarray(r, np.float64) * scale).astype(np.int64))
                for r in a}

    assert len(td_c.hits) == len(td_np.hits)
    assert as_set(td_c.hits) == as_set(td_np.hits)
    # rays: both faithful to the reference's double-precision sequential
    # shrinking, which has borderline branches — compare by nearest match
    assert len(td_c.rays) == len(td_np.rays)
    d = np.linalg.norm(td_c.rays[:, None, :] - td_np.rays[None, :, :], axis=-1)
    nearest = d.min(axis=1)
    assert (nearest < 1e-3).mean() > 0.95, nearest.max()
    assert np.median(nearest) < 1e-5
    # per-ray sample counts line up after matching
    c_counts = np.bincount(td_c.sample_ray, minlength=len(td_c.rays))
    n_counts = np.bincount(td_np.sample_ray, minlength=len(td_np.rays))
    assert abs(int(c_counts.sum()) - int(n_counts.sum())) <= len(td_c.rays)


def test_native_tile_tables_match_numpy(rng):
    """lv_tile_tables (C++) vs the numpy halo/dedup/segments path."""
    import numpy as np
    from la3dm_tpu.geometry import native, blocks as geo
    from la3dm_tpu.models.bgklv import _halo_blocks

    if not native.available():
        import pytest
        pytest.skip("native toolchain unavailable")

    hits = rng.uniform(-3, 3, (200, 3)).astype(np.float32)
    rays = rng.uniform(-3, 3, (60, 6)).astype(np.float32)
    samples = rng.uniform(-3, 3, (1500, 3)).astype(np.float32)
    sample_ray = rng.integers(0, 60, 1500).astype(np.int64)
    ts, halo, shift = 0.8, 0.2, 0.4

    keys, hs, hc, rs, rc, hf, rf = native.lv_tile_tables(
        hits, samples, sample_ray, ts, halo, shift)

    ht_coords, ht_idx = _halo_blocks(hits.astype(np.float64) + shift, ts, halo)
    st_coords, st_idx = _halo_blocks(samples.astype(np.float64) + shift, ts, halo)
    ht_keys = geo.pack_key(ht_coords)
    st_keys = geo.pack_key(st_coords)
    st_rays = sample_ray[st_idx]
    order = np.lexsort((st_rays, st_keys))
    sk, sr = st_keys[order], st_rays[order]
    keep = np.empty(len(sk), bool)
    keep[0] = True
    keep[1:] = (sk[1:] != sk[:-1]) | (sr[1:] != sr[:-1])
    active = np.unique(np.concatenate([ht_keys, sk[keep]]))

    np.testing.assert_array_equal(keys, active)
    # per-tile hit sets and deduped ray sets agree
    for t in range(len(keys)):
        np.testing.assert_array_equal(
            np.sort(hf[hs[t]:hs[t] + hc[t]]),
            np.sort(ht_idx[ht_keys == keys[t]]), err_msg=f"tile {t} hits")
        np.testing.assert_array_equal(
            np.sort(rf[rs[t]:rs[t] + rc[t]]),
            np.unique(sr[keep][sk[keep] == keys[t]]), err_msg=f"tile {t} rays")


def test_ray_walk_tables_superset_of_sample_tables():
    """lv_tile_tables_ray must cover every (tile, ray) and (tile, hit) pair of
    the proxy-sample tables — the device re-tests exact membership, so a
    superset is exact; a miss would silently drop updates."""
    import numpy as np
    import pytest

    from la3dm_tpu.geometry import native
    from tests.conftest import reference_scan

    if not native.available():
        pytest.skip("native library unavailable")
    cloud, origin = reference_scan("sim_structured", 1)
    td = native.lv_training_data(cloud, origin, 0.1, 0.3, 6.0, 0.2)
    ts, halo, shift = 0.8, 0.2, 0.8
    samp = native.lv_tile_tables(td.hits, td.samples, td.sample_ray, ts, halo, shift)
    walk = native.lv_tile_tables_ray(td.hits, td.rays, ts, halo, shift)

    def pairs(tables, col):
        keys, hs, hc, rs, rc, hf, rf = tables
        start, count, flat = (hs, hc, hf) if col == "h" else (rs, rc, rf)
        out = set()
        for t, k in enumerate(keys):
            for j in range(count[t]):
                out.add((int(k), int(flat[start[t] + j])))
        return out

    assert pairs(samp, "h") == pairs(walk, "h")      # hit path is identical
    missing = pairs(samp, "r") - pairs(walk, "r")
    assert not missing, f"{len(missing)} sample pairs missing from ray walk"


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_bgk_training_data_bitwise(rng):
    """Native BGK/GP training data is BIT-IDENTICAL to numpy (the k̄ gate
    sits on the sparse kernel's support boundary; -ffp-contract=off keeps
    float rounding aligned)."""
    cloud, origin = synthetic_scan(rng, n=300)
    for mr in (6.0, -1.0):
        a = native.bgk_training_data(cloud, origin, 0.1, 0.5, mr, free_label=-1.0)
        b = preprocess.bgk_training_data(cloud, origin, 0.1, 0.5, mr, free_label=-1.0)
        assert np.array_equal(a.points, b.points)
        assert np.array_equal(a.labels, b.labels)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_bgkl_training_data_bitwise(rng):
    cloud, origin = synthetic_scan(rng, n=300)
    for mr in (6.0, -1.0):
        a = native.bgkl_training_data(cloud, origin, 0.1, 0.5, mr)
        b = preprocess.bgkl_training_data(cloud, origin, 0.1, 0.5, mr)
        assert np.array_equal(a.hits, b.hits)
        assert np.array_equal(a.rays, b.rays)
        assert np.array_equal(a.samples, b.samples)
        assert np.array_equal(a.sample_ray, b.sample_ray)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_scan_bucket_tables_bitwise(rng):
    """Fused C++ bucketing (point families) == the numpy pipeline on every
    output, including the GP model/neighbor-row view and entry ORDER within
    blocks (f32 accumulation order feeds the k̄ gates)."""
    from la3dm_tpu.geometry import blocks as geo
    from la3dm_tpu.models import bucketing

    pts = rng.uniform(-2, 2, (4000, 3)).astype(np.float32)
    pts[:16] = np.round(pts[:16] / 0.4) * 0.4     # exact face-plane points
    labels = (rng.uniform(size=len(pts)) > 0.5).astype(np.float32)
    offs = geo.FACE_NEIGHBOR_OFFSETS
    bs = 0.8
    out = native.scan_bucket_tables(pts, labels, bs, offs)

    coords, idx = geo.point_block_memberships(pts, bs)
    t = bucketing.bucket_tables(coords, pts[idx], labels[idx], offs)
    assert np.array_equal(out["entries"], t.entries)
    assert np.array_equal(out["labels"], t.labels)
    assert np.array_equal(out["test_coords"], t.test_coords)
    assert np.array_equal(out["starts"], t.starts)
    assert np.array_equal(out["counts"], t.counts)

    order, ukeys, mstarts, mcounts = bucketing.group_by_block(coords)
    assert np.array_equal(out["model_starts"], mstarts)
    assert np.array_equal(out["model_counts"], mcounts)
    assert np.array_equal(out["model_coords"], geo.unpack_key(ukeys))
    test_keys = geo.pack_key(t.test_coords)
    mcoords = geo.unpack_key(ukeys)
    nb_ref = np.empty((len(ukeys), len(offs)), np.int32)
    for s, off in enumerate(offs):
        nb_ref[:, s] = np.searchsorted(test_keys, geo.pack_key(mcoords - off[None, :]))
    assert np.array_equal(out["nb_t"], nb_ref)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_bgkl_scan_tables_bitwise(rng):
    """Fused C++ BGKL bucketing (segment entries, per-block ray dedup) ==
    segment_block_entries + bucket_tables on a real preprocessed scan."""
    from la3dm_tpu.geometry import blocks as geo
    from la3dm_tpu.models import bucketing
    from la3dm_tpu.models.bgkl import segment_block_entries

    cloud, origin = synthetic_scan(rng, n=250)
    td = native.bgkl_training_data(cloud, origin, 0.1, 0.3, 6.0)
    offs = geo.FACE_NEIGHBOR_OFFSETS
    bs = 0.8
    out = native.bgkl_scan_tables(td.hits, td.rays, td.samples, td.sample_ray,
                                  bs, offs)
    coords, entries, labels = segment_block_entries(td, bs)
    t = bucketing.bucket_tables(coords, entries, labels, offs)
    assert np.array_equal(out["entries"], t.entries)
    assert np.array_equal(out["labels"], t.labels)
    assert np.array_equal(out["test_coords"], t.test_coords)
    assert np.array_equal(out["starts"], t.starts)
    assert np.array_equal(out["counts"], t.counts)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_row_tables_native_matches_numpy(rng):
    from la3dm_tpu.geometry import blocks as geo
    from la3dm_tpu.models import bucketing
    import la3dm_tpu.geometry.native as nat
    from la3dm_tpu.models.bgk import BGKOctoMap, _ROW_W
    from la3dm_tpu.utils.config import MapConfig

    cfg = MapConfig(method="bgk", resolution=0.1, block_depth=3, sf2=1.0,
                    ell=0.2, max_range=8.0)
    m = BGKOctoMap(cfg)
    pts = rng.uniform(-2, 2, (2500, 3)).astype(np.float32)
    labels = (rng.uniform(size=len(pts)) > 0.5).astype(np.float32)
    coords, idx = geo.point_block_memberships(pts, m.block_size)
    t = bucketing.bucket_tables(coords, pts[idx], labels[idx],
                                m._neighbor_offsets)
    got = nat.row_tables(t.starts, t.counts, _ROW_W)
    orig = nat.row_tables
    nat.row_tables = lambda *a, **k: None   # force the numpy branch
    try:
        want = m._row_tables(t)
    finally:
        nat.row_tables = orig
    for a, b, name in zip(got, want, ("ids", "gslot", "row_block",
                                      "row_start", "row_count", "totals")):
        assert np.array_equal(np.asarray(a, np.int64), np.asarray(b, np.int64)), name
