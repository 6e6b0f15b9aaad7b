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
