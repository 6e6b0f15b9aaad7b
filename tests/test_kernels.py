"""Unit tests: covariance kernels and distances vs closed-form / oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from la3dm_tpu.kernels import math as km
from tests.oracle import reference_impl as oracle


def test_sparse_kernel_closed_form():
    # reference values at hand-computed points of sf2·[(2+cos2πr)(1−r)/3 + sin2πr/2π]
    assert np.isclose(float(km.sparse_kernel(jnp.float32(0.0), 1.0)), 1.0, atol=1e-6)
    assert float(km.sparse_kernel(jnp.float32(1.0), 1.0)) == pytest.approx(0.0, abs=1e-6)
    assert float(km.sparse_kernel(jnp.float32(1.5), 1.0)) == 0.0  # clamped
    r = 0.25
    expected = (2.0 + np.cos(2 * np.pi * r)) * (1 - r) / 3.0 + np.sin(2 * np.pi * r) / (2 * np.pi)
    assert float(km.sparse_kernel(jnp.float32(r), 1.0)) == pytest.approx(expected, rel=1e-5)
    # sf2 scaling
    assert float(km.sparse_kernel(jnp.float32(r), 0.1)) == pytest.approx(0.1 * expected, rel=1e-5)


def test_cov_sparse_vs_oracle(rng):
    x = rng.uniform(-1, 1, (17, 3)).astype(np.float32)
    z = rng.uniform(-1, 1, (23, 3)).astype(np.float32)
    ours = np.asarray(km.cov_sparse(jnp.asarray(x), jnp.asarray(z), 1.0, 0.2))
    ref = oracle.cov_sparse(x, z, 1.0, 0.2)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_matern_vs_oracle(rng):
    x = rng.uniform(-1, 1, (9, 3)).astype(np.float32)
    z = rng.uniform(-1, 1, (11, 3)).astype(np.float32)
    ours = np.asarray(km.cov_matern32(jnp.asarray(x), jnp.asarray(z), 1.0, 1.0))
    ref = oracle.cov_matern32(x, z, 1.0, 1.0)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_point_to_segment_vs_oracle(rng):
    p = rng.uniform(-1, 1, (13, 3)).astype(np.float32)
    seg = rng.uniform(-1, 1, (7, 6)).astype(np.float32)
    seg[0, 3:] = seg[0, :3]  # degenerate
    seg[1, 3:] = seg[1, :3] + 1e-5  # below EPSILON
    ours = np.asarray(km.point_to_segment_dist(jnp.asarray(p), jnp.asarray(seg)))
    ref = oracle.point_to_segment(p, seg)
    np.testing.assert_allclose(ours, ref, atol=3e-6)


def test_point_to_segment_branches():
    seg = np.array([[0, 0, 0, 1, 0, 0]], np.float32)
    p = np.array([[-1, 0, 0], [2, 0, 0], [0.5, 0.5, 0], [0.25, 0, 0]], np.float32)
    d = np.asarray(km.point_to_segment_dist(jnp.asarray(p), jnp.asarray(seg)))[:, 0]
    np.testing.assert_allclose(d, [1.0, 1.0, 0.5, 0.0], atol=1e-6)


def test_cov_sparse_segment_lv_clamp():
    # LV clamps r≤1 pre-kernel → exactly kernel(1)=0 beyond support, never negative
    seg = np.array([[0, 0, 0, 0, 0, 0]], np.float32)
    p = np.array([[5, 0, 0]], np.float32)
    v = float(km.cov_sparse_segment(jnp.asarray(p), jnp.asarray(seg), 1.0, 0.2, lv=True)[0, 0])
    assert v == pytest.approx(0.0, abs=1e-6)


def test_pairwise_dist_centered_accuracy(rng):
    # Gram-expansion distance at block-local scale matches direct computation
    a = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (60, 3)).astype(np.float32)
    ours = np.asarray(km.pairwise_dist(jnp.asarray(a), jnp.asarray(b)))
    ref = np.linalg.norm(a[:, None] - b[None], axis=-1)
    np.testing.assert_allclose(ours, ref, atol=5e-6)


def test_rotate_euler_matches_scalar_reference():
    """rotate_euler vs a literal scalar transcription of point3f.cpp:8-30."""
    import numpy as np
    from la3dm_tpu.geometry.blocks import rotate_euler

    rng = np.random.default_rng(3)
    pts = rng.uniform(-2, 2, (50, 3)).astype(np.float32)
    roll, pitch, yaw = 0.3, -0.7, 1.9

    def scalar(v):
        import math
        x, y, z = float(v[0]), float(v[1]), float(v[2])
        x, z = np.float32(z * math.sin(pitch) + x * math.cos(pitch)), \
               np.float32(z * math.cos(pitch) - x * math.sin(pitch))
        x, y = np.float32(float(x) * math.cos(yaw) - y * math.sin(yaw)), \
               np.float32(float(x) * math.sin(yaw) + y * math.cos(yaw))
        y, z = np.float32(float(y) * math.cos(roll) - float(z) * math.sin(roll)), \
               np.float32(float(y) * math.sin(roll) + float(z) * math.cos(roll))
        return np.array([x, y, z], np.float32)

    got = rotate_euler(pts, roll, pitch, yaw)
    want = np.stack([scalar(v) for v in pts])
    np.testing.assert_allclose(got, want, atol=2e-7)
    # pure rotation: norms preserved
    np.testing.assert_allclose(np.linalg.norm(got, axis=1),
                               np.linalg.norm(pts, axis=1), rtol=1e-5)
