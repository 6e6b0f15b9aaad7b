"""Pallas fused-predict kernel vs the XLA reference path (interpret mode).

The Pallas kernel (kernels/pallas_ops.py) must reproduce the XLA path's
(ȳ, k̄) bit-for-bit at the kernel-value level; only matmul accumulation
order may differ, so comparisons use a tight float tolerance.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from la3dm_tpu.kernels import pallas_ops, predict as kp


@pytest.mark.parametrize("segments", [False, True])
def test_pallas_matches_xla(rng, segments):
    B, V, S, G = 4, 64, 256, 7
    D = 6 if segments else 3
    vox = rng.uniform(-1, 1, (B, V, 3)).astype(np.float32)
    entries = rng.uniform(-1, 1, (B, S, D)).astype(np.float32)
    if segments:
        # mix degenerate (hit) and proper segments like real training data
        degen = rng.uniform(size=(B, S)) < 0.5
        entries[..., 3:6] = np.where(degen[..., None], entries[..., 0:3],
                                     entries[..., 3:6])
    labels = (rng.uniform(size=(B, S)) > 0.5).astype(np.float32)
    slots = rng.integers(0, G, (B, S)).astype(np.int32)
    valid = rng.uniform(size=(B, S)) > 0.2

    yb_p, kb_p = pallas_ops.bgk_predict_pallas(
        jnp.asarray(vox), jnp.asarray(entries), jnp.asarray(labels),
        jnp.asarray(slots), jnp.asarray(valid),
        num_slots=G, sf2=1.0, ell=0.3, segments=segments, interpret=True)

    if segments:
        yb_x, kb_x = kp.bgkl_predict_blocks(
            jnp.asarray(vox), jnp.asarray(entries), jnp.asarray(labels),
            jnp.asarray(slots), jnp.asarray(valid), num_slots=G, sf2=1.0, ell=0.3)
    else:
        yb_x, kb_x = kp.bgk_predict_blocks(
            jnp.asarray(vox), jnp.asarray(entries), jnp.asarray(labels),
            jnp.asarray(slots), jnp.asarray(valid), num_slots=G, sf2=1.0, ell=0.3)

    np.testing.assert_allclose(np.asarray(yb_p), np.asarray(yb_x),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(kb_p), np.asarray(kb_x),
                               atol=1e-5, rtol=1e-5)


def test_pallas_multi_tile_accumulation(rng):
    """S spanning several 512 tiles exercises the scratch accumulator."""
    B, V, S, G = 2, 64, 1024, 7
    vox = rng.uniform(-1, 1, (B, V, 3)).astype(np.float32)
    entries = rng.uniform(-1, 1, (B, S, 3)).astype(np.float32)
    labels = (rng.uniform(size=(B, S)) > 0.5).astype(np.float32)
    slots = rng.integers(0, G, (B, S)).astype(np.int32)
    valid = rng.uniform(size=(B, S)) > 0.5

    yb_p, kb_p = pallas_ops.bgk_predict_pallas(
        jnp.asarray(vox), jnp.asarray(entries), jnp.asarray(labels),
        jnp.asarray(slots), jnp.asarray(valid),
        num_slots=G, sf2=1.0, ell=0.3, segments=False, interpret=True)
    yb_x, kb_x = kp.bgk_predict_blocks(
        jnp.asarray(vox), jnp.asarray(entries), jnp.asarray(labels),
        jnp.asarray(slots), jnp.asarray(valid), num_slots=G, sf2=1.0, ell=0.3)
    np.testing.assert_allclose(np.asarray(yb_p), np.asarray(yb_x),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(kb_p), np.asarray(kb_x),
                               atol=1e-5, rtol=1e-5)
