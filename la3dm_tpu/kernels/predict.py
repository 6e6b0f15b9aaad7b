"""Batched BGK/BGKL predict: fused distance → kernel → masked matvec.

The reference evaluates, per (test block, neighbor block) pair, a dense
M×N kernel matrix followed by ``ȳ = K·y`` and ``k̄ = rowsum(K)``
(``bgkinference.h:73-79``).  Here the whole scan is one batched einsum:

    [B blocks] × [V voxels] × [S padded training points]

with the (ȳ, k̄) matvec folded into the same contraction via a [S, 2·G]
right-hand side (G = neighbor-slot groups for per-neighbor k̄ gating).

Numerical note: voxel and point coordinates MUST be pre-centered per block
(subtract the block center) before entering these ops — the Gram-expansion
distance loses ~3 digits at world-scale coordinates but is exact to float32
roundoff at block-local scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from la3dm_tpu.kernels import math as km


def _slot_rhs(labels: jax.Array, slots: jax.Array, valid: jax.Array, num_slots: int) -> jax.Array:
    """Build the [S, 2·G] RHS: columns (y·1[slot=g], 1[slot=g]) per group g."""
    onehot = (slots[:, None] == jnp.arange(num_slots)[None, :]) & valid[:, None]
    onehot = onehot.astype(jnp.float32)
    return jnp.concatenate([labels[:, None] * onehot, onehot], axis=-1)  # [S, 2G]


@functools.partial(jax.jit, static_argnames=("num_slots", "sf2", "ell"))
def bgk_predict_blocks(voxels: jax.Array, points: jax.Array, labels: jax.Array,
                       slots: jax.Array, valid: jax.Array,
                       num_slots: int, sf2: float, ell: float) -> tuple[jax.Array, jax.Array]:
    """Per-block BGK kernel densities, grouped by neighbor slot.

    Args:
      voxels: [B,V,3] block-local voxel centers.
      points: [B,S,3] block-local training points (padded).
      labels: [B,S] training labels (1 occupied / 0 free).
      slots:  [B,S] int neighbor-slot id of each point (0..num_slots-1).
      valid:  [B,S] bool padding mask.
    Returns:
      ybar, kbar: [B,V,num_slots] per-slot kernel density sums.
    """
    def per_block(vox, pts, lab, slot, val):
        K = km.cov_sparse(vox, pts, sf2, ell)                     # [V,S]
        K = jnp.where(val[None, :], K, 0.0)
        rhs = _slot_rhs(lab, slot, val, num_slots)                # [S,2G]
        out = jnp.dot(K, rhs, preferred_element_type=jnp.float32) # [V,2G]
        return out[:, :num_slots], out[:, num_slots:]

    return jax.vmap(per_block)(voxels, points, labels, slots, valid)


@functools.partial(jax.jit, static_argnames=("num_slots", "sf2", "ell"))
def bgkl_predict_blocks(voxels: jax.Array, segments: jax.Array, labels: jax.Array,
                        slots: jax.Array, valid: jax.Array,
                        num_slots: int, sf2: float, ell: float) -> tuple[jax.Array, jax.Array]:
    """Per-block BGKL kernel densities over line segments [B,S,6]."""
    def per_block(vox, seg, lab, slot, val):
        K = km.cov_sparse_segment(vox, seg, sf2, ell, lv=False)   # [V,S]
        K = jnp.where(val[None, :], K, 0.0)
        rhs = _slot_rhs(lab, slot, val, num_slots)
        out = jnp.dot(K, rhs, preferred_element_type=jnp.float32)
        return out[:, :num_slots], out[:, num_slots:]

    return jax.vmap(per_block)(voxels, segments, labels, slots, valid)


def beta_update(ybar: jax.Array, kbar: jax.Array, gate: float) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Gated conjugate Beta update deltas from per-slot densities.

    Reference applies ``m_A += ȳ; m_B += k̄ − ȳ`` per neighbor model only when
    that model's k̄ exceeds the gate (``> 0`` for BGK, bgkoctomap.cpp:332;
    ``> 0.001`` for BGKL, bgkloctomap.cpp:231).  Updates are additive, so the
    gated per-slot sums collapse into one (ΔA, ΔB, touched) per voxel.

    Args: ybar, kbar [..., G].  Returns dA, dB, touched with the slot axis reduced.
    """
    g = kbar > jnp.float32(gate)
    dA = jnp.sum(jnp.where(g, ybar, 0.0), axis=-1)
    dB = jnp.sum(jnp.where(g, kbar - ybar, 0.0), axis=-1)
    return dA, dB, jnp.any(g, axis=-1)
