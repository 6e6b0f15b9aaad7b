"""BGK-family predict building blocks: slot-grouped RHS + gated Beta update.

The reference evaluates, per (test block, neighbor block) pair, a dense
M×N kernel matrix followed by ``ȳ = K·y`` and ``k̄ = rowsum(K)``
(``bgkinference.h:73-79``).  The row engines (models/bgk.py) fold the
(ȳ, k̄) matvec into their kernel contraction via the [S, 2·G] right-hand
side built here (G = neighbor-slot groups for per-neighbor k̄ gating), then
apply :func:`beta_update` per scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _slot_rhs(labels: jax.Array, slots: jax.Array, valid: jax.Array, num_slots: int) -> jax.Array:
    """Build the [S, 2·G] RHS: columns (y·1[slot=g], 1[slot=g]) per group g."""
    onehot = (slots[:, None] == jnp.arange(num_slots)[None, :]) & valid[:, None]
    onehot = onehot.astype(jnp.float32)
    return jnp.concatenate([labels[:, None] * onehot, onehot], axis=-1)  # [S, 2G]


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
