"""Posterior accessors: occupancy probability, variance, discrete state.

Pure functions of the dense per-voxel state arrays, mirroring the per-node
accessors of each reference family:

* BGK/BGKL (``bgkoctree_node.cpp:27-44``, ``bgkoctree_node.h:60``):
  p = A/(A+B); var = AB/((A+B)²(A+B+1)); state by var_thresh then p-thresholds.
* BGKLV (``bgklvoctree_node.cpp:29-77``): evidence-mass probability with an
  explicit unknown mass W, Brier-style variance, and the UNCERTAIN state
  replacing UNKNOWN in the var_thresh branch.
* GP (``gpoctree_node.cpp:31-49``): logistic squashing of the BCM mean,
  UNKNOWN below min_known_ivar.

States are encoded as int8 matching the reference enum order
(State: FREE=0, OCCUPIED=1, UNKNOWN=2, UNCERTAIN=3; PRUNED is represented
by the separate ``eff_level`` array, not a state code).
"""

from __future__ import annotations

import jax.numpy as jnp

FREE = 0
OCCUPIED = 1
UNKNOWN = 2
UNCERTAIN = 3


def _classify(prob, var, var_thresh, free_thresh, occupied_thresh, unknown_code=UNKNOWN):
    """Shared threshold logic (bgkoctree_node.cpp:36-43)."""
    by_p = jnp.where(
        prob > jnp.float32(occupied_thresh), OCCUPIED,
        jnp.where(prob < jnp.float32(free_thresh), FREE, UNKNOWN),
    )
    return jnp.where(var > jnp.float32(var_thresh), unknown_code, by_p).astype(jnp.int8)


# ---------------------------------------------------------------- BGK / BGKL

def beta_prob(A, B):
    return A / (A + B)


def beta_var(A, B):
    s = A + B
    return (A * B) / (s * s * (s + 1.0))


def beta_state(A, B, touched, var_thresh, free_thresh, occupied_thresh):
    st = _classify(beta_prob(A, B), beta_var(A, B), var_thresh, free_thresh, occupied_thresh)
    return jnp.where(touched, st, jnp.int8(UNKNOWN))


# ---------------------------------------------------------------------- BGKLV

def lv_prob(A, B, min_W):
    W = jnp.maximum(A + B, jnp.float32(min_W))
    occ = A / (W - B) + (W - A - B) * 0.5 / (W - B)
    free = 0.5 * (W - B - A) / (W - A)
    return jnp.where(A > B, occ, free)


def lv_var(A, B, min_W):
    p = lv_prob(A, B, min_W)
    W = jnp.maximum(A + B, jnp.float32(min_W))
    return (A / W) * (1.0 - p) ** 2 + ((W - A - B) / W) * (0.5 - p) ** 2 + (B / W) * p ** 2


def lv_state(A, B, touched, min_W, var_thresh, free_thresh, occupied_thresh):
    st = _classify(lv_prob(A, B, min_W), lv_var(A, B, min_W),
                   var_thresh, free_thresh, occupied_thresh, unknown_code=UNCERTAIN)
    return jnp.where(touched, st, jnp.int8(UNKNOWN))


# ------------------------------------------------------------------------- GP

def gp_prob(m_ivar, l, max_ivar):
    return 1.0 / (1.0 + jnp.exp(-jnp.float32(l) * m_ivar / jnp.float32(max_ivar)))


def gp_state(m_ivar, ivar, touched, l, max_ivar, min_known_ivar, free_thresh, occupied_thresh):
    p = gp_prob(m_ivar, l, max_ivar)
    by_p = jnp.where(
        p > jnp.float32(occupied_thresh), OCCUPIED,
        jnp.where(p < jnp.float32(free_thresh), FREE, UNKNOWN),
    )
    st = jnp.where(ivar < jnp.float32(min_known_ivar), UNKNOWN, by_p).astype(jnp.int8)
    return jnp.where(touched, st, jnp.int8(UNKNOWN))


# ---------------------------------------------------------------- state fns
# Value-hashable callables for use as jit static arguments: two maps with the
# same config share compiled executables (a fresh closure per map would make
# every map instance recompile every shape).

import dataclasses as _dc


@_dc.dataclass(frozen=True)
class BetaStateFn:
    var_thresh: float
    free_thresh: float
    occupied_thresh: float

    def __call__(self, v):
        return beta_state(v["A"], v["B"], v["touched"] > 0,
                          self.var_thresh, self.free_thresh, self.occupied_thresh)


@_dc.dataclass(frozen=True)
class LVStateFn:
    min_W: float
    var_thresh: float
    free_thresh: float
    occupied_thresh: float

    def __call__(self, v):
        return lv_state(v["A"], v["B"], v["touched"] > 0, self.min_W,
                        self.var_thresh, self.free_thresh, self.occupied_thresh)


@_dc.dataclass(frozen=True)
class GPStateFn:
    l: float
    max_ivar: float
    min_known_ivar: float
    free_thresh: float
    occupied_thresh: float

    def __call__(self, v):
        return gp_state(v["m_ivar"], v["ivar"], v["touched"] > 0, self.l,
                        self.max_ivar, self.min_known_ivar,
                        self.free_thresh, self.occupied_thresh)
