"""Dense octree pruning over the block pool.

The reference prunes bottom-up per block: 8 sibling leaves with identical
non-UNKNOWN states collapse into their parent, which receives *child 0's*
posterior values (``bgkoctree.cpp:101-148``, parent := layer[index]).  Pruning
is genuinely map state — later scans iterate the collapsed leaves and update
them at the coarser node centers — so it cannot be deferred to render time.

Dense encoding: ``eff_level[v] ∈ [0, depth-1]`` is the octree level of the
leaf owning base voxel v (0 = base resolution).  Invariants maintained here
and by the update steps:
  * eff_level is constant over each 2^L-aligned group it claims;
  * posterior values are identical across a collapsed group (updates evaluate
    kernels at the shared eff-center, so deltas match).

Collapse rule per level L (= reference depth max−L), from L=1 upward:
all 8 child nodes are leaves at level L−1, their states are equal and not
UNKNOWN → the whole 2^L group takes the minimum-corner leaf's values
(child 0 in the reference's BFS child order is the most-negative corner).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from la3dm_tpu.models import posterior


def _group_view(x: jax.Array, n: int, m: int) -> jax.Array:
    """[..., n³] (raster x-fastest) → [..., G³, m³] group-major view.

    Flat raster index = x + y·n + z·n² splits as (zg zm yg ym xg xm) with zg
    slowest; groups are the 2^L-aligned cubes, their inner index ordered
    (zm, ym, xm) so element 0 is the minimum corner (= the reference's child-0
    chain, bgkblock.cpp:23-27).
    """
    lead = x.shape[:-1]
    nl = len(lead)
    g = n // m
    x = x.reshape(*lead, g, m, g, m, g, m)  # zg zm yg ym xg xm
    perm = tuple(range(nl)) + tuple(nl + a for a in (0, 2, 4, 1, 3, 5))
    x = x.transpose(perm)                    # zg yg xg zm ym xm
    return x.reshape(*lead, g * g * g, m * m * m)


def _ungroup(x: jax.Array, n: int, m: int) -> jax.Array:
    lead = x.shape[:-2]
    nl = len(lead)
    g = n // m
    x = x.reshape(*lead, g, g, g, m, m, m)  # zg yg xg zm ym xm
    perm = tuple(range(nl)) + tuple(nl + a for a in (0, 3, 1, 4, 2, 5))
    x = x.transpose(perm)                    # zg zm yg ym xg xm
    return x.reshape(*lead, n * n * n)


@functools.partial(jax.jit, static_argnames=("n", "max_level", "state_fn"))
def prune_blocks(values: dict, eff_level: jax.Array, n: int, max_level: int,
                 state_fn: Callable[[dict], jax.Array]) -> tuple[dict, jax.Array]:
    """Collapse homogeneous sibling groups across a batch of blocks.

    Args:
      values: dict of [B, n³] posterior arrays (family-specific fields).
      eff_level: [B, n³] int8 current leaf levels.
      n: voxels per block edge.
      max_level: deepest collapse level (= block_depth − 1).
      state_fn: values-dict → [B, n³] int8 state (already includes touched).
    Returns:
      (new values, new eff_level).
    """
    state = state_fn(values)
    for L in range(1, max_level + 1):
        m = 1 << L
        st_g = _group_view(state, n, m)        # [B, G³, m³]
        eff_g = _group_view(eff_level, n, m)
        # all leaves in the group sit at level L-1 (i.e. 8 child nodes, each a leaf)
        children_are_leaves = jnp.all(eff_g == L - 1, axis=-1)
        # the 8 child states equal and not UNKNOWN: since values are constant
        # within each child, check all m³ base voxels share one state
        uniform = jnp.all(st_g == st_g[..., :1], axis=-1)
        collapsible = children_are_leaves & uniform & (st_g[..., 0] != posterior.UNKNOWN)

        def collapse(arr):
            g = _group_view(arr, n, m)
            g = jnp.where(collapsible[..., None], g[..., :1], g)
            return _ungroup(g, n, m)

        values = {k: collapse(v) for k, v in values.items()}
        state = collapse(state)
        eff_g = jnp.where(collapsible[..., None], jnp.int8(L), eff_g)
        eff_level = _ungroup(eff_g, n, m)
    return values, eff_level
