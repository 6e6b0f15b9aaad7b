"""Block-sharded occupancy maps over a device mesh.

``ShardedBGKOctoMap`` / ``ShardedBGKLOctoMap`` distribute the block pool's
slot axis over a 1-D ``Mesh`` and run the fused scan update under GSPMD:
the per-block kernel evaluation parallelizes over the batch axis, and the
pool scatter executes against the sharded state.  Slot allocation
round-robins new blocks across device chunks so *active* blocks — not just
addresses — balance across the mesh (sensor sweeps concentrate work in few
blocks; SURVEY.md §7 hard parts).

Cross-block coupling (ExtendedBlock training-point reads within kernel
support ℓ) is resolved at bucketing time — each test-block row already
carries its 7-neighborhood's points — so the only cross-device traffic is
the batch-row → owner-slot scatter, which XLA lowers to an all-to-all over
ICI.

The pool capacity is fixed at construction (growth would re-layout every
shard); pick capacity ≥ expected block count.
"""

from __future__ import annotations

import numpy as np
import jax

from la3dm_tpu.geometry import blocks as geo
from la3dm_tpu.models import base
from la3dm_tpu.models.bgk import BGKOctoMap
from la3dm_tpu.models.bgkl import BGKLOctoMap
from la3dm_tpu.models.bgklv import BGKLVOctoMap
from la3dm_tpu.models.gp import GPOctoMap
from la3dm_tpu.parallel import mesh as pm
from la3dm_tpu.utils.config import MapConfig


class ShardedBlockPool(base.BlockPool):
    """Fixed-capacity pool with device-interleaved slot assignment."""

    def __init__(self, voxels_per_block, fields, capacity, mesh):
        n_dev = len(mesh.devices.flat)
        capacity = base.round_up(capacity, n_dev)
        super().__init__(voxels_per_block, fields, capacity=capacity)
        self.mesh = mesh
        self.n_dev = n_dev
        self.chunk = self.capacity // n_dev
        self.sharding = pm.pool_sharding(mesh)
        for k in self.fields:
            self.fields[k] = jax.device_put(self.fields[k], self.sharding)
        self.touched = jax.device_put(self.touched, self.sharding)
        self.eff_level = jax.device_put(self.eff_level, self.sharding)

    def _grow(self, min_capacity):
        raise RuntimeError(
            f"sharded pool capacity {self.capacity} exhausted; construct with "
            f"capacity ≥ {min_capacity}")

    def ensure(self, coords: np.ndarray) -> np.ndarray:
        keys = geo.pack_key(coords)
        slots = np.empty(len(keys), dtype=np.int32)
        for i, k in enumerate(keys):
            s = self._slot_of.get(int(k), -1)
            if s < 0:
                c = self.n_blocks
                if c >= self.capacity:
                    self._grow(c + 1)
                # round-robin device chunks: block c → device c%n, offset c//n
                s = (c % self.n_dev) * self.chunk + c // self.n_dev
                self._slot_of[int(k)] = s
                self.coords[s] = coords[i]
                self.n_blocks += 1
            slots[i] = s
        return slots

    def active_slots(self) -> np.ndarray:
        return np.fromiter(self._slot_of.values(), dtype=np.int32, count=self.n_blocks)


class _ShardedMixin:
    def __init__(self, cfg: MapConfig, mesh=None, capacity: int = 8192):
        self._mesh = mesh if mesh is not None else pm.block_mesh()
        self._capacity = capacity
        super().__init__(cfg)
        self._level_offsets = jax.device_put(
            self._level_offsets, pm.replicated(self._mesh))

    def _make_pool(self):
        return ShardedBlockPool(self.V, self.FIELD_FILLS, self._capacity, self._mesh)


class ShardedBGKOctoMap(_ShardedMixin, BGKOctoMap):
    """BGK map with the block pool sharded over a 1-D mesh."""


class ShardedBGKLOctoMap(_ShardedMixin, BGKLOctoMap):
    """BGKL map with the block pool sharded over a 1-D mesh."""


class ShardedGPOctoMap(_ShardedMixin, GPOctoMap):
    """GP map: batched Cholesky tiers parallelize over the model-batch axis;
    the BCM scatter addresses the sharded pool (all-to-all over ICI)."""


class ShardedBGKLVOctoMap(_ShardedMixin, BGKLVOctoMap):
    """LV map: the tile engine's flat [capacity·V] pool views reshape a
    slot-sharded [capacity, V] array, so each device owns a contiguous flat
    slab and the per-tile scatter stays GSPMD-partitioned."""

    def __init__(self, cfg: MapConfig, mesh=None, capacity: int = 8192):
        super().__init__(cfg, mesh=mesh, capacity=capacity)
        # device-resident tile constants, replicated (lazily created in the
        # base class; eager + replicated here so jit sees consistent devices)
        import jax.numpy as jnp

        self._dev_consts = (
            jax.device_put(jnp.asarray(self._tile_vox_map), pm.replicated(self._mesh)),
            jax.device_put(jnp.asarray(self._vox_base), pm.replicated(self._mesh)),
        )
