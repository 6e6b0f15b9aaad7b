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
import jax.numpy as jnp

from la3dm_tpu.geometry import blocks as geo
from la3dm_tpu.models import base
from la3dm_tpu.models.bgk import BGKOctoMap
from la3dm_tpu.models.bgkl import BGKLOctoMap
from la3dm_tpu.models.bgklv import BGKLVOctoMap
from la3dm_tpu.models.gp import GPOctoMap
from la3dm_tpu.parallel import mesh as pm
from la3dm_tpu.utils.config import MapConfig


class ShardedBlockPool(base.BlockPool):
    """Device-interleaved slot assignment; grows by resharding.

    Growth doubles capacity and re-lays-out every shard: slot ids are
    chunk-relative ((c % n_dev)·chunk + c//n_dev), so the old slot c maps to
    a new slot under the doubled chunk — a device-side gather re-places all
    per-block rows, and the host key→slot dict is rebuilt.  Growth happens
    between scans (``ensure`` runs host-side), so jitted step shapes change
    only at that boundary — one recompile per doubling, like the unsharded
    pool.
    """

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
        self.generation += 1  # invalidates previously returned slot ids
        new_cap = self.capacity
        while new_cap < min_capacity:
            new_cap *= 2
        new_chunk = new_cap // self.n_dev
        # old slot of block c → new slot of block c (both chunk-relative)
        order = np.argsort(list(self._slot_of.values()))  # stable map rebuild
        keys = np.asarray(list(self._slot_of.keys()), np.int64)[order]
        old_slots = np.asarray(list(self._slot_of.values()), np.int64)[order]
        c_of = (old_slots % self.chunk) * self.n_dev + old_slots // self.chunk
        new_slots = (c_of % self.n_dev) * new_chunk + c_of // self.n_dev

        src = np.full(new_cap, self.capacity, np.int64)  # gather index (old)
        src[new_slots] = old_slots
        src_dev = jax.device_put(jnp.asarray(src), pm.replicated(self.mesh))

        def regather(arr, fill):
            padded = jnp.concatenate(
                [arr, jnp.full((1, self.V), fill, arr.dtype)])
            out = padded[src_dev]
            return jax.device_put(out, self.sharding)

        for name, arr in self.fields.items():
            self.fields[name] = regather(arr, self._fills[name])
        self.touched = regather(self.touched, False)
        self.eff_level = regather(self.eff_level, 0)

        new_coords = np.zeros((new_cap, 3), np.int64)
        new_coords[new_slots] = self.coords[old_slots]
        self.coords = new_coords
        self._slot_of = {int(k): int(s) for k, s in zip(keys, new_slots)}
        self.capacity = new_cap
        self.chunk = new_chunk

    def ensure(self, coords: np.ndarray) -> np.ndarray:
        keys = geo.pack_key(coords)
        slots = np.empty(len(keys), dtype=np.int32)
        gen0 = self.generation
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
                slots[i] = s
                self.n_blocks += 1
            else:
                slots[i] = s
        if self.generation != gen0:
            # a mid-call _grow remapped every slot; ids written before it are
            # stale — re-resolve the whole batch against the final layout
            for i, k in enumerate(keys):
                slots[i] = self._slot_of[int(k)]
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
