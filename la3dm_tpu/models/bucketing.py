"""Host-side bucketing: ragged per-block training sets → padded device tensors.

Replaces the reference's per-scan R-tree (``rtree.Insert``/``Search``,
``bgkoctomap.cpp:240-243``): the R-tree only ever answers "entries in an
axis-aligned box" over the current scan, which block bucketing + the
face-neighbor gather answers exactly (ExtendedBlock semantics,
``bgkblock.cpp:85-101``).

Output of :func:`bucket_by_block` feeds :mod:`la3dm_tpu.kernels.predict`:
for every *test block* (any block whose extended neighborhood holds ≥1
training entry — the reference's test_blocks, ``bgkoctomap.cpp:253-262``),
a padded row of all entries from its ``G`` neighbor blocks tagged with the
neighbor-slot id for per-model k̄ gating.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from la3dm_tpu.geometry import blocks as geo


@dataclasses.dataclass
class BlockBuckets:
    """Padded per-test-block training data (host numpy, ready to ship)."""

    test_coords: np.ndarray   # [B,3] int64 test-block coords
    entries: np.ndarray       # [B,S,D] f32 block-local training entries
    labels: np.ndarray        # [B,S] f32
    slots: np.ndarray         # [B,S] int32 neighbor-slot ids
    valid: np.ndarray         # [B,S] bool


@dataclasses.dataclass
class BucketTables:
    """Compact bucketing: sorted entries + per-(test block, slot) segments.

    The padded [B,S,D] neighbor-gathered tensor is built ON DEVICE from these
    (a few hundred KB instead of tens of MB shipped per scan — host→device
    transfer is the latency driver on tunneled TPU).
    """

    test_coords: np.ndarray   # [B,3] int64
    entries: np.ndarray       # [N,D] f32 sorted by owning block
    labels: np.ndarray        # [N]   f32
    starts: np.ndarray        # [B,G] int32 segment start in entries
    counts: np.ndarray        # [B,G] int32 segment length
    max_total: int            # max over rows of counts.sum(axis=1)


def bucket_tables(entry_coords: np.ndarray, entries: np.ndarray, labels: np.ndarray,
                  neighbor_offsets: np.ndarray) -> BucketTables:
    """Sort entries by block and build the (start,count) neighbor table."""
    order, ukeys, starts, counts = group_by_block(entry_coords)
    entries_s = np.ascontiguousarray(entries[order], dtype=np.float32)
    labels_s = np.ascontiguousarray(labels[order], dtype=np.float32)

    test_coords = test_blocks_for(ukeys, neighbor_offsets)
    B, G = len(test_coords), len(neighbor_offsets)
    nb_keys = geo.pack_key(test_coords[:, None, :] + neighbor_offsets[None, :, :])
    pos = np.searchsorted(ukeys, nb_keys.reshape(-1))
    pos = np.clip(pos, 0, max(len(ukeys) - 1, 0))
    hit = ukeys[pos] == nb_keys.reshape(-1) if len(ukeys) else np.zeros(pos.shape, bool)
    seg_start = np.where(hit, starts[pos], 0).reshape(B, G).astype(np.int32)
    seg_count = np.where(hit, counts[pos], 0).reshape(B, G).astype(np.int32)
    max_total = int(seg_count.sum(axis=1).max()) if B else 0
    return BucketTables(test_coords=test_coords, entries=entries_s, labels=labels_s,
                        starts=seg_start, counts=seg_count, max_total=max_total)


def group_by_block(coords: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Sort entries by block key; return (order, unique_keys, starts, counts)."""
    keys = geo.pack_key(coords)
    order = np.argsort(keys, kind="stable")
    ukeys, starts, counts = np.unique(keys[order], return_index=True, return_counts=True)
    return order, ukeys, starts, counts


def test_blocks_for(ukeys: np.ndarray, neighbor_offsets: np.ndarray) -> np.ndarray:
    """Coords of every block whose G-neighborhood intersects the entry blocks."""
    ucoords = geo.unpack_key(ukeys)
    cand = (ucoords[:, None, :] + neighbor_offsets[None, :, :]).reshape(-1, 3)
    return geo.unpack_key(np.unique(geo.pack_key(cand)))


def bucket_by_block(entry_coords: np.ndarray, entries: np.ndarray, labels: np.ndarray,
                    neighbor_offsets: np.ndarray, block_size: float) -> BlockBuckets:
    """Build padded neighbor-gathered buckets.

    Entries stay in world coordinates: the reference evaluates kernels on
    world-frame float32 positions, and the k̄ update gate is ulp-sensitive at
    the sparse kernel's support boundary, so block-local re-centering would
    flip gate decisions.

    Args:
      entry_coords: [N,3] owning-block coords of each training entry.
      entries: [N,D] training payload (points D=3 or segments D=6).
      labels:  [N].
      neighbor_offsets: [G,3] neighborhood (self first).
      block_size: world size of a block.
    """
    order, ukeys, starts, counts = group_by_block(entry_coords)
    entries_s = entries[order]
    labels_s = labels[order]

    test_coords = test_blocks_for(ukeys, neighbor_offsets)
    B, G = len(test_coords), len(neighbor_offsets)

    # per (test block, slot): segment into the sorted entry array
    nb_keys = geo.pack_key(test_coords[:, None, :] + neighbor_offsets[None, :, :])  # [B,G]
    pos = np.searchsorted(ukeys, nb_keys.reshape(-1))
    pos = np.clip(pos, 0, len(ukeys) - 1)
    hit = ukeys[pos] == nb_keys.reshape(-1)
    seg_start = np.where(hit, starts[pos], 0).reshape(B, G)
    seg_count = np.where(hit, counts[pos], 0).reshape(B, G)

    totals = seg_count.sum(axis=1)
    S = max(int(totals.max()) if B else 0, 8)
    D = entries.shape[1]

    out_entries = np.zeros((B, S, D), np.float32)
    out_labels = np.zeros((B, S), np.float32)
    out_slots = np.zeros((B, S), np.int32)
    out_valid = np.zeros((B, S), bool)
    # vectorized ragged copy: one flat gather/scatter over all (b,g) segments
    lens = seg_count.reshape(-1)                                   # [B*G]
    starts_flat = seg_start.reshape(-1)
    col_base = np.concatenate([np.zeros((B, 1), np.int64),
                               np.cumsum(seg_count, axis=1)[:, :-1]], axis=1).reshape(-1)
    total = int(lens.sum())
    if total:
        within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        src = np.repeat(starts_flat, lens) + within
        rows = np.repeat(np.arange(B * G) // G, lens)
        cols = np.repeat(col_base, lens) + within
        slot_of_pair = np.repeat(np.arange(B * G) % G, lens)
        out_entries[rows, cols] = entries_s[src]
        out_labels[rows, cols] = labels_s[src]
        out_slots[rows, cols] = slot_of_pair
        out_valid[rows, cols] = True
    return BlockBuckets(test_coords=test_coords, entries=out_entries,
                        labels=out_labels, slots=out_slots, valid=out_valid)
