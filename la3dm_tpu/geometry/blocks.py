"""Block-grid geometry: hash keys, voxel rasterization, neighborhoods.

The reference partitions space into blocks of ``2^(depth-1)`` voxels per edge,
centered on integer multiples of ``block_size`` — ``block_to_hash_key`` packs
``int64(x/size + 524288.5)`` per axis into an int64
(``src/bgkoctomap/bgkblock.cpp:73-77``), i.e. each block index is the
*round-half-up nearest integer* of ``center/size``.

Here a block is identified by its integer coordinate triple ``(bx,by,bz)``
(int32); the packed int64 key is only used as a dict key host-side.  Voxels
within a block are stored in raster order ``idx = x + y*n + z*n²`` with x
fastest — matching the reference's ``index_map`` built by three stable sorts
(z-major; ``bgkblock.cpp:34-67``) and ``Block::get_node`` (``bgkblock.cpp:132-135``).
Voxel centers are ``block_center + res*(i - n/2 + 0.5)`` per axis
(``init_key_loc_map``, ``bgkblock.cpp:7-32``).
"""

from __future__ import annotations

import numpy as np

# 6 face neighbors in the reference's ExtendedBlock order: self, +x, -x, +y, -y, +z, -z
# (bgkblock.cpp:114-130: i=0..5 → ex/ey/ez = ±size on axis i//2, + first).
FACE_NEIGHBOR_OFFSETS = np.array(
    [
        [0, 0, 0],
        [1, 0, 0],
        [-1, 0, 0],
        [0, 1, 0],
        [0, -1, 0],
        [0, 0, 1],
        [0, 0, -1],
    ],
    dtype=np.int32,
)


def full_neighbor_offsets() -> np.ndarray:
    """27-cell neighborhood for -DPREDICT mode (bgkblock.h:22-26), self first."""
    offs = [[0, 0, 0]]
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if (dx, dy, dz) != (0, 0, 0):
                    offs.append([dx, dy, dz])
    return np.array(offs, dtype=np.int32)


def point_to_block_coord(points: np.ndarray, block_size: float) -> np.ndarray:
    """Map points [N,3] → integer block coords [N,3].

    Matches ``block_to_hash_key`` (bgkblock.cpp:73-77): index =
    floor(p/size + 0.5) in double precision (the +524288.5 bias makes the
    int64 truncation a floor for all in-range coordinates).
    """
    return np.floor(points.astype(np.float64) / float(block_size) + 0.5).astype(np.int64)


def block_center(coords: np.ndarray, block_size: float) -> np.ndarray:
    """Integer block coords [...,3] → world-space centers [...,3] (float32).

    hash_key_to_block computes ``index * Block::size`` in float32
    (bgkblock.cpp:79-83).
    """
    return (coords.astype(np.float64) * np.float32(block_size)).astype(np.float32)


def pack_key(coords: np.ndarray) -> np.ndarray:
    """Pack int block coords [...,3] → int64 scalar keys (20 bits/axis + bias).

    Same packing as the reference BlockHashKey (bgkblock.cpp:73-77).
    """
    c = coords.astype(np.int64) + 524288
    return (c[..., 0] << 40) | (c[..., 1] << 20) | c[..., 2]


def unpack_key(keys: np.ndarray) -> np.ndarray:
    keys = np.asarray(keys, dtype=np.int64)
    return np.stack(
        [
            (keys >> 40) - 524288,
            ((keys >> 20) & 0xFFFFF) - 524288,
            (keys & 0xFFFFF) - 524288,
        ],
        axis=-1,
    ).astype(np.int64)


def voxel_offsets(resolution: float, block_depth: int) -> np.ndarray:
    """Leaf-voxel center offsets from block center, [n³,3] float32, raster order.

    Reproduces the reference's key_loc_map leaf entries in index_map order
    (x fastest, z slowest; bgkblock.cpp:7-67): offset = res*(i - n/2 + 0.5).
    """
    n = 1 << (block_depth - 1)
    i = np.arange(n, dtype=np.float32)
    off = (i - n / 2.0 + 0.5) * np.float32(resolution)
    zz, yy, xx = np.meshgrid(off, off, off, indexing="ij")
    return np.stack([xx, yy, zz], axis=-1).reshape(-1, 3).astype(np.float32)


def level_offsets(resolution: float, block_depth: int, level: int) -> np.ndarray:
    """Center offsets of depth-(block_depth-1-level) nodes covering each leaf.

    ``level=0`` is the leaf itself; ``level=L`` gives, for every leaf voxel in
    raster order, the center of its 2^L-aligned ancestor node.  Used to
    evaluate kernels at pruned-leaf centers (see models/pruning.py).
    """
    n = 1 << (block_depth - 1)
    m = 1 << level  # cells per edge of the ancestor node
    i = np.arange(n, dtype=np.int64) // m  # ancestor index per axis
    off = ((i * m + m / 2.0) - n / 2.0) * np.float32(resolution)
    off = off.astype(np.float32)
    zz, yy, xx = np.meshgrid(off, off, off, indexing="ij")
    return np.stack([xx, yy, zz], axis=-1).reshape(-1, 3).astype(np.float32)


def point_to_voxel_index(points: np.ndarray, centers: np.ndarray, resolution: float, n: int) -> np.ndarray:
    """Points [N,3] + their block centers [N,3] → raster voxel index [N].

    Matches ``Block::get_index`` (bgkblock.cpp:141-149): int cast (trunc) of
    (p-center)/res + n/2, clipped to [0, n-1], then x + y*n + z*n².
    """
    rel = (points - centers) / np.float32(resolution) + n / 2.0
    idx = np.clip(rel.astype(np.int32), 0, n - 1)
    return idx[:, 0] + idx[:, 1] * n + idx[:, 2] * n * n
