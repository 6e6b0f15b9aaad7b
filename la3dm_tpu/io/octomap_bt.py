"""OctoMap ``.bt`` (binary tree) reader — the bundled ground-truth maps.

The reference ships ``data/*/map.bt`` (and ``sim_structured_octomap.csv``)
as evaluation artifacts that no code in the repo reads (SURVEY.md §6).
This reader decodes the standard OctoMap binary format: an ASCII header
(``id OcTree``, ``size N``, ``res R``, ``data``) followed by a depth-first
bitstream of 2 bytes per inner node — 2 bits per child:

    0b00  no child          0b01  free leaf
    0b10  occupied leaf     0b11  inner child (recurse)

(Label orientation pinned against the bundled
``sim_structured_octomap.csv`` — the same map's per-leaf occupancy
probabilities: the decoded centers match its 138,477 rows 1:1 and the
binary labels equal prob > 0.5 on every leaf; tests/test_eval.py.)

(``octomap::OcTree::readBinaryData``; child i offsets: x from bit 0,
y from bit 1, z from bit 2 of i.)  Returns every leaf's center, size and
occupancy label, which `cli eval` scores maps against.
"""

from __future__ import annotations

import numpy as np

_MAX_DEPTH = 16


def read_bt(path: str) -> dict:
    """Parse a .bt file → dict(centers [L,3], sizes [L], occupied [L] bool)."""
    with open(path, "rb") as f:
        raw = f.read()
    # ASCII header up to the "data\n" line
    off = 0
    res = None
    size = None
    tree_id = None
    while True:
        nl = raw.index(b"\n", off)
        line = raw[off:nl].decode("ascii", "replace").strip()
        off = nl + 1
        if line.startswith("#") or not line:
            continue
        k, _, v = line.partition(" ")
        if k == "id":
            tree_id = v
        elif k == "size":
            size = int(v)
        elif k == "res":
            res = float(v)
        elif k == "data":
            break
    # only the plain OcTree .bt 2-bit bitstream is implemented; a ColorOcTree
    # (.ot payload: floats + RGB per node) would silently misparse, so reject
    if tree_id != "OcTree":
        raise ValueError(f"unsupported octomap id {tree_id!r} (only 'OcTree' "
                         f".bt bitstreams are implemented)")
    stream = np.frombuffer(raw, dtype=np.uint8, offset=off)

    centers: list[tuple[float, float, float]] = []
    sizes: list[float] = []
    occ: list[bool] = []

    # iterative DFS: stack of (cx, cy, cz, node_size); stream is laid out in
    # the same order octomap writes it (children 0..7 depth-first)
    root_size = res * (1 << _MAX_DEPTH)
    pos = 0

    def read_node(cx, cy, cz, s):
        nonlocal pos
        b1 = int(stream[pos])
        b2 = int(stream[pos + 1])
        pos += 2
        bits = b1 | (b2 << 8)
        q = s / 4.0
        for i in range(8):
            code = (bits >> (2 * i)) & 3
            if code == 0:
                continue
            dx = q if (i & 1) else -q
            dy = q if (i & 2) else -q
            dz = q if (i & 4) else -q
            x, y, z = cx + dx, cy + dy, cz + dz
            if code == 3:
                read_node(x, y, z, s / 2.0)
            else:
                centers.append((x, y, z))
                sizes.append(s / 2.0)
                occ.append(code == 2)

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(10000)
    try:
        read_node(0.0, 0.0, 0.0, root_size)
    finally:
        sys.setrecursionlimit(old_limit)
    return {
        "centers": np.asarray(centers, np.float64),
        "sizes": np.asarray(sizes, np.float64),
        "occupied": np.asarray(occ, bool),
        "resolution": res,
        "size": size,
    }


def expand_to_voxels(bt: dict, resolution: float | None = None) -> dict:
    """Expand coarse leaves to base-resolution voxel centers (labels kept).

    Vectorized per leaf-size group (most leaves are already base size)."""
    res = resolution or bt["resolution"]
    ks = np.maximum(np.round(bt["sizes"] / res).astype(np.int64), 1)
    out_c, out_o = [], []
    for k in np.unique(ks):
        sel = ks == k
        centers = bt["centers"][sel]
        occ = bt["occupied"][sel]
        if k == 1:
            out_c.append(centers)
            out_o.append(occ)
            continue
        ax = (np.arange(k) - (k - 1) / 2.0) * res
        gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
        offs = np.stack([gx, gy, gz], -1).reshape(-1, 3)       # [k³,3]
        out_c.append((centers[:, None, :] + offs[None]).reshape(-1, 3))
        out_o.append(np.repeat(occ, len(offs)))
    return {"centers": np.concatenate(out_c), "occupied": np.concatenate(out_o)}
