"""Eval harness pinning: the .bt ground-truth decoder and `cli eval`.

The reference ships two views of the same OctoMap evaluation map for
sim_structured (SURVEY.md §6): ``map.bt`` (binary, labeled) and
``sim_structured_octomap.csv`` (138,477 rows of x,y,z,size — unlabeled
leaf dump).  Decoding the .bt must reproduce the CSV's leaf set exactly —
that pins the bitstream child-offset/label-orientation choices in
``io/octomap_bt.py`` against an artifact this repo did not generate.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/root/reference/data/sim_structured"
BT = os.path.join(DATA, "map.bt")
CSV = os.path.join(DATA, "sim_structured_octomap.csv")


@pytest.fixture(scope="module")
def bt():
    from la3dm_tpu.io.octomap_bt import read_bt

    return read_bt(BT)


def test_read_bt_leaf_count_matches_csv(bt):
    rows = np.loadtxt(CSV, delimiter=",")
    assert len(bt["centers"]) == len(rows) == 138477


def test_read_bt_leaves_match_csv_geometry(bt):
    """Decoded leaf centers == the CSV's, 1:1 (sorted), to 1e-6."""
    rows = np.loadtxt(CSV, delimiter=",")

    def order(a):
        return np.lexsort((a[:, 2], a[:, 1], a[:, 0]))

    got = bt["centers"][order(bt["centers"])]
    want = rows[order(rows[:, :3]), :3]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_read_bt_labels_match_csv_probabilities(bt):
    """The CSV's 4th column is each leaf's occupancy probability (0.1192 /
    0.971 are OctoMap's clamping bounds).  The .bt's binary labels must equal
    prob > 0.5 on every one of the 138,477 leaves — this pins both the
    bitstream child-offset convention and the 01-free/10-occupied label
    orientation against an artifact this repo did not generate."""
    rows = np.loadtxt(CSV, delimiter=",")

    def order(a):
        return np.lexsort((a[:, 2], a[:, 1], a[:, 0]))

    got_occ = bt["occupied"][order(bt["centers"])]
    want_occ = rows[order(rows[:, :3]), 3] > 0.5
    assert (got_occ == want_occ).all()


def test_read_bt_rejects_color_octree(tmp_path):
    from la3dm_tpu.io.octomap_bt import read_bt

    p = tmp_path / "c.bt"
    p.write_bytes(b"# Octomap OcTree binary file\nid ColorOcTree\n"
                  b"size 1\nres 0.1\ndata\n\x00\x00")
    with pytest.raises(ValueError, match="ColorOcTree"):
        read_bt(str(p))


def test_cli_eval_smoke():
    """`cli eval` end-to-end on 2 scans: sane JSON report, AUC over chance."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "la3dm_tpu.cli", "eval", "--method", "bgk",
         "--dataset", "sim_structured", "--scan-num", "2"],
        capture_output=True, text=True, timeout=540, check=True,
        cwd=REPO, env=env)
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["gt_voxels"] >= 138477  # expanded to base resolution
    assert 0 < rep["known"] <= rep["gt_voxels"]
    assert rep["auc"] > 0.6            # well over chance even at 2 scans
    assert 0 < rep["coverage"] < 1


def test_write_bt_reencodes_ground_truth_byte_identically(bt, tmp_path):
    """write_bt(read_bt(map.bt)) reproduces octomap's own bitstream AND its
    node count byte-for-byte — the writer is pinned against an artifact this
    repo did not generate, not just against our own reader."""
    from la3dm_tpu.io.octomap_bt import read_bt, write_bt

    p = tmp_path / "re.bt"
    write_bt(str(p), bt["centers"], bt["sizes"], bt["occupied"],
             bt["resolution"])

    def sections(path):
        raw = open(path, "rb").read()
        cut = raw.index(b"data\n") + 5
        hdr = dict(line.split(" ", 1) for line in
                   raw[:cut].decode().splitlines()
                   if line and " " in line and not line.startswith("#"))
        return hdr, raw[cut:]

    h_src, d_src = sections(BT)
    h_got, d_got = sections(str(p))
    assert d_got == d_src                       # 65,620-byte bitstream
    assert h_got["size"] == h_src["size"]       # 171,287 tree nodes
    assert float(h_got["res"]) == float(h_src["res"])

    back = read_bt(str(p))
    np.testing.assert_array_equal(back["centers"], bt["centers"])
    np.testing.assert_array_equal(back["occupied"], bt["occupied"])


def test_write_bt_from_map_roundtrip(tmp_path):
    """A real map exports to .bt and reads back with the same classified
    voxel set at base resolution.  Coarse pruned leaves survive where the
    global octomap grid can represent them (block-center-aligned nodes are
    half a cell off that grid and get split), so the .bt must have FEWER
    leaves than the base-resolution expansion but the same voxel labels."""
    from la3dm_tpu.io.octomap_bt import expand_to_voxels, read_bt, \
        write_bt_from_map
    from la3dm_tpu.io.pcd import load_pcd
    from la3dm_tpu.models.bgk import BGKOctoMap
    from la3dm_tpu.models import posterior
    from la3dm_tpu.utils.config import load_method_config

    m = BGKOctoMap(load_method_config("bgk", max_range=6.0))
    cloud, origin = load_pcd(os.path.join(DATA, "sim_structured_1.pcd"))
    m.insert_pointcloud(cloud, origin)
    p = tmp_path / "m.bt"
    write_bt_from_map(str(p), m)
    back = read_bt(str(p))
    vox = expand_to_voxels(back, m.cfg.resolution)

    leaves = m.leaves(expand_pruned=True)
    keep = leaves["state"] != posterior.UNKNOWN
    want_c = np.stack([leaves["x"][keep], leaves["y"][keep],
                       leaves["z"][keep]], 1)
    assert (back["sizes"] > m.cfg.resolution * 1.5).any()  # kept some coarse
    assert len(back["centers"]) < int(keep.sum())
    assert len(vox["centers"]) == int(keep.sum()) > 0

    def order(c):
        return np.lexsort((c[:, 2], c[:, 1], c[:, 0]))

    got = order(vox["centers"])
    want = order(want_c)
    np.testing.assert_allclose(vox["centers"][got], want_c[want], atol=1e-5)
    np.testing.assert_array_equal(
        vox["occupied"][got],
        (leaves["state"][keep] == posterior.OCCUPIED)[want])
