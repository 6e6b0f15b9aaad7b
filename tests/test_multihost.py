"""Two-process jax.distributed equivalence (SURVEY §4(c): multi-host on a
CPU mesh, no TPU hardware required).

Spawns 2 worker processes (2 virtual CPU devices each → a 4-device global
mesh), runs the sharded BGK map with replicated scan ingestion, and checks
the posterior checksums against a single-process map on the same stream.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_matches_single():
    coord = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen([sys.executable, WORKER, coord, "2", str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
    line = next(l for l in outs[0][0].splitlines() if l.startswith("CHECKSUM"))
    got = np.array([float(x) for x in line.split()[1:]])

    # single-process reference on the identical stream
    from la3dm_tpu.models.bgk import BGKOctoMap
    from la3dm_tpu.utils.config import MapConfig

    cfg = MapConfig(method="bgk", resolution=0.1, block_depth=3, ell=0.2, sf2=1.0)
    m = BGKOctoMap(cfg)
    rng = np.random.default_rng(123)
    for i in range(2):
        pts = rng.uniform(-1.5, 1.5, (300, 3)).astype(np.float32)
        labels = (rng.uniform(size=300) > 0.4).astype(np.float32)
        m.insert_training_data(pts, labels)
    A = np.asarray(m.pool.fields["A"], np.float64)
    B = np.asarray(m.pool.fields["B"], np.float64)
    # subtract the untouched-pool fill contribution present in both sums
    want = np.array([A.sum(), (A * A).sum(), B.sum(), (B * B).sum()])

    # pool capacities differ (512 vs default); compare after removing the
    # prior-filled background: counts of prior cells differ by capacity
    prior = float(cfg.prior_A)
    cap_w = A.size
    # worker pool: 2048 blocks × V voxels
    V = m.V
    cap_g = 2048 * V
    adj = np.array([prior * (cap_g - cap_w), prior ** 2 * (cap_g - cap_w),
                    prior * (cap_g - cap_w), prior ** 2 * (cap_g - cap_w)])
    np.testing.assert_allclose(got, want + adj, rtol=1e-5, atol=1e-3)
