"""Worker for the 2-process jax.distributed test (see test_multihost.py).

Each process owns 2 virtual CPU devices; the block pool shards over the
4-device global mesh. Scan ingestion is replicated (deterministic), so both
processes enqueue identical updates and GSPMD handles the cross-host
scatter. Prints a replicated checksum of the posterior state.

Usage: python multihost_worker.py <coordinator> <num_procs> <proc_id>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coord, n_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from la3dm_tpu.parallel import distributed, mesh as pm
    from la3dm_tpu.parallel.sharded_map import ShardedBGKOctoMap
    from la3dm_tpu.utils.config import MapConfig

    distributed.initialize(coord, n_procs, pid)
    assert len(jax.devices()) == 2 * n_procs, jax.devices()
    mesh = distributed.global_mesh()

    cfg = MapConfig(method="bgk", resolution=0.1, block_depth=3, ell=0.2, sf2=1.0)
    m = ShardedBGKOctoMap(cfg, mesh=mesh, capacity=2048)

    rng = np.random.default_rng(123)  # same stream on every process
    for i in range(2):
        pts = rng.uniform(-1.5, 1.5, (300, 3)).astype(np.float32)
        labels = (rng.uniform(size=300) > 0.4).astype(np.float32)
        m.insert_training_data(pts, labels)

    import jax.numpy as jnp

    rep = pm.replicated(mesh)
    checks = jax.jit(
        lambda a, b: (jnp.sum(a), jnp.sum(a * a), jnp.sum(b), jnp.sum(b * b)),
        out_shardings=(rep, rep, rep, rep),
    )(m.pool.fields["A"], m.pool.fields["B"])
    vals = [float(x) for x in checks]
    if pid == 0:
        print("CHECKSUM", " ".join(f"{v:.6f}" for v in vals), flush=True)


if __name__ == "__main__":
    main()
