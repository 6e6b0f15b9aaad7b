#!/usr/bin/env python
"""Profiler-derived FLOP anchor for the bench's hand-counted MFU numbers.

Runs one workload (BGK over the 60-scan long-term sequence, device-ingest
path) under ``jax.profiler``, converts the xplane trace with xprof, sums
per-op FLOPs (Model GFLOP/s × self time over every HLO op), and prints the
measured total next to the bench's hand count
(``stats["kernel_evals"] × FLOP_PER_EVAL``).

The reconciliation this produced is documented in bench.py next to
FLOP_PER_EVAL; re-run after engine changes:

    python tools/mfu_anchor.py
"""

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRACE_DIR = "/tmp/la3dm_mfu_trace"


def main() -> int:
    import numpy as np
    import jax
    from la3dm_tpu.io.pcd import load_pcd
    from la3dm_tpu.models.bgk import BGKOctoMap
    from la3dm_tpu.utils.config import load_dataset_config, load_method_config

    cfg = load_method_config("bgk")
    ds = load_dataset_config("sim_structured_long_term")
    clouds, origins = [], []
    for i in range(1, 61):
        c, o = load_pcd(f"{ds.dir}/{ds.prefix}_{i}.pcd")
        clouds.append(c)
        origins.append(o)

    def one_run():
        m = BGKOctoMap(cfg)
        m.insert_pointclouds(clouds, origins, max_range=ds.max_range)
        np.asarray(m.pool.fields["A"][0, 0])   # drain
        return m

    one_run()                                   # warm the executables
    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    t0 = time.perf_counter()
    m = one_run()
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    hand_flops = m.stats["kernel_evals"] * 50   # bench.py FLOP_PER_EVAL[bgk]

    from xprof.convert import raw_to_tool_data as rtd

    files = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.xplane.pb"))
    data, _ = rtd.xspace_to_tool_data([files[-1]], "hlo_stats", {})
    d = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c.get("label") for c in d["cols"]]
    rows = [dict(zip(cols, [c.get("v") for c in r["c"]])) for r in d["rows"]]
    measured = 0.0
    device_us = 0.0
    for r in rows:
        t_us = r.get("Total self time (us)") or 0.0
        rate = r.get("Model GFLOP/s") or 0.0     # per-op achieved GFLOP/s
        measured += rate * 1e9 * t_us * 1e-6
        device_us += t_us
    print(json.dumps({
        "workload": "bgk long60 (device ingest)",
        "wall_s": round(wall, 3),
        "device_s_from_trace": round(device_us / 1e6, 3),
        "profiler_flops": round(measured / 1e9, 2),
        "hand_count_flops_gf": round(hand_flops / 1e9, 2),
        "ratio_profiler_over_hand": round(measured / max(hand_flops, 1), 2),
        "kernel_evals": int(m.stats["kernel_evals"]),
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
