"""Serving-latency regression guard (VERDICT r04 item 9).

Round-over-round drift in serving latency can hide inside BASELINE.md's
honest noise bands (r3→r4 serve_p50 doubled while staying "in band").
This guard pins a HARD ceiling: probe-gated range-sharded serve p50 over
the sf0.01 documents index must stay under BAND_P50_MS × TOLERANCE, else
exit 1.  Exit 2 (indeterminate, NOT a failure) when no clean CPU window is
available — a stolen-CPU measurement says nothing about the code.

Band provenance: BAND_P50_MS is the round-5 clean-window measurement on
this corpus (see BASELINE.md r5 serving table); re-pin it whenever the
serving architecture intentionally changes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BAND_P50_MS = 7.0   # round-5 clean-window serve p50 on the sf0.01 index
#                     (measured 6.1 ms at probe 3%, 2026-08-18)
TOLERANCE = 1.5     # fail when p50 exceeds band × tolerance
N_QUERIES = 60


def main() -> int:
    from bench import (
        _quiet_empty_block_schema_warnings,
        make_queries,
        wait_clean_window,
    )

    probe = wait_clean_window()
    if probe > 8:
        print(f"INDETERMINATE: no clean CPU window (probe {probe}% loss) — "
              "rerun on an idle machine", flush=True)
        return 2

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    _quiet_empty_block_schema_warnings()
    import numpy as np
    import ray.data
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.min_parallelism = max(NUM_CPUS, 16)

    from wikirec_ray.stages.index_build import build_index
    from wikirec_ray.state.server import RangeShardedQueryEngine

    index_dir = "/tmp/wikirec_ray_cache/check-serve-idx-" + os.path.basename(
        os.path.normpath(SF_DIR)
    )
    os.makedirs(index_dir, exist_ok=True)
    docs = ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(docs, index_dir, resume=True,
                lineage={"input": os.path.join(SF_DIR, "documents.parquet")})

    import bench as _b
    _b.SF_DIR = SF_DIR  # make_queries reads the module global
    queries = make_queries()[:N_QUERIES]
    eng = RangeShardedQueryEngine(index_dir, pool_size=4)
    for _, terms in queries[:4]:
        eng.topk(terms, 10)  # warm shards + resolvers
    lats = []
    for _, terms in queries:
        t0 = time.monotonic()
        eng.topk(terms, 10)
        lats.append(time.monotonic() - t0)
    eng.shutdown()
    ray.shutdown()
    p50 = float(np.percentile(np.array(lats) * 1000, 50))
    limit = BAND_P50_MS * TOLERANCE
    verdict = "OK" if p50 <= limit else "FAIL"
    print(f"{verdict}: serve p50 {p50:.1f} ms (band {BAND_P50_MS} ms, "
          f"limit {limit:.1f} ms, probe {probe}% loss, {len(lats)} queries)",
          flush=True)
    return 0 if p50 <= limit else 1


if __name__ == "__main__":
    sys.exit(main())
