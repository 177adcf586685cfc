"""Lifecycle measurement for BASELINE.md (run from the repo root): delete_docs + compact_index
at the default bench operating point (100k docs, 32 CPUs, probe-gated)."""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def main() -> None:
    import ray

    probe = bench.wait_clean_window()
    ray.init(address="local", num_cpus=bench.NUM_CPUS,
             include_dashboard=False, logging_level="ERROR")
    bench._quiet_empty_block_schema_warnings()
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.min_parallelism = max(bench.NUM_CPUS, 16)

    from wikirec_ray.pipelines.query import IndexReader
    from wikirec_ray.stages.extract import extract_pages
    from wikirec_ray.stages.index_build import build_index
    from wikirec_ray.stages.lifecycle import compact_index, delete_docs

    pages_dir = bench.build_corpus()
    ray.data.read_parquet(pages_dir).map_batches(
        lambda b: b, batch_format="pyarrow").count()

    index_dir = os.path.join(bench.CACHE_ROOT, "lifecycle-bench")
    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir)

    t0 = time.monotonic()
    pages = ray.data.read_parquet(pages_dir, columns=["url", "html"])
    corpus = extract_pages(pages).map_batches(
        lambda b: b.append_column(
            "doc_id",
            pc.cast(pc.replace_substring_regex(b["url"], r"^.*/", ""), pa.int64()),
        ),
        batch_format="pyarrow",
    )
    manifest = build_index(corpus, index_dir, resume=False,
                           lineage={"input": pages_dir})
    build_sec = time.monotonic() - t0
    n_docs = manifest["stats"]["n_docs"]
    n_parts_before = sum(
        1 for k in manifest["partitions"] if k.startswith("postings/"))

    queries = bench.make_queries()

    def qp50(reader) -> float:
        lats = []
        for _, terms in queries:
            q0 = time.monotonic()
            reader.topk(terms, bench.TOP_K)
            lats.append(time.monotonic() - q0)
        return float(np.percentile(lats, 50) * 1000)

    p50_before = qp50(IndexReader(index_dir))

    scenario = os.environ.get("LIFECYCLE_SCENARIO", "scattered")
    if scenario == "scattered":
        # delete 1% of docs, spread across the id space (touches every
        # range — the adversarial layout for range-bounded compaction)
        del_ids = np.arange(0, n_docs, 100, dtype=np.uint64)
    else:
        # localized: 1% of docs in one contiguous block (one doc range)
        del_ids = np.arange(0, n_docs // 100, dtype=np.uint64)
    t1 = time.monotonic()
    summary = delete_docs(index_dir, del_ids)
    delete_sec = time.monotonic() - t1

    p50_tombstoned = qp50(IndexReader(index_dir))

    t2 = time.monotonic()
    new_manifest = compact_index(index_dir)
    compact_sec = time.monotonic() - t2
    rewritten = sum(
        1 for k, e in new_manifest["partitions"].items()
        if k.startswith(("postings/", "norms/")) and not e.get("skipped", False))
    total = sum(
        1 for k in new_manifest["partitions"]
        if k.startswith(("postings/", "norms/")))

    p50_after = qp50(IndexReader(index_dir))

    print(json.dumps({
        "metric": "lifecycle",
        "cpu_probe_loss_pct": probe,
        "n_docs": int(n_docs),
        "build_sec": round(build_sec, 3),
        "n_deleted": summary["n_matched"],
        "delete_sec": round(delete_sec, 3),
        "compact_sec": round(compact_sec, 3),
        "parts_rewritten": rewritten,
        "parts_total": total,
        "parts_before": n_parts_before,
        "n_docs_after": int(new_manifest["stats"]["n_docs"]),
        "q_p50_ms_before": round(p50_before, 2),
        "q_p50_ms_tombstoned": round(p50_tombstoned, 2),
        "q_p50_ms_compacted": round(p50_after, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
