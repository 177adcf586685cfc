"""Training-corpus export: dedup + quality-filter + RESUMABLE partitioned
Parquet sink.

The reference's terminal stage is "write cleaned corpus to disk"
(``/root/reference/src/wikirec/data_utils.py:489-517`` writes one ndjson per
dump partition and skips files that already exist, :302,457-459).  The
engine's version is the composite a 100 TB training-data pipeline runs:

  documents → fingerprint (vectorized md5)
           → exact-dedup keep flags (one ``groupby(fingerprint)`` shuffle;
             survivor = min doc_id, the D4 rule)
           → flags meet their docs in ONE doc-range shuffle (flag rows and
             doc rows union into the same ``groupby(range_id)`` — no
             driver-side keep set, no second join)
           → per-range quality filter (token count ≥ min_tokens, vectorized)
           → one Parquet file per doc range, written atomically and recorded
             in ``manifest.json`` (bytes + md5) — a re-run with
             ``resume=True`` validates and SKIPS finished ranges, so a
             failed export restarts at partition granularity.

Partitioning note: ``range_id = doc_id // range_size`` is the same key the
index build shuffles on — one partitioning scheme reused across stages, and
every reduce group is bounded by ``range_size`` docs regardless of skew.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import ray.data

from wikirec_ray.stages.analyze import doc_lengths
from wikirec_ray.state.segments import (
    atomic_write_table,
    load_manifest,
    partition_is_valid,
    save_manifest,
)

EXPORT_MANIFEST_VERSION = 1


def export_clean_corpus(
    ds: ray.data.Dataset,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 1,
    range_size: int = 8192,
    resume: bool = True,
    lineage: dict | None = None,
) -> dict:
    """Run the export composite; returns the manifest.  Output rows:
    (doc_id, text, n_tokens), one ``part-<range>.parquet`` per doc range.

    Resume contract: like the reference's file-existence skip
    (data_utils.py:302,457-459), resume assumes the INPUT is unchanged —
    validity is output bytes+md5 vs the manifest (plus min_tokens /
    range_size / format-version match).  Re-exporting different input into
    the same ``out_dir`` requires ``resume=False``; ``read_exported`` only
    serves manifest-listed partitions, so stale files from older layouts
    are never read."""
    from wikirec_ray.pipelines.textstats import _fingerprint_batch

    prior = load_manifest(out_dir) if resume else None
    if prior is not None and prior.get("version") != EXPORT_MANIFEST_VERSION:
        prior = None
    if prior is not None and (
        prior.get("min_tokens") != min_tokens or prior.get("range_size") != range_size
    ):
        prior = None  # different filter/layout — nothing is reusable
    prior_parts = (prior or {}).get("partitions", {})
    t_start = time.monotonic()
    os.makedirs(out_dir, exist_ok=True)

    # keep flags: survivor = min doc_id per fingerprint (exact dedup)
    fps = ds.map_batches(
        lambda b: _fingerprint_batch(b, id_col, text_col), batch_format="pyarrow"
    )

    def keep_rows(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy()
        fp = g["fingerprint"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, fp))
        ids, fp = ids[order], fp[order]
        first = np.ones(len(ids), bool)
        first[1:] = fp[1:] != fp[:-1]
        keep_ids = ids[first]
        return pa.table(
            {
                "range_id": pa.array((keep_ids // range_size).astype(np.int64)),
                id_col: pa.array(keep_ids.astype(np.int64)),
                text_col: pa.array([""] * len(keep_ids), pa.string()),
                "is_doc": pa.array(np.zeros(len(keep_ids), np.int8)),
            }
        )

    # one fingerprint-partition shuffle (fingerprints are uniform by
    # construction, so groups are balanced); emits one row per SURVIVOR
    from wikirec_ray.functions.partitions import partitioned_map_groups

    def fp_key(b: pa.Table) -> np.ndarray:
        return np.frombuffer(
            b"".join(x[:8].encode("ascii") for x in b["fingerprint"].to_pylist()),
            np.uint64,
        )

    flags = partitioned_map_groups(fps, fp_key, keep_rows, n_parts=64)

    def doc_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        return pa.table(
            {
                "range_id": pa.array((ids // range_size).astype(np.int64)),
                id_col: b[id_col],
                text_col: b[text_col],
                "is_doc": pa.array(np.ones(b.num_rows, np.int8)),
            }
        )

    union = ds.map_batches(doc_rows, batch_format="pyarrow").union(
        flags.materialize()
    )

    def write_range(g: pa.Table) -> pa.Table:
        range_id = int(g["range_id"][0].as_py())
        path = os.path.join(out_dir, f"part-{range_id:06d}.parquet")
        key = os.path.relpath(path, out_dir)
        if resume and partition_is_valid(path, prior_parts.get(key)):
            e = dict(prior_parts[key])
            e.update(key=key, skipped=True)
            return pa.table({"entry": pa.array([json.dumps(e)])})
        is_doc = g["is_doc"].to_numpy().astype(bool)
        kept_ids = np.sort(g[id_col].to_numpy()[~is_doc])
        docs = g.filter(pa.array(is_doc)).select([id_col, text_col])
        ids = docs[id_col].to_numpy()
        pos = np.searchsorted(kept_ids, ids)
        pos = np.minimum(pos, max(len(kept_ids) - 1, 0))
        keep = (
            kept_ids[pos] == ids if len(kept_ids) else np.zeros(len(ids), bool)
        )
        docs = docs.filter(pa.array(keep))
        lens = doc_lengths(docs, id_col=id_col, text_col=text_col)
        n_tok = lens["doc_len"].to_numpy()
        docs = docs.append_column("n_tokens", pa.array(n_tok.astype(np.int64)))
        docs = docs.filter(pa.array(n_tok >= min_tokens))
        docs = docs.sort_by(id_col)
        entry = atomic_write_table(docs, path)
        entry.update(
            key=key, kind="corpus", range_id=range_id,
            n_docs=docs.num_rows, skipped=False,
        )
        return pa.table({"entry": pa.array([json.dumps(entry)])})

    entries = [
        json.loads(r["entry"])
        for r in union.groupby("range_id")
        .map_groups(write_range, batch_format="pyarrow")
        .take_all()
    ]
    manifest = {
        "version": EXPORT_MANIFEST_VERSION,
        "lineage": lineage or {},
        "min_tokens": min_tokens,
        "range_size": range_size,
        "wall_s": round(time.monotonic() - t_start, 3),
        "n_docs": sum(e["n_docs"] for e in entries),
        "partitions": {
            e["key"]: {k: v for k, v in e.items() if k != "key"} for e in entries
        },
    }
    save_manifest(out_dir, manifest)
    return manifest


def read_exported(out_dir: str) -> ray.data.Dataset:
    """Read an exported corpus back — partitions come from the MANIFEST,
    never a directory glob: a re-export of a shrunk input leaves stale
    ``part-*`` files on disk that belong to no current partition and must
    not be served (review finding, pinned in
    ``test_export_stale_partition_not_read``)."""
    manifest = load_manifest(out_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest.json under {out_dir}")
    paths = sorted(os.path.join(out_dir, key) for key in manifest["partitions"])
    return ray.data.read_parquet(paths)
