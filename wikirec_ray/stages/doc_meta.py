"""Document-metadata sidecar: per-doc-range attribute files powering
metadata-FILTERED retrieval and FACET counts (the Elasticsearch
`filter` / `terms aggregation` pair, re-expressed over this engine's
range layout).

The reference engine has no notion of document attributes — its corpus
is one homogeneous dump — but a crawl-scale index is always queried
"within a language / site / source": `lang:en spark join`, "top domains
matching this query".  Both need a doc_id → attribute mapping that is
co-partitioned with the index so shards can filter and count locally.

Layout (``<index_dir>/meta/``)::

    meta/range-<r>.parquet   # (doc_id, <col>...) — attributes cast to
                             #   string, doc_id-sorted, SAME ranges as
                             #   norms
    meta/manifest.json       # own manifest: cols, range_size, per-file
                             #   bytes/md5 + logical input fingerprints

The sidecar is DERIVED state with its own manifest, deliberately outside
the index manifest: ``append_index`` / ``compact_index`` never touch it.
Rebuild it after the corpus changes by re-running ``build_doc_meta`` —
resume is input-aware (per-range logical fingerprint over ids + values),
so an unchanged range skips its write exactly like an index partition.
Stale rows for compacted-away docs are harmless (lookups are driven by
matched ALIVE docs only); a doc the index serves but the sidecar lacks
fails loudly at query time (see ``IndexReader.facet_counts``).

Build shape: one ``groupby(range_id)`` shuffle (the same partitioning
key as the index build and the export sink — one scheme across stages),
one atomic file per range.  Nothing is materialized driver-side except
manifest entries.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from wikirec_ray.state.segments import (
    atomic_write_table,
    load_manifest,
    load_stats,
    partition_is_valid,
    save_manifest,
)

META_MANIFEST_VERSION = 1


def _meta_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "meta")


def build_doc_meta(
    ds: ray.data.Dataset,
    index_dir: str,
    cols: list[str],
    id_col: str = "doc_id",
    resume: bool = True,
    lineage: dict | None = None,
) -> dict:
    """Write the attribute sidecar for an EXISTING index; returns the meta
    manifest.  ``ds`` rows are (id_col, *cols) — attribute columns of any
    castable type, stored as strings (nulls as ``""``; numeric columns
    stay range-filterable via ``attr_matching_codes``'s strict parse);
    every id must be unique.  Ranges follow the
    index's ``doc_range_size`` so serving shards can load exactly their
    ranges' attributes.  On disk the id column is always named ``doc_id``
    regardless of ``id_col`` (readers never need the input's name).

    Resume is input-aware: each range records a logical fingerprint over
    (doc_id, value-hashes); a re-run with identical input skips every
    write, a changed range rewrites only itself."""
    from wikirec_ray.functions.hashing import token_hashes_arrow
    from wikirec_ray.stages.index_build import _logical_fingerprint

    if not cols:
        raise ValueError("build_doc_meta: cols must be non-empty")
    stats = load_stats(index_dir)  # loud FileNotFoundError without an index
    range_size = int(stats.get("doc_range_size", 8192))
    meta_dir = _meta_dir(index_dir)
    os.makedirs(meta_dir, exist_ok=True)
    prior = load_manifest(meta_dir) if resume else None
    if prior is not None and (
        prior.get("version") != META_MANIFEST_VERSION
        or prior.get("cols") != list(cols)
        or prior.get("range_size") != range_size
    ):
        prior = None  # different layout — nothing reusable
    prior_parts = (prior or {}).get("partitions", {})
    t_start = time.monotonic()

    def project(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        out = {"range_id": pa.array((ids // range_size).astype(np.int64)),
               "doc_id": pa.array(ids.astype(np.int64))}
        for c in cols:
            # cast BEFORE fill_null: numeric attribute columns (e.g. an
            # int64 n_chars) have no "" scalar — nulls survive the cast
            # as nulls and then fill as empty strings
            out[c] = pc.cast(b[c].combine_chunks(), pa.string()).fill_null("")
        return pa.table(out)

    def write_range(g: pa.Table) -> pa.Table:
        range_id = int(g["range_id"][0].as_py())
        key = f"range-{range_id:06d}.parquet"
        path = os.path.join(meta_dir, key)
        g = g.sort_by("doc_id")
        ids = g["doc_id"].to_numpy().astype(np.uint64)
        if len(ids) > 1 and (ids[1:] == ids[:-1]).any():
            dup = int(ids[np.flatnonzero(ids[1:] == ids[:-1])[0]])
            raise ValueError(
                f"build_doc_meta: duplicate {id_col} {dup} in range "
                f"{range_id} — attribute rows must be unique per doc"
            )
        streams = [ids] + [
            token_hashes_arrow(g[c].combine_chunks()) for c in cols
        ]
        fp = _logical_fingerprint(*streams)
        pe = prior_parts.get(key)
        if (resume and pe is not None and pe.get("input_fp") == fp
                and partition_is_valid(path, pe)):
            e = dict(pe, key=key, skipped=True)
            return pa.table({"entry": pa.array([json.dumps(e)])})
        entry = atomic_write_table(g.drop_columns(["range_id"]), path)
        entry.update(key=key, kind="meta", range_id=range_id,
                     n_docs=g.num_rows, input_fp=fp, skipped=False)
        return pa.table({"entry": pa.array([json.dumps(entry)])})

    # size the one groupby shuffle to the cluster (the min_parallelism=200
    # default costs ~200 reduce tasks of fixed overhead; same pin as
    # build_index) — restored on exit so callers' sessions are untouched
    import ray as _ray
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev_min_parallelism = ctx.min_parallelism
    try:
        ncpu = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        ctx.min_parallelism = max(ncpu, 16)
    except Exception:
        pass
    try:
        entries = [
            json.loads(r["entry"])
            for r in ds.map_batches(project, batch_format="pyarrow")
            .groupby("range_id")
            .map_groups(write_range, batch_format="pyarrow")
            .take_all()
        ]
    finally:
        ctx.min_parallelism = prev_min_parallelism
    manifest = {
        "version": META_MANIFEST_VERSION,
        "cols": list(cols),
        "range_size": range_size,
        "lineage": lineage or {},
        "wall_s": round(time.monotonic() - t_start, 3),
        "n_docs": sum(e["n_docs"] for e in entries),
        "partitions": {
            e["key"]: {k: v for k, v in e.items() if k != "key"}
            for e in entries
        },
    }
    save_manifest(meta_dir, manifest)
    return manifest


def meta_manifest(index_dir: str) -> dict:
    m = load_manifest(_meta_dir(index_dir))
    if m is None:
        raise FileNotFoundError(
            f"no metadata sidecar under {index_dir}/meta — run "
            f"build_doc_meta(ds, index_dir, cols=[...]) first"
        )
    return m


def _check_col(m: dict, col: str) -> None:
    if col not in m.get("cols", []):
        raise KeyError(
            f"metadata column {col!r} not in the sidecar (has {m['cols']}) "
            f"— rebuild with build_doc_meta(..., cols=[..., {col!r}])"
        )


def _checked_read(path: str, entry: dict, columns: list[str]) -> pa.Table:
    """Read a sidecar file, failing LOUDLY if its on-disk size no longer
    matches the manifest (snapshot) entry — a concurrent ``build_doc_meta``
    rewrote it under a live reader (atomic rename protects a single open(),
    not a read protocol; see the compact_index norms-then-postings
    barrier)."""
    if not os.path.exists(path) or os.path.getsize(path) != entry["bytes"]:
        raise RuntimeError(
            f"{path} no longer matches the metadata manifest snapshot this "
            f"reader was opened on (build_doc_meta re-ran under a live "
            f"reader?) — re-open the reader / rebuild the pool"
        )
    return pq.read_table(path, columns=columns)


def load_meta_column(index_dir: str, col: str, manifest: dict | None = None):
    """(sorted doc_ids uint64, values StringArray) across every
    manifest-listed range — the LOCAL reader shape (O(n_docs), like
    ``load_norms``); serving shards use ``load_meta_range``.  Pass a
    ``manifest`` snapshot to pin all loads of a long-lived reader to one
    coherent sidecar generation (file-size mismatches fail loudly)."""
    m = manifest if manifest is not None else meta_manifest(index_dir)
    _check_col(m, col)
    d = _meta_dir(index_dir)
    tables = [
        _checked_read(os.path.join(d, k), e, ["doc_id", col])
        for k, e in sorted(m["partitions"].items())
    ]
    if not tables:
        return np.empty(0, np.uint64), pa.array([], pa.string())
    t = pa.concat_tables(tables)  # ranges are id-ordered and id-sorted
    return (t["doc_id"].to_numpy().astype(np.uint64),
            t[col].combine_chunks())


def load_meta_range(
    index_dir: str, col: str, range_id: int, manifest: dict | None = None
):
    """One range's (sorted doc_ids uint64, codes int32, values list[str])
    — dictionary-encoded for vectorized equality; None when the range has
    no docs (no sidecar file).  ``manifest`` as in ``load_meta_column``."""
    m = manifest if manifest is not None else meta_manifest(index_dir)
    _check_col(m, col)
    key = f"range-{range_id:06d}.parquet"
    if key not in m["partitions"]:
        return None
    t = _checked_read(
        os.path.join(_meta_dir(index_dir), key), m["partitions"][key],
        ["doc_id", col],
    )
    enc = t[col].combine_chunks().dictionary_encode()
    return (
        t["doc_id"].to_numpy().astype(np.uint64),
        enc.indices.to_numpy().astype(np.int32),
        enc.dictionary.to_pylist(),
    )
