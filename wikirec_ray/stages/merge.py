"""Merge independently built indexes into one — the crawl-scale ingest
path.

At 100 TB you do not stream one corpus through one build: each crawl
(or each storage shard) builds its OWN index in its own job, with doc
ids assigned from a disjoint, ``doc_range_size``-aligned id block.
``merge_indexes`` then combines those indexes WITHOUT re-reading any
corpus text:

- postings/norms range files are hardlinked (or copied) verbatim — the
  doc ranges are disjoint, so every input file is already a valid
  partition of the merged index;
- only the per-tpart term merge re-runs (``_merge_tpart``: pure
  concatenation with byte-offset rebasing, one Ray task per tpart, no
  shuffle) to produce the merged segments and df files;
- stats are summed, ``avgdl`` recomputed.

Compare ``append_index`` (same layout, but it re-reads and re-tokenizes
the delta corpus): merge is for inputs that are ALREADY indexes.  Cost
is O(postings bytes in the touched tparts), independent of corpus text
size; the hardlink path never duplicates the range files.

Hardlink safety: index files are immutable — every writer in this
engine (build, append, compaction) replaces files atomically via
``os.replace``, which points the directory entry at a NEW inode, so a
later compaction of the merged index can never mutate the source
index's bytes (and vice versa).  Cross-device links fall back to a
copy.

Partitioning assumption (checked loudly): the inputs' doc-range sets
must be pairwise disjoint.  Two crawls sharing range ``r`` means their
ids interleave inside one 8k block — re-ingest one of them with ids
from a fresh block (``append_index`` handles intra-range mixing; merge
deliberately does not, because that would force a posting re-encode).

The reference engine has no multi-index notion (one in-RAM matrix per
corpus, /root/reference/src/wikirec/model.py); this is the Lucene
``addIndexes``/segment-merge capability re-expressed on the range/tpart
layout.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from wikirec_ray.state.segments import (
    load_bigram_pairs,
    load_manifest,
    load_stats,
    save_manifest,
)

# stats fields that must agree for two indexes to share one layout
_COMPAT_KEYS = (
    "n_term_partitions", "doc_range_size", "block_size",
    "store_positions", "k1", "b",
)


def _link_or_copy(src: str, dst: str) -> None:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def _range_id_of(key: str) -> int:
    # "…/range-000123.parquet" -> 123
    return int(os.path.basename(key)[len("range-"):-len(".parquet")])


def merge_indexes(
    in_dirs: list[str], out_dir: str, merge_meta: bool = True
) -> dict:
    """Merge the indexes at ``in_dirs`` into a fresh index at ``out_dir``;
    returns the merged manifest.  ``out_dir`` must not already hold an
    index.  Inputs must share one layout (``_COMPAT_KEYS``), have disjoint
    doc-range sets, carry no tombstones (compact first — merge is pure
    file reuse and must not silently materialize deletes), and agree on
    the precomputed-bigram pair set (a pair indexed in only SOME inputs
    would serve incomplete phrase results).

    Metadata sidecars merge when EVERY input has one with the same
    columns (``merge_meta=False`` skips them); a mix of with/without
    raises — a merged index silently missing some docs' attributes would
    fail at query time instead of merge time.

    ALL preconditions (including the sidecar ones) are checked before the
    first file is written, so a rejected merge leaves ``out_dir`` exactly
    as it was."""
    t_start = time.monotonic()
    if len(in_dirs) < 2:
        raise ValueError("merge_indexes: need at least two input indexes")
    # out_dir must be absent or empty — NOT merely manifest-less: readers
    # enumerate norms/df/segments with os.listdir, so leftovers from a
    # crashed earlier merge would silently leak into the merged index
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise ValueError(
            f"merge_indexes: {out_dir} already exists and is non-empty — "
            f"remove it (a previous run may have left partial output)"
        )

    from wikirec_ray.stages.index_build import MANIFEST_VERSION, run_tpart_merges

    manifests, stats_list = [], []
    for d in in_dirs:
        m = load_manifest(d)
        if m is None:
            raise FileNotFoundError(f"merge_indexes: no manifest under {d}")
        if m.get("version") != MANIFEST_VERSION:
            raise ValueError(
                f"merge_indexes: {d} has manifest format "
                f"{m.get('version')} != {MANIFEST_VERSION} — rebuild it"
            )
        manifests.append(m)
        stats_list.append(load_stats(d))
    base = stats_list[0]
    for d, s in zip(in_dirs[1:], stats_list[1:]):
        bad = [k for k in _COMPAT_KEYS if s.get(k) != base.get(k)]
        if bad:
            raise ValueError(
                f"merge_indexes: {d} layout differs from {in_dirs[0]} on "
                + ", ".join(f"{k} ({s.get(k)} != {base.get(k)})" for k in bad)
            )
    for d, s in zip(in_dirs, stats_list):
        if s.get("n_tombstones", 0):
            raise ValueError(
                f"merge_indexes: {d} has {s['n_tombstones']} pending "
                f"tombstones — run compact_index first"
            )

    # bigram pair sets must agree exactly (order may differ: df order is
    # per-corpus); the merged index reuses the shared set
    pair_lists = [load_bigram_pairs(d) for d in in_dirs]
    pair_set = set(pair_lists[0])
    for d, pl in zip(in_dirs[1:], pair_lists[1:]):
        if set(pl) != pair_set:
            raise ValueError(
                f"merge_indexes: precomputed-bigram sets differ between "
                f"{in_dirs[0]} and {d} — rebuild with one shared pair set "
                f"(append_index shows the frozen-set pattern)"
            )

    # disjoint doc ranges (from the authoritative norms entries)
    owner_of_range: dict[int, str] = {}
    for d, m in zip(in_dirs, manifests):
        for key in m["partitions"]:
            if key.startswith("norms/"):
                r = _range_id_of(key)
                if r in owner_of_range:
                    raise ValueError(
                        f"merge_indexes: doc range {r} exists in both "
                        f"{owner_of_range[r]} and {d} — inputs must use "
                        f"disjoint doc_range_size-aligned id blocks"
                    )
                owner_of_range[r] = d

    # sidecar preconditions — validated BEFORE anything is written
    metas = _validate_meta_sidecars(in_dirs) if merge_meta else None

    # -- copy (hardlink) the range files; carry their manifest entries ----
    os.makedirs(out_dir, exist_ok=True)
    partitions: dict[str, dict] = {}
    inputs_by_tpart: dict[int, dict[str, str]] = {}
    for d, m in zip(in_dirs, manifests):
        for key, e in m["partitions"].items():
            if not (key.startswith("norms/") or key.startswith("postings/")):
                continue
            src = os.path.join(d, key)
            dst = os.path.join(out_dir, key)
            _link_or_copy(src, dst)
            ne = dict(e, path=dst, skipped=False)
            ne.pop("wall_ms", None)
            partitions[key] = ne
            if key.startswith("postings/"):
                tpart = int(e["tpart"])
                inputs_by_tpart.setdefault(tpart, {})[
                    os.path.basename(key)] = e["md5"]

    # -- re-merge segments + df: one Ray task per tpart, no shuffle -------
    merge_entries = run_tpart_merges(out_dir, inputs_by_tpart, {}, False)
    for e in merge_entries:
        partitions[e["key"]] = {k: v for k, v in e.items() if k != "key"}

    # -- shared bigram set (verified equal above): reuse the first's file --
    if pair_set:
        src = os.path.join(in_dirs[0], "bigrams.parquet")
        dst = os.path.join(out_dir, "bigrams.parquet")
        _link_or_copy(src, dst)
        be = dict(manifests[0]["partitions"]["bigrams.parquet"], path=dst)
        partitions["bigrams.parquet"] = be

    n_docs = sum(s["n_docs"] for s in stats_list)
    total_tokens = sum(s["total_tokens"] for s in stats_list)
    stats = dict(
        base,
        n_docs=n_docs,
        total_tokens=total_tokens,
        avgdl=(total_tokens / n_docs) if n_docs else 0.0,
        n_bigrams=len(pair_set),
        n_tombstones=0,
    )
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)

    manifest = {
        "version": MANIFEST_VERSION,
        "stats": stats,
        "lineage": {"merged_from": [os.path.abspath(d) for d in in_dirs]},
        "build_wall_s": round(time.monotonic() - t_start, 3),
        "partitions": partitions,
    }
    save_manifest(out_dir, manifest)

    if metas is not None:
        _merge_meta_sidecars(in_dirs, out_dir, metas)
    return manifest


def _validate_meta_sidecars(in_dirs: list[str]) -> list[dict] | None:
    """Precondition check for the sidecar merge (run BEFORE any write):
    all-or-none presence and one shared layout.  Returns the loaded meta
    manifests, or None when no input has a sidecar."""
    from wikirec_ray.stages.doc_meta import _meta_dir

    metas = [load_manifest(_meta_dir(d)) for d in in_dirs]
    have = [m is not None for m in metas]
    if not any(have):
        return None
    if not all(have):
        missing = [d for d, h in zip(in_dirs, have) if not h]
        raise ValueError(
            "merge_indexes: some inputs have a metadata sidecar and some "
            f"do not ({missing} lack meta/) — build_doc_meta the missing "
            "ones first, or pass merge_meta=False and rebuild the sidecar "
            "over the merged corpus"
        )
    base = metas[0]
    for d, m in zip(in_dirs[1:], metas[1:]):
        if (m.get("version") != base.get("version")
                or m.get("cols") != base.get("cols")
                or m.get("range_size") != base.get("range_size")):
            raise ValueError(
                f"merge_indexes: metadata sidecar layout differs between "
                f"{in_dirs[0]} and {d} (cols/range_size/version) — rebuild "
                f"with one shared column set"
            )
    return metas


def _merge_meta_sidecars(
    in_dirs: list[str], out_dir: str, metas: list[dict]
) -> None:
    """Merge the (pre-validated) attribute sidecars: disjoint ranges make
    this pure file reuse plus a summed manifest."""
    from wikirec_ray.stages.doc_meta import META_MANIFEST_VERSION, _meta_dir

    base = metas[0]
    out_meta = _meta_dir(out_dir)
    partitions: dict[str, dict] = {}
    for d, m in zip(in_dirs, metas):
        for key, e in m["partitions"].items():
            src = os.path.join(_meta_dir(d), key)
            dst = os.path.join(out_meta, key)
            _link_or_copy(src, dst)
            ne = dict(e, path=dst, skipped=False)
            ne.pop("wall_ms", None)
            partitions[key] = ne
    save_manifest(out_meta, {
        "version": META_MANIFEST_VERSION,
        "cols": list(base["cols"]),
        "range_size": base["range_size"],
        "lineage": {"merged_from": [os.path.abspath(d) for d in in_dirs]},
        "wall_s": 0.0,
        "n_docs": sum(m["n_docs"] for m in metas),
        "partitions": partitions,
    })
