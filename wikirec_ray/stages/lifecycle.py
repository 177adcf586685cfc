"""Index lifecycle beyond ingest: document deletion + compaction.

The reference never deletes (its corpus is one frozen dump;
``/root/reference/src/wikirec/data_utils.py`` only ever adds partition
files) — but a crawl-scale index lives for years and must honor removal
requests without a 100 TB rebuild.  The lifecycle here is the standard
production shape (Lucene's delete-then-merge, re-expressed over this
engine's manifest/segment layout):

``delete_docs``
    writes the doc_ids to ``tombstones.parquet`` (a query-time overlay —
    every retrieval route drops them immediately) and FREEZES corpus
    stats: n_docs, avgdl and df keep counting the deleted docs, so
    surviving docs' BM25 scores are bit-for-bit unchanged by a delete.
    O(ranges touched) work, no posting is rewritten.

``compact_index``
    physically purges the tombstoned postings and recomputes stats.  Only
    the (tpart, doc-range) partitions of RANGES CONTAINING DELETED DOCS
    are decoded, filtered and atomically rewritten (a delete of 0.1 % of
    docs rewrites ~0.1 % of the index, the property that matters at
    100 TB); segments re-merge only for touched tparts, exactly like
    ``append_index``.  Partition fingerprints are recomputed over the
    surviving logical postings, so the compacted index is
    indistinguishable from a fresh build over the filtered corpus:
    ``build_index(resume=True)`` over corpus-minus-deleted skips every
    partition (pytest-pinned).

Composition rules (enforced, each with a loud error):
- append after delete: fine — tombstoned ids are still in the norms
  files until compaction, so ``append_index``'s existing-id overlap check
  already rejects re-adding a deleted id (re-add legitimately AFTER
  compaction).
- crash safety: every rewrite is atomic (tmp + rename) and the manifest
  is saved only at the end; a crashed compaction leaves old/new files
  that fail the manifest md5 check, and heals with
  ``build_index(resume=True)`` like any other torn state — the
  tombstones file survives (the manifest was never saved), so the heal
  preserves pending deletes.
- tombstone overlay reconciliation: the overlay file is written
  atomically and only ever GROWS between compactions, so when it
  mismatches the manifest it is never torn — it is a complete, NEWER
  superset (a ``delete_docs`` crash between the file rename and the
  manifest save) or a stale already-purged set (a ``compact_index``
  crash between its manifest save and its file removal).  Either way
  the FILE is authoritative: every entry point here, plus the
  ``build_index(resume=True)`` heal, trusts a parseable overlay and
  repairs the manifest entry, rather than discarding acknowledged
  deletes.  Only an unreadable overlay (real disk corruption) raises.
- compaction requires exclusive access (Lucene's merge-under-writer-lock
  contract): files are rewritten/removed in place, so readers and
  serving pools constructed BEFORE a compaction must be re-opened after
  it.  Their lazily-opened files are size-checked against the manifest
  snapshot they were constructed on, so a violation fails loudly
  instead of mixing pre- and post-compact state.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from wikirec_ray.state.segments import (
    atomic_write_table,
    load_manifest,
    load_tombstones,
    partition_is_valid,
    save_manifest,
    unpack_i64,
    write_tombstones,
)

TOMBSTONES_KEY = "tombstones.parquet"


def _load_overlay(index_dir: str, op: str) -> np.ndarray:
    """Pending tombstones, trusting the FILE over the manifest (see module
    docstring: a mismatching overlay is a complete superset from a crashed
    delete, or a stale purged set from a crashed compact tail — never torn).
    Raises only when the file exists but is unreadable."""
    try:
        return load_tombstones(index_dir)
    except Exception as exc:
        raise ValueError(
            f"{op}: {TOMBSTONES_KEY} is unreadable (disk corruption?) — "
            f"pending deletes cannot be recovered; remove the file to reset "
            f"the overlay"
        ) from exc


def _save_stats(index_dir: str, stats: dict) -> None:
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)


def delete_docs(index_dir: str, doc_ids) -> dict:
    """Tombstone ``doc_ids``: they stop appearing in every retrieval route
    immediately; postings are purged later by ``compact_index``.  Ids not
    present in the index are ignored (reported in the summary — deleting a
    nonexistent doc is a no-op, like any production delete-by-id).  Corpus
    stats stay frozen, so surviving docs' scores are unchanged (see module
    docstring).  Returns ``{n_requested, n_matched, n_ignored,
    n_tombstones}``.

    Engines load tombstones at construction: readers/serving pools built
    BEFORE a delete keep serving the old snapshot until re-opened — the
    standard immutable-snapshot serving contract."""
    from wikirec_ray.stages.index_build import MANIFEST_VERSION

    manifest = load_manifest(index_dir)
    if manifest is None or manifest.get("version") != MANIFEST_VERSION:
        raise ValueError(
            f"delete_docs needs an existing v{MANIFEST_VERSION} manifest at "
            f"{index_dir}; run build_index first"
        )
    stats = manifest["stats"]
    range_size = int(stats.get("doc_range_size", 8192))
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.uint64))

    prior_entry = manifest["partitions"].get(TOMBSTONES_KEY)
    tomb_path = os.path.join(index_dir, TOMBSTONES_KEY)
    prior = _load_overlay(index_dir, "delete_docs")
    # entry out of step with the file (crashed prior delete/compact, or an
    # entry whose file is gone): repair the manifest even when this call
    # adds nothing new
    reconcile = (
        (prior_entry is None) != (len(prior) == 0)
        or (prior_entry is not None
            and not partition_is_valid(tomb_path, prior_entry))
    )

    # match against the index: only ids with a norms row exist (driver-side
    # read bounded by the RANGES the requested ids touch, never the corpus)
    matched_parts = []
    for r in np.unique(ids // np.uint64(range_size)).tolist():
        p = os.path.join(index_dir, "norms", f"range-{int(r):06d}.parquet")
        if not os.path.exists(p):
            continue
        have = pq.read_table(p, columns=["doc_id"])["doc_id"].to_numpy().astype(np.uint64)
        bounds = np.array([r * range_size, (r + 1) * range_size], np.uint64)
        lo, hi = np.searchsorted(ids, bounds)
        matched_parts.append(ids[lo:hi][np.isin(ids[lo:hi], have, assume_unique=True)])
    matched = (np.concatenate(matched_parts) if matched_parts
               else np.empty(0, np.uint64))

    merged = np.union1d(prior, matched)
    out = {
        "n_requested": int(len(ids)),
        "n_matched": int(len(matched)),
        "n_ignored": int(len(ids) - len(matched)),
        "n_tombstones": int(len(merged)),
    }
    if len(merged) == len(prior) and not reconcile:
        return out  # nothing new — leave manifest untouched
    if len(merged) == 0:  # reconcile-only: entry without any pending delete
        manifest["partitions"].pop(TOMBSTONES_KEY, None)
        if os.path.exists(tomb_path):
            os.remove(tomb_path)
    else:
        entry = write_tombstones(index_dir, merged)
        manifest["partitions"][TOMBSTONES_KEY] = {
            k: v for k, v in entry.items() if k != "key"
        }
    stats["n_tombstones"] = int(len(merged))
    _save_stats(index_dir, stats)
    save_manifest(index_dir, manifest)
    return out


_UNCHANGED = "unchanged"  # sentinel: file holds no tombstoned rows — skip it


def _compact_norms(path: str, tombs: np.ndarray):
    """Filtered norms table + (n_docs, sum_dl); ``None`` table = range
    emptied; ``_UNCHANGED`` = no row tombstoned (leave the file alone)."""
    from wikirec_ray.state.segments import alive_mask

    t = pq.read_table(path)
    ids = t["doc_id"].to_numpy().astype(np.uint64)
    mask = alive_mask(ids, tombs)
    if mask.all():
        return _UNCHANGED, {}
    if not mask.any():
        return None, {"n_docs": 0, "sum_dl": 0}
    kept = t.filter(pa.array(mask))
    dls = kept["doc_len"].to_numpy()
    return kept, {"n_docs": int(kept.num_rows), "sum_dl": int(dls.sum())}


def _compact_postings(
    path: str, norms_path: str, tombs: np.ndarray, store_positions: bool,
):
    """Filtered SEGMENT_SCHEMA table (None = partition emptied,
    ``_UNCHANGED`` table = no posting tombstoned) + the recomputed logical
    input fingerprint + surviving posting count.  The fingerprint uses the
    same record hash as ``make_group_encoder``, so a later
    ``build_index(resume=True)`` over the filtered corpus skips this
    partition.  The doc stream is decoded FIRST and the tf/position streams
    only when a posting is actually deleted: a doc's postings live only in
    the tparts its terms hash to, so for a localized delete most (tpart,
    range) files of a touched range are untouched — skipping their rewrite
    (and their tpart's segment re-merge) keeps a delete's cost proportional
    to the deleted docs' own vocabulary, not to every tpart."""
    from wikirec_ray.functions.compress import (
        decode_restarted,
        gather_segments,
        varint_decode,
    )
    from wikirec_ray.functions.hashing import token_hashes_arrow
    from wikirec_ray.stages.index_build import (
        _encode_terms_table,
        _logical_fingerprint,
        _positions_hash,
    )
    from wikirec_ray.state.segments import alive_mask

    t = pq.read_table(path)
    terms = t["term"].to_pylist()
    starts = np.zeros(len(terms) + 1, np.int64)
    np.cumsum(t["n"].to_numpy(), out=starts[1:])
    n_total = int(starts[-1])
    if n_total == 0:
        return None, "0", 0
    blk_counts = np.concatenate(
        [unpack_i64(b) for b in t["blk_counts"].to_pylist()]
    ).astype(np.int64)
    doc_ids = decode_restarted(b"".join(t["doc_blob"].to_pylist()), blk_counts)
    keep = alive_mask(doc_ids, tombs)
    if keep.all():
        return _UNCHANGED, "", 0
    if not keep.any():
        return None, "0", 0
    tfs = varint_decode(b"".join(t["tf_blob"].to_pylist()), n_total)
    pos = None
    pos_concat = (
        b"".join(t["pos_blob"].to_pylist())
        if "pos_blob" in t.schema.names else b""
    )
    if pos_concat:
        pos = decode_restarted(pos_concat, tfs)
    counts_kept = np.add.reduceat(keep.astype(np.int64), starts[:-1])
    term_alive = counts_kept > 0
    new_terms = [t for t, a in zip(terms, term_alive) if a]
    new_starts = np.zeros(int(term_alive.sum()) + 1, np.int64)
    np.cumsum(counts_kept[term_alive], out=new_starts[1:])
    new_docs, new_tfs = doc_ids[keep], tfs[keep]
    new_pos = None
    if store_positions:
        if pos is None:
            raise ValueError(
                f"compact_index: {path} stores no positions but the index "
                f"stats say store_positions — heal with build_index(resume=True)"
            )
        vstarts = np.zeros(n_total, np.int64)
        np.cumsum(tfs[:-1].astype(np.int64), out=vstarts[1:])
        kidx = np.flatnonzero(keep)
        new_pos, _ = gather_segments(pos, vstarts[kidx], tfs[kidx].astype(np.int64))
    # per-posting doc lengths from the range's norms (alive docs keep their
    # dl — old and new norms files agree, so read order vs the norms task
    # doesn't matter)
    norms = pq.read_table(norms_path)
    n_ids = norms["doc_id"].to_numpy().astype(np.uint64)
    n_order = np.argsort(n_ids)
    new_dls = norms["doc_len"].to_numpy().astype(np.uint64)[n_order][
        np.searchsorted(n_ids[n_order], new_docs)
    ]
    uniq_hashes = token_hashes_arrow(pa.array(new_terms, pa.string()))
    fp_streams = [np.repeat(uniq_hashes, np.diff(new_starts)), new_docs,
                  new_tfs, new_dls]
    if new_pos is not None:
        fp_streams.append(_positions_hash(new_pos, new_tfs))
    fp = _logical_fingerprint(*fp_streams)
    table = _encode_terms_table(new_terms, new_starts, new_docs, new_tfs,
                                new_dls, new_pos)
    return table, fp, int(len(new_docs))


def _compact_item(index_dir: str, item: dict, tombs: np.ndarray,
                  prior_parts: dict, store_positions: bool) -> dict:
    """Rewrite (or remove) ONE partition file; returns its manifest entry
    (``removed=True`` entries are dropped from the manifest driver-side).
    Every input is md5-validated first: a mismatch means torn state from a
    crashed prior append/compact and must heal before compacting on top."""
    key = item["key"]
    path = os.path.join(index_dir, key)
    if not partition_is_valid(path, prior_parts.get(key)):
        raise ValueError(
            f"compact_index: on-disk partition {key} does not match the "
            f"manifest (torn file from a crashed prior run?) — heal with "
            f"build_index(resume=True) over the corpus first"
        )
    if item["kind"] == "norms":
        kept, agg = _compact_norms(path, tombs)
        if isinstance(kept, str):  # _UNCHANGED: carry the prior entry
            return {"key": key, "unchanged": True}
        if kept is None:
            os.remove(path)
            return {"key": key, "removed": True}
        entry = atomic_write_table(kept, path)
        from wikirec_ray.stages.index_build import _logical_fingerprint

        entry.update(
            key=key, kind="norms", range_id=item["range_id"], skipped=False,
            input_fp=_logical_fingerprint(
                kept["doc_id"].to_numpy().astype(np.uint64),
                kept["doc_len"].to_numpy().astype(np.uint64),
            ),
            **agg,
        )
        return entry
    norms_path = os.path.join(
        index_dir, "norms", f"range-{item['range_id']:06d}.parquet"
    )
    table, fp, n_post = _compact_postings(path, norms_path, tombs,
                                          store_positions)
    if isinstance(table, str):  # _UNCHANGED: no tombstoned posting here
        return {"key": key, "unchanged": True}
    if table is None:
        os.remove(path)
        return {"key": key, "removed": True}
    t0 = time.monotonic()
    entry = atomic_write_table(table, path)
    entry.update(
        key=key, kind="postings", tpart=item["tpart"],
        range_id=item["range_id"], n_terms=table.num_rows,
        n_postings=n_post, skipped=False, input_fp=fp,
        encode_ms=round((time.monotonic() - t0) * 1000, 3),
    )
    return entry


def compact_index(index_dir: str) -> dict:
    """Physically purge tombstoned docs and recompute corpus stats; returns
    the new manifest (unchanged when there are no tombstones).

    Work is bounded by the doc ranges containing deletions: only their
    norms + (tpart, range) postings files are decoded/filtered/rewritten
    (in parallel, one Ray task per file), and only the tparts owning a
    rewritten file re-merge their segment — everything else is carried
    forward ``skipped``.  After compaction the index equals a fresh
    ``build_index`` over the filtered corpus at the logical-fingerprint
    level, so a later resume over that corpus skips every partition.
    The frozen ``precompute_bigrams`` pair set is kept (composite postings
    filter like any other term); a full rebuild refreshes the selection."""
    import ray.data

    from wikirec_ray.stages.index_build import (
        MANIFEST_VERSION,
        _entry_table,
        _merge_tpart,
    )

    manifest = load_manifest(index_dir)
    if manifest is None or manifest.get("version") != MANIFEST_VERSION:
        raise ValueError(
            f"compact_index needs an existing v{MANIFEST_VERSION} manifest "
            f"at {index_dir}; run build_index first"
        )
    tomb_path = os.path.join(index_dir, TOMBSTONES_KEY)
    tomb_entry = manifest["partitions"].get(TOMBSTONES_KEY)
    # the FILE is authoritative (see module docstring): a mismatch vs the
    # manifest is a crashed delete (newer superset — compact it) or a
    # crashed compact tail (stale, already-purged ids — every touched file
    # then hits the unchanged short-circuit and this call reduces to
    # removing the stale file); an entry whose file is gone is repaired
    tombs = _load_overlay(index_dir, "compact_index")
    if len(tombs) == 0:
        if tomb_entry is not None:  # repair: entry without pending deletes
            manifest["partitions"].pop(TOMBSTONES_KEY, None)
            manifest["stats"]["n_tombstones"] = 0
            _save_stats(index_dir, manifest["stats"])
            save_manifest(index_dir, manifest)
        if os.path.exists(tomb_path):
            os.remove(tomb_path)
        return manifest  # nothing pending — no-op
    t_start = time.monotonic()
    stats0 = manifest["stats"]
    store_positions = bool(stats0.get("store_positions", False))
    range_size = int(stats0.get("doc_range_size", 8192))
    prior_parts = manifest["partitions"]
    touched_ranges = set(
        int(r) for r in np.unique(tombs // np.uint64(range_size))
    )

    items = [
        {"key": k, "kind": e["kind"], "range_id": int(e["range_id"]),
         "tpart": int(e.get("tpart", -1))}
        for k, e in prior_parts.items()
        if e.get("kind") in ("norms", "postings")
        and int(e.get("range_id", -1)) in touched_ranges
    ]
    import ray as _ray

    tomb_ref = _ray.put(tombs)

    def run_items(batch: pa.Table) -> pa.Table:
        tb = _ray.get(tomb_ref)
        return _entry_table([
            _compact_item(index_dir, json.loads(s), tb, prior_parts,
                          store_positions)
            for s in batch["item"].to_pylist()
        ])

    def _run(phase_items: list[dict]) -> list[dict]:
        if not phase_items:
            return []
        return [
            json.loads(r["entry"])
            for r in ray.data.from_items(
                [{"item": json.dumps(i)} for i in phase_items]
            )
            .map_batches(run_items, batch_format="pyarrow", batch_size=1)
            .take_all()
        ]

    # norms FIRST, postings after the barrier: a postings rewrite reads its
    # range's norms file for per-posting doc lengths, and although old and
    # new norms agree on every alive doc, reading a file that a concurrent
    # norms task is atomically REPLACING can straddle the rename (pyarrow
    # stats then opens) and fail mid-read.  Norms items are few and cheap;
    # the barrier removes the race class outright.  (A fully-emptied
    # range's norms file is removed here, and its postings items never
    # read it — they early-return on an all-deleted keep mask.)
    rewritten = _run([i for i in items if i["kind"] == "norms"])
    rewritten += _run([i for i in items if i["kind"] == "postings"])
    removed_keys = {e["key"] for e in rewritten if e.get("removed")}
    # "unchanged" files (no tombstoned row/posting) fall through to `kept`:
    # prior entry carried forward, no rewrite, no segment re-merge
    new_entries = [
        e for e in rewritten
        if not e.get("removed") and not e.get("unchanged")
    ]
    new_keys = {e["key"] for e in new_entries}
    kept = [
        dict(v, key=k, skipped=True)
        for k, v in prior_parts.items()
        if k not in removed_keys
        and k not in new_keys
        and v.get("kind") in ("norms", "postings")
    ]
    norm_entries = [e for e in new_entries + kept if e["kind"] == "norms"]
    post_entries = [e for e in new_entries + kept if e["kind"] == "postings"]
    n_docs = sum(e["n_docs"] for e in norm_entries)
    total_tokens = sum(e["sum_dl"] for e in norm_entries)

    # re-merge segments for tparts whose postings changed (same shape as
    # append_index); a tpart emptied entirely drops its segment + df files
    changed_tparts = sorted(
        {e["tpart"] for e in new_entries if e["kind"] == "postings"}
        | {
            int(prior_parts[k]["tpart"]) for k in removed_keys
            if prior_parts[k].get("kind") == "postings"
        }
    )
    inputs_by_tpart: dict[int, dict[str, str]] = {t: {} for t in changed_tparts}
    for e in post_entries:
        if e["tpart"] in inputs_by_tpart:
            inputs_by_tpart[e["tpart"]][os.path.basename(e["key"])] = e["md5"]
    live_tparts = [t for t in changed_tparts if inputs_by_tpart[t]]
    empty_tparts = [t for t in changed_tparts if not inputs_by_tpart[t]]
    merge_entries = [
        json.loads(r["entry"])
        for r in ray.data.from_items([{"tpart": t} for t in live_tparts])
        .map_batches(
            lambda b: _entry_table(
                [
                    e
                    for t in b["tpart"].to_pylist()
                    for e in _merge_tpart(
                        index_dir, int(t), prior_parts, True,
                        inputs_by_tpart[int(t)],
                    )
                ]
            ),
            batch_format="pyarrow",
            batch_size=1,
        )
        .take_all()
    ] if live_tparts else []
    for t in empty_tparts:
        for key in (f"segments/seg-{t:03d}.parquet", f"df/df-{t:03d}.parquet"):
            p = os.path.join(index_dir, key)
            if os.path.exists(p):
                os.remove(p)
    kept_meta = [
        dict(v, key=k, skipped=True)
        for k, v in prior_parts.items()
        if (
            v.get("kind") in ("segment", "df")
            and v.get("tpart") not in set(changed_tparts)
        )
        or v.get("kind") == "bigrams"
    ]

    stats = dict(
        stats0,
        n_docs=n_docs,
        total_tokens=total_tokens,
        avgdl=(total_tokens / n_docs) if n_docs else 0.0,
        n_tombstones=0,
    )
    _save_stats(index_dir, stats)
    new_manifest = {
        "version": MANIFEST_VERSION,
        "stats": stats,
        "lineage": dict(manifest.get("lineage") or {}),
        "build_wall_s": round(time.monotonic() - t_start, 3),
        "partitions": {
            e["key"]: {k: v for k, v in e.items() if k != "key"}
            for e in new_entries + kept + merge_entries + kept_meta
        },
    }
    save_manifest(index_dir, new_manifest)
    # remove the tombstone file LAST: a crash anywhere above leaves the old
    # manifest + intact tombstones (rewritten partitions then fail its md5
    # check and heal via build_index(resume=True), deletes preserved); a
    # crash between the save and this removal leaves a stale file that the
    # new manifest no longer lists — filtered as a no-op by readers and
    # cleaned up by the next compact_index call
    os.remove(tomb_path)
    return new_manifest
