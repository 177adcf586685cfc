"""Deletion (tombstones) + compaction — the index lifecycle legs.

Contracts pinned here (see ``stages/lifecycle.py``):
- a delete is a query-time overlay: deleted docs vanish from EVERY
  retrieval route (exact, WAND, phrase, NEAR, both serving engines, the
  precomputed-bigram fast path) while surviving docs' scores stay
  bit-for-bit frozen (stats/df unchanged until compaction);
- compaction physically purges: results, corpus stats and per-partition
  logical fingerprints all equal a FRESH build over the filtered corpus,
  so ``build_index(resume=True)`` over that corpus skips everything;
- ranges/tparts emptied by a delete drop their files and manifest entries;
- appends compose: tombstones survive an append, re-adding a deleted id
  raises until compaction, then succeeds;
- the CLI exposes both steps.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from wikirec_ray.pipelines.query import IndexReader
from wikirec_ray.schema import DOC_RANGE_SIZE

N_DOCS = 360
ID_STRIDE = 53  # ids span 3 doc ranges (max id 19027 < 3 * 8192)


def _mk_texts(n=N_DOCS):
    vocab = np.array([f"w{i}" for i in range(20)])
    probs = 1.0 / np.arange(1, 21)
    probs /= probs.sum()
    texts = []
    for i in range(n):
        rng = np.random.default_rng(7000 + i)  # per-id rng (memory lesson r4)
        ln = int(rng.integers(6, 60))
        texts.append(" ".join(rng.choice(vocab, size=ln, p=probs)))
    return texts


def _ds(ids, texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )


QUERIES = [
    (["w0", "w3"], None),
    (["w1", "w0"], "phrase"),
    (["w2", "w0", "w5"], "near"),
]


def _route(rd, terms, mode, k):
    if mode == "phrase":
        return rd.phrase_topk(terms, k)
    if mode == "near":
        return rd.near_topk(terms, k, window=4)
    return rd.topk(terms, k)


@pytest.fixture(scope="module")
def lc(ray_session, tmp_path_factory):
    from wikirec_ray.stages.index_build import build_index

    texts = _mk_texts()
    ids = [i * ID_STRIDE for i in range(len(texts))]
    root = tmp_path_factory.mktemp("lifecycle")
    base = str(root / "base")
    build_index(_ds(ids, texts), base, resume=False, store_positions=True)
    base_bg = str(root / "base_bg")
    build_index(_ds(ids, texts), base_bg, resume=False, store_positions=True,
                precompute_bigrams=4)
    deleted = ids[::7]
    return {
        "texts": texts, "ids": ids, "root": root, "base": base,
        "base_bg": base_bg, "deleted": deleted,
    }


def _copy(lc, name, src=None):
    dst = str(lc["root"] / name)
    shutil.copytree(src or lc["base"], dst)
    return dst


def test_delete_summary_union_and_unknown_ids(lc):
    from wikirec_ray.stages.lifecycle import delete_docs

    idx = _copy(lc, "del_summary")
    out = delete_docs(idx, [lc["ids"][0], lc["ids"][7], 999_999])
    assert out == {"n_requested": 3, "n_matched": 2, "n_ignored": 1,
                   "n_tombstones": 2}
    # union with a second delete; re-deleting is a no-op
    out2 = delete_docs(idx, [lc["ids"][7], lc["ids"][14]])
    assert out2["n_tombstones"] == 3 and out2["n_matched"] == 2
    from wikirec_ray.state.segments import load_stats, load_tombstones

    assert load_stats(idx)["n_tombstones"] == 3
    assert sorted(load_tombstones(idx).tolist()) == sorted(
        [lc["ids"][0], lc["ids"][7], lc["ids"][14]]
    )
    # all-unknown delete leaves the manifest untouched
    before = os.path.getmtime(os.path.join(idx, "manifest.json"))
    out3 = delete_docs(idx, [123_456_789])
    assert out3["n_matched"] == 0
    assert os.path.getmtime(os.path.join(idx, "manifest.json")) == before


def test_every_route_excludes_deleted_and_scores_freeze(lc):
    from wikirec_ray.stages.lifecycle import delete_docs

    idx = _copy(lc, "del_routes")
    rd0 = IndexReader(lc["base"])
    dead = set(lc["deleted"])
    delete_docs(idx, lc["deleted"])
    rd = IndexReader(idx)
    for terms, mode in QUERIES:
        # frozen-stats contract: post-delete top-k == pre-delete ranking
        # with the deleted docs struck out (scores identical, not re-fit)
        want = [(d, s) for d, s in _route(rd0, terms, mode, N_DOCS)
                if d not in dead][:10]
        got = _route(rd, terms, mode, 10)
        assert got == want, (terms, mode)
        assert not any(d in dead for d, _ in got)
    # WAND route (forced) matches the exact route under deletion
    terms = QUERIES[0][0]
    assert rd.topk_wand(terms, 10, force_wand=True) == rd.topk(terms, 10)
    # recommend() flows through score_exact → also filtered
    from wikirec_ray.pipelines.query import recommend

    recs = recommend(rd, [["w0", "w3"]], [lc["ids"][1]], n=15)
    assert recs and not any(d in dead for d, _ in recs)


def test_precomputed_bigram_path_excludes_deleted(lc):
    from wikirec_ray.stages.lifecycle import delete_docs

    idx = _copy(lc, "del_bigram", src=lc["base_bg"])
    delete_docs(idx, lc["deleted"])
    rd = IndexReader(idx)
    dead = set(lc["deleted"])
    a, b = sorted(rd.bigrams)[0].split()
    hits = rd.phrase_topk([a, b], 25)  # routes through the composite list
    assert hits and not any(d in dead for d, _ in hits)
    # and equals the positional path under the same tombstones
    idx_pos = _copy(lc, "del_bigram_pos")
    delete_docs(idx_pos, lc["deleted"])
    assert hits == IndexReader(idx_pos).phrase_topk([a, b], 25)


def test_served_engines_match_local_after_delete(lc, ray_session):
    from wikirec_ray.stages.lifecycle import delete_docs
    from wikirec_ray.state.server import (
        DistributedQueryEngine,
        RangeShardedQueryEngine,
    )

    idx = _copy(lc, "del_served", src=lc["base_bg"])
    delete_docs(idx, lc["deleted"])
    rd = IndexReader(idx)
    eng = RangeShardedQueryEngine(idx, pool_size=3)
    term_eng = DistributedQueryEngine(idx, pool_size=3)
    try:
        for terms, mode in QUERIES:
            want = _route(rd, terms, mode, 10)
            if mode == "phrase":
                assert eng.phrase_topk(terms, 10) == want
            elif mode == "near":
                assert eng.near_topk(terms, 10, window=4) == want
            else:
                assert eng.topk(terms, 10) == want
                assert term_eng.topk(terms, 10) == want
        a, b = sorted(rd.bigrams)[0].split()
        assert eng.phrase_topk([a, b], 10) == rd.phrase_topk([a, b], 10)
    finally:
        eng.shutdown()
        term_eng.shutdown()


def test_compact_equals_fresh_build_over_filtered_corpus(lc, tmp_path):
    from wikirec_ray.stages.index_build import build_index
    from wikirec_ray.stages.lifecycle import compact_index, delete_docs

    idx = _copy(lc, "compact_eq")
    delete_docs(idx, lc["deleted"])
    manifest = compact_index(idx)

    dead = set(lc["deleted"])
    kept = [(i, t) for i, t in zip(lc["ids"], lc["texts"]) if i not in dead]
    fresh = str(tmp_path / "fresh")
    m_fresh = build_index(_ds([i for i, _ in kept], [t for _, t in kept]),
                          fresh, resume=False, store_positions=True)

    # stats recomputed to the filtered corpus
    for key in ("n_docs", "total_tokens", "avgdl"):
        assert manifest["stats"][key] == m_fresh["stats"][key]
    assert manifest["stats"]["n_tombstones"] == 0
    assert not os.path.exists(os.path.join(idx, "tombstones.parquet"))

    # identical results on every route (scores now re-fit to the survivors)
    rd_c, rd_f = IndexReader(idx), IndexReader(fresh)
    for terms, mode in QUERIES:
        assert _route(rd_c, terms, mode, 10) == _route(rd_f, terms, mode, 10)

    # logical fingerprints equal a fresh filtered build, partition by
    # partition — the compacted index IS that build
    p_c, p_f = manifest["partitions"], m_fresh["partitions"]
    keys_c = {k for k, v in p_c.items() if v.get("kind") in ("norms", "postings")}
    keys_f = {k for k, v in p_f.items() if v.get("kind") in ("norms", "postings")}
    assert keys_c == keys_f
    for k in sorted(keys_c):
        assert p_c[k]["input_fp"] == p_f[k]["input_fp"], k

    # ...so an input-aware resume over the filtered corpus skips EVERYTHING
    m_resume = build_index(_ds([i for i, _ in kept], [t for _, t in kept]),
                           idx, resume=True, store_positions=True)
    assert all(
        e.get("skipped") for e in m_resume["partitions"].values()
        if e.get("kind") in ("norms", "postings", "segment", "df")
    )


def test_compact_drops_emptied_partitions(lc):
    from wikirec_ray.stages.lifecycle import compact_index, delete_docs

    idx = _copy(lc, "compact_empty")
    range1 = [i for i in lc["ids"]
              if DOC_RANGE_SIZE <= i < 2 * DOC_RANGE_SIZE]
    assert range1
    delete_docs(idx, range1)
    manifest = compact_index(idx)
    assert not os.path.exists(
        os.path.join(idx, "norms", "range-000001.parquet")
    )
    assert not any(
        e.get("range_id") == 1 for e in manifest["partitions"].values()
        if e.get("kind") in ("norms", "postings")
    )
    rd = IndexReader(idx)
    hits = rd.topk(["w0"], N_DOCS)
    assert hits and not any(d in set(range1) for d, _ in hits)
    assert rd.stats["n_docs"] == N_DOCS - len(range1)


def test_compact_noop_without_tombstones(lc):
    from wikirec_ray.stages.lifecycle import compact_index

    idx = _copy(lc, "compact_noop")
    before = json.load(open(os.path.join(idx, "manifest.json")))
    assert compact_index(idx) == before


def test_append_composes_with_delete_and_compact(lc):
    from wikirec_ray.stages.index_build import append_index
    from wikirec_ray.stages.lifecycle import compact_index, delete_docs

    idx = _copy(lc, "del_append")
    victim = lc["ids"][7]
    delete_docs(idx, [victim, lc["ids"][14]])

    # appending NEW docs keeps the tombstones (and their filtering)
    new_ids = [max(lc["ids"]) + 1 + j for j in range(3)]
    append_index(_ds(new_ids, ["w0 w3 w0", "w1 w0 w2", "w5 w0 w9"]), idx)
    rd = IndexReader(idx)
    assert rd.stats["n_tombstones"] == 2
    hits = dict(rd.topk(["w0"], N_DOCS + 3))
    assert victim not in hits and all(n in hits for n in new_ids)

    # re-adding a deleted id is rejected until compaction purges it...
    with pytest.raises(ValueError, match="overlap existing"):
        append_index(_ds([victim], ["w0 w1"]), idx)
    compact_index(idx)
    # ...then succeeds and the doc is live again
    append_index(_ds([victim], ["w0 w1"]), idx)
    rd2 = IndexReader(idx)
    assert victim in dict(rd2.topk(["w0"], N_DOCS + 4))
    assert rd2.stats["n_tombstones"] == 0


def test_heal_build_preserves_tombstones(lc):
    from wikirec_ray.stages.index_build import build_index
    from wikirec_ray.stages.lifecycle import delete_docs

    idx = _copy(lc, "del_heal")
    delete_docs(idx, lc["deleted"])
    # the heal path (resume=True over the full corpus) must not resurrect
    # deleted docs: tombstones are index state, not build input
    m = build_index(_ds(lc["ids"], lc["texts"]), idx, resume=True,
                    store_positions=True)
    assert m["stats"]["n_tombstones"] == len(lc["deleted"])
    assert "tombstones.parquet" in m["partitions"]
    rd = IndexReader(idx)
    assert not any(d in set(lc["deleted"]) for d, _ in rd.topk(["w0"], N_DOCS))
    # a FRESH build (resume=False) resets the overlay
    m2 = build_index(_ds(lc["ids"], lc["texts"]), idx, resume=False,
                     store_positions=True)
    assert m2["stats"]["n_tombstones"] == 0
    assert not os.path.exists(os.path.join(idx, "tombstones.parquet"))


def _run_cli(capsys, argv):
    from wikirec_ray.__main__ import main

    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_cli_delete_compact(lc, capsys):
    run_cli = _run_cli
    idx = _copy(lc, "cli_lifecycle")
    victims = ",".join(str(i) for i in lc["ids"][:2])
    rc, out = run_cli(capsys, ["delete", "--index", idx, "--ids", victims])
    assert rc == 0 and out["n_matched"] == 2
    rc, st = run_cli(capsys, ["stats", "--index", idx])
    assert st["tombstones"] == 2
    rc, out = run_cli(capsys, ["compact", "--index", idx])
    assert rc == 0 and out["n_tombstones"] == 0
    assert out["n_docs"] == N_DOCS - 2
    rc, res = run_cli(capsys, ["query", "--index", idx, "w0", "-k", "5"])
    assert rc == 0 and res["hits"]


# ------------------- crash reconciliation + guards (round-5 review) --------


def test_crashed_delete_reconciles_not_discards(lc):
    """A crash between delete_docs' atomic tombstone write and its manifest
    save leaves the file a NEWER SUPERSET of the manifest.  Every entry
    point must trust the file (it holds acknowledged deletes) instead of
    raising / healing-by-removal, which silently resurrected deleted docs."""
    from wikirec_ray.stages.index_build import build_index
    from wikirec_ray.stages.lifecycle import compact_index, delete_docs
    from wikirec_ray.state.segments import load_tombstones, write_tombstones

    a, b, c = lc["ids"][3], lc["ids"][9], lc["ids"][11]

    idx = _copy(lc, "crashed_delete")
    delete_docs(idx, [a])  # acked
    # simulate the crash: file updated to {a, b}, manifest still says {a}
    write_tombstones(idx, np.array([a, b], np.uint64))

    # (1) a later delete reconciles and unions on top of the file
    out = delete_docs(idx, [c])
    assert out["n_tombstones"] == 3
    assert sorted(load_tombstones(idx).tolist()) == sorted([a, b, c])
    rd = IndexReader(idx)
    assert not any(d in (a, b, c) for d, _ in rd.topk(["w0"], N_DOCS))

    # (2) compaction over the mismatched overlay purges the file's full set
    idx2 = _copy(lc, "crashed_delete_compact")
    delete_docs(idx2, [a])
    write_tombstones(idx2, np.array([a, b], np.uint64))
    m = compact_index(idx2)
    assert m["stats"]["n_docs"] == N_DOCS - 2
    assert not os.path.exists(os.path.join(idx2, "tombstones.parquet"))

    # (3) the resume heal carries the file forward, never removes it
    idx3 = _copy(lc, "crashed_delete_heal")
    delete_docs(idx3, [a])
    write_tombstones(idx3, np.array([a, b], np.uint64))
    m = build_index(_ds(lc["ids"], lc["texts"]), idx3, resume=True,
                    store_positions=True)
    assert m["stats"]["n_tombstones"] == 2
    rd3 = IndexReader(idx3)
    hits = dict(rd3.topk(["w0"], N_DOCS))
    assert a not in hits and b not in hits


def test_stale_overlay_after_crashed_compact_is_cheap_noop(lc):
    """A compact_index crash between its manifest save and its tombstone
    removal leaves a stale file listing already-purged ids.  The next
    compact must self-heal: every touched file hits the unchanged
    short-circuit (no rewrite), stats are unchanged, the file goes away."""
    from wikirec_ray.stages.lifecycle import compact_index, delete_docs
    from wikirec_ray.state.segments import write_tombstones

    idx = _copy(lc, "stale_overlay")
    victims = lc["ids"][:2]
    delete_docs(idx, victims)
    m1 = compact_index(idx)
    mtimes = {
        k: os.stat(os.path.join(idx, k)).st_mtime_ns
        for k in m1["partitions"]
        if m1["partitions"][k]["kind"] in ("norms", "postings")
    }
    # simulate the crash tail: stale overlay reappears, no manifest entry
    write_tombstones(idx, np.array(victims, np.uint64))
    import json as _json
    man = _json.load(open(os.path.join(idx, "manifest.json")))
    man["partitions"].pop("tombstones.parquet", None)
    from wikirec_ray.state.segments import save_manifest
    save_manifest(idx, man)

    m2 = compact_index(idx)
    assert m2["stats"]["n_docs"] == m1["stats"]["n_docs"]
    assert not os.path.exists(os.path.join(idx, "tombstones.parquet"))
    for k, t in mtimes.items():  # nothing was rewritten
        assert os.stat(os.path.join(idx, k)).st_mtime_ns == t


def test_compact_skips_untouched_tparts(lc, ray_session):
    """A delete's rewrite cost is bounded by the deleted docs' OWN
    vocabulary: (tpart, range) files of a touched range that hold none of
    the victim's terms are carried forward unrewritten (and their tpart's
    segment is not re-merged)."""
    import zlib

    from wikirec_ray.stages.index_build import build_index
    from wikirec_ray.stages.lifecycle import compact_index, delete_docs

    root = lc["root"]
    idx = str(root / "narrow_victim")
    ids = list(range(40))
    texts = [("zebra zebra zebra" if i == 17 else
              " ".join(f"w{j}" for j in range(i % 7, i % 7 + 5)))
             for i in ids]
    build_index(_ds(ids, texts), idx, resume=False)
    rd = IndexReader(idx)
    zebra_tpart = zlib.crc32(b"zebra") % rd.n_tparts
    before = json.load(open(os.path.join(idx, "manifest.json")))
    mtimes = {
        k: os.stat(os.path.join(idx, k)).st_mtime_ns
        for k, v in before["partitions"].items() if v["kind"] == "postings"
    }

    delete_docs(idx, [17])
    m = compact_index(idx)
    post = {k: v for k, v in m["partitions"].items()
            if v["kind"] == "postings"}
    changed = {k for k, v in post.items() if not v.get("skipped")}
    # zebra's file was emptied (17 was its only doc) -> removed entirely
    assert all(f"tpart-{zebra_tpart:03d}" in k for k in changed)
    untouched = [k for k in post if f"tpart-{zebra_tpart:03d}" not in k]
    assert untouched, "corpus must exercise the unchanged short-circuit"
    for k in untouched:
        assert post[k].get("skipped") is True
        assert os.stat(os.path.join(idx, k)).st_mtime_ns == mtimes[k]
    # and the results still match a reader over the compacted index
    rd2 = IndexReader(idx)
    assert 17 not in dict(rd2.topk(["zebra"], 40))
    assert len(rd2.topk(["w3"], 40)) > 0


def test_live_reader_fails_loudly_after_inplace_rewrite(lc):
    """IndexReader/RangeServer lazily open files; a compaction under a live
    handle must raise, not silently mix pre-/post-compact state."""
    import zlib

    import ray

    from wikirec_ray.state.server import RangeServer

    idx = _copy(lc, "live_reader_guard")
    rd = IndexReader(idx)
    srv = RangeServer.remote(idx, [0])
    ray.get(srv.topk.remote([], 5))  # force construction BEFORE tampering
    tpart = zlib.crc32(b"w0") % rd.n_tparts
    seg = os.path.join(idx, "segments", f"seg-{tpart:03d}.parquet")
    chunk = os.path.join(idx, "postings", f"tpart-{tpart:03d}",
                         "range-000000.parquet")
    with open(seg, "ab") as f:
        f.write(b"\0")  # simulate an in-place rewrite (size changed)
    os.remove(chunk)  # simulate an emptied-partition removal
    with pytest.raises(RuntimeError, match="re-open the IndexReader"):
        rd.topk(["w0"], 5)
    with pytest.raises(RuntimeError, match="rebuild the pool"):
        ray.get(srv.topk.remote([("w0", tpart, 1.0)], 5))
    # a FRESH reader over an intact copy is unaffected
    rd2 = IndexReader(lc["base"])
    assert rd2.topk(["w0"], 5)


def test_cli_owns_ray_flag_resets(lc, monkeypatch):
    """main() must not shut down a session the CALLER started between two
    invocations: _OWNS_RAY resets after the owned shutdown."""
    import ray

    import wikirec_ray.__main__ as cli

    idx = lc["base"]
    calls = []
    monkeypatch.setattr(ray, "shutdown", lambda: calls.append(1))
    monkeypatch.setattr(cli, "_OWNS_RAY", True)
    assert cli.main(["stats", "--index", idx]) == 0
    assert calls == [1] and cli._OWNS_RAY is False
    assert cli.main(["stats", "--index", idx]) == 0
    assert calls == [1]  # second run owns nothing -> no shutdown
