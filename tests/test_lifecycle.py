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
