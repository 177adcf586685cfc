"""Index build + BM25 query: rank- and score-identity vs a single-process
NumPy/dict oracle (FIXTURES.md F3/F4), WAND == exact, resume equivalence."""

import json
import math
import os
from collections import Counter

import numpy as np
import pytest

from wikirec_ray.pipelines.query import IndexReader, recommend
from wikirec_ray.schema import BM25_B, BM25_K1

QUERIES = [
    ["spark", "join"],
    ["vector", "window", "hash"],
    ["the"],
    ["absentterm"],
    ["dup", "stream", "slow", "big"],
    ["customer"],
    ["the", "a", "spark"],
    ["key", "value"],
    ["order", "sort", "merge", "part", "scan"],
    ["spark", "absentterm"],
]


@pytest.fixture(scope="module")
def oracle(corpus_tokens):
    docs = corpus_tokens
    N = len(docs)
    dls = {d: len(ws) for d, ws in docs.items()}
    avgdl = sum(dls.values()) / N
    dfc: Counter = Counter()
    tfs = {}
    for d, ws in docs.items():
        c = Counter(ws)
        tfs[d] = c
        for w in c:
            dfc[w] += 1

    def topk(terms, k=10):
        scores = {}
        for d in docs:
            s = 0.0
            for t in terms:
                tf = tfs[d].get(t, 0)
                if not tf:
                    continue
                idf = math.log(1 + (N - dfc[t] + 0.5) / (dfc[t] + 0.5))
                s += idf * tf * (BM25_K1 + 1) / (
                    tf + BM25_K1 * (1 - BM25_B + BM25_B * dls[d] / avgdl)
                )
            if round(s, 9) > 0:
                scores[d] = round(s, 9)
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    return {"topk": topk, "N": N, "avgdl": avgdl, "df": dfc, "dls": dls}


def test_stats_match_oracle(built_index, oracle):
    index_dir, manifest = built_index
    assert manifest["stats"]["n_docs"] == oracle["N"]
    assert abs(manifest["stats"]["avgdl"] - oracle["avgdl"]) < 1e-12


def test_df_matches_oracle(built_index, oracle):
    index_dir, _ = built_index
    reader = IndexReader(index_dir)
    assert reader.df == dict(oracle["df"])


def test_norms_match_oracle(built_index, oracle):
    index_dir, _ = built_index
    reader = IndexReader(index_dir)
    for d, dl in oracle["dls"].items():
        assert reader.norms[d] == dl


def test_postings_sorted_and_complete(built_index, corpus_tokens):
    index_dir, _ = built_index
    reader = IndexReader(index_dir)
    for term in ["spark", "the", "customer"]:
        doc_ids, tfs = reader.postings(term)
        assert np.all(np.diff(doc_ids.astype(np.int64)) > 0)  # strictly sorted
        expect = {d: ws.count(term) for d, ws in corpus_tokens.items() if term in ws}
        assert dict(zip(doc_ids.tolist(), tfs.tolist())) == expect


@pytest.mark.parametrize("k", [1, 3, 10, 50])
def test_topk_rank_and_score_identity(built_index, oracle, k):
    index_dir, _ = built_index
    reader = IndexReader(index_dir)
    for q in QUERIES:
        got = reader.topk(q, k)
        want = oracle["topk"](q, k)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (d1, s1), (d2, s2) in zip(got, want):
            assert abs(s1 - s2) < 1e-9, (q, d1)


@pytest.mark.parametrize("k", [1, 3, 10, 50])
def test_wand_equals_exact(built_index, k):
    index_dir, _ = built_index
    reader = IndexReader(index_dir)
    for q in QUERIES:
        # force_wand pins rank-safety of the WAND algorithm itself (the
        # sf vocab is dense, so the default route would fall back to TAAT)
        assert reader.topk_wand(q, k, force_wand=True) == reader.topk(q, k), q
        # and the planner route must agree too
        assert reader.topk_wand(q, k) == reader.topk(q, k), q


def test_query_dataset_stage(built_index, ray_session):
    import ray.data

    from wikirec_ray.pipelines.query import score_queries_dataset

    index_dir, _ = built_index
    qds = ray.data.from_items(
        [{"query_id": i, "terms": q, "k": 10} for i, q in enumerate(QUERIES)]
    )
    out = score_queries_dataset(qds, index_dir, concurrency=2).take_all()
    reader = IndexReader(index_dir)
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for i, q in enumerate(QUERIES):
        want = reader.topk(q, 10)
        got = sorted(by_q.get(i, []))
        assert [(d) for _, d, _ in got] == [d for d, _ in want], q


def test_recommend_accumulator(built_index, corpus_tokens):
    """Replicates model.py:331-381 semantics: weights = ratings/10, the
    enumerate-index quirk, input exclusion, best-first ordering."""
    index_dir, _ = built_index
    reader = IndexReader(index_dir)
    q0 = sorted(set(corpus_tokens[0]))
    q1 = sorted(set(corpus_tokens[1]))
    s0 = reader.score_exact(q0)
    s1 = reader.score_exact(q1)
    got = recommend(reader, [q0, q1], [0, 1], ratings=[8.0, 4.0], n=10)
    expect = (1 * (0.8 * s0) + 0.4 * s1) / 2.0
    expect[[0, 1]] = -np.inf
    er = np.round(expect, 9)
    want = sorted(np.flatnonzero(er > 0).tolist(), key=lambda d: (-er[d], d))[:10]
    assert [d for d, _ in got] == want
    assert 0 not in [d for d, _ in got] and 1 not in [d for d, _ in got]
    with pytest.raises(ValueError):
        recommend(reader, [q0], [0], ratings=[11.0])


def test_resume_skips_and_is_identical(built_index, ray_session, tmp_path):
    """Kill-free variant of FIXTURES F4.4/F4.5: a second build over the same
    input skips every partition and leaves identical manifests; a build with
    one deleted partition file rebuilds only that partition."""
    import ray.data

    from wikirec_ray.stages.index_build import build_index

    index_dir, manifest1 = built_index
    ds = ray.data.read_parquet(
        os.path.join(os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
                     "documents.parquet"),
        columns=["doc_id", "text"],
    )
    manifest2 = build_index(ds, index_dir, resume=True)
    parts2 = manifest2["partitions"]
    assert all(e.get("skipped") for e in parts2.values() if e["kind"] in ("norms", "postings")), \
        "resume must skip validated partitions"
    for key, e1 in manifest1["partitions"].items():
        assert parts2[key]["md5"] == e1["md5"], key
    # damage one postings partition -> only it (and downstream merge) rebuilds
    victim = next(k for k, e in parts2.items() if e["kind"] == "postings")
    os.remove(os.path.join(index_dir, victim))
    manifest3 = build_index(ds, index_dir, resume=True)
    assert manifest3["partitions"][victim]["skipped"] is False
    assert manifest3["partitions"][victim]["md5"] == parts2[victim]["md5"]
    others = [
        k for k, e in manifest3["partitions"].items()
        if e["kind"] == "postings" and k != victim
    ]
    assert all(manifest3["partitions"][k]["skipped"] for k in others)


def test_empty_and_tiny_docs(ray_session, tmp_path):
    """Zero-token docs must be counted (N, norms with dl=0) but never appear
    in postings or results — the selected-idxs semantics analog
    (data_utils.py:996-1008: filtered docs drop out but identity survives)."""
    import pyarrow as pa
    import ray.data

    from wikirec_ray.pipelines.query import IndexReader
    from wikirec_ray.stages.index_build import build_index

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(["alpha beta", "", "   ", "alpha"], pa.string()),
            }
        )
    )
    d = str(tmp_path / "tiny_idx")
    m = build_index(ds, d, resume=False)
    assert m["stats"]["n_docs"] == 4
    assert m["stats"]["total_tokens"] == 3
    reader = IndexReader(d)
    assert reader.norms[1] == 0 and reader.norms[2] == 0
    hits = reader.topk(["alpha"], 10)
    assert [h[0] for h in hits] == [3, 0]  # doc 3 shorter → higher score
    assert reader.topk_wand(["alpha"], 10) == hits
    assert reader.topk(["beta"], 10)[0][0] == 0


def test_merge_ignores_stale_partition_files(built_index, ray_session, tmp_path):
    """A leftover range file from a previous (larger) run must not leak into
    the merged segments: merge consumes exactly this run's input list."""
    import shutil

    import ray.data

    from wikirec_ray.stages.index_build import build_index

    index_dir, _ = built_index
    src = str(tmp_path / "stale_idx")
    shutil.copytree(index_dir, src)
    # plant a stale file: copy an existing postings partition under a range
    # id this corpus never produced
    tdirs = sorted(os.listdir(os.path.join(src, "postings")))
    tdir = os.path.join(src, "postings", tdirs[0])
    real = sorted(os.listdir(tdir))[0]
    shutil.copy(os.path.join(tdir, real), os.path.join(tdir, "range-999999.parquet"))
    # force the merge for that tpart to actually re-run (otherwise the valid
    # prior segment is skipped and the stale file is never even considered)
    os.remove(os.path.join(src, "segments", f"seg-{tdirs[0].split('-')[1]}.parquet"))
    ds = ray.data.read_parquet(
        os.path.join(os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
                     "documents.parquet"),
        columns=["doc_id", "text"],
    )
    build_index(ds, src, resume=True)
    from wikirec_ray.pipelines.query import IndexReader

    a = IndexReader(index_dir)
    b = IndexReader(src)
    assert a.df == b.df  # stale file would double every df in its tpart
    for q in QUERIES:
        assert a.topk(q, 10) == b.topk(q, 10)


def test_parallelism_invariance(ray_session, oracle, tmp_path):
    """FIXTURES F4.3: identical index content at 2 vs 16 blocks."""
    import ray.data

    from wikirec_ray.stages.index_build import build_index

    sf = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    readers = []
    for nblocks in (2, 16):
        d = str(tmp_path / f"idx{nblocks}")
        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["doc_id", "text"],
            override_num_blocks=nblocks,
        )
        build_index(ds, d, resume=False)
        readers.append(IndexReader(d))
    a, b = readers
    assert a.df == b.df
    for q in QUERIES:
        assert a.topk(q, 10) == b.topk(q, 10)


def test_term_partition_count_invariance(ray_session, tmp_path):
    """Identical df + query results when the index is laid out with 8 vs 32
    term partitions (the layout knob is recorded in the manifest; readers
    pick it up from stats.json)."""
    import ray.data

    from wikirec_ray.stages.index_build import build_index

    sf = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    readers = []
    for ntp in (8, 32):
        d = str(tmp_path / f"tp{ntp}")
        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["doc_id", "text"]
        )
        m = build_index(ds, d, resume=False, n_term_partitions=ntp)
        assert m["stats"]["n_term_partitions"] == ntp
        readers.append(IndexReader(d))
    a, b = readers
    assert a.n_tparts == 8 and b.n_tparts == 32
    assert a.df == b.df
    for q in QUERIES:
        assert a.topk(q, 10) == b.topk(q, 10)
        assert a.topk_wand(q, 10) == b.topk(q, 10)


def test_resume_refuses_partition_count_change(ray_session, tmp_path):
    """Resuming with a different n_term_partitions must rebuild everything
    (no partition may be reused across layouts)."""
    import ray.data

    from wikirec_ray.stages.index_build import build_index

    sf = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = str(tmp_path / "idx")
    ds = ray.data.read_parquet(
        os.path.join(sf, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(ds, d, resume=False, n_term_partitions=8)
    m2 = build_index(ds, d, resume=True, n_term_partitions=16)
    assert all(not v.get("skipped") for v in m2["partitions"].values())
    m3 = build_index(ds, d, resume=True, n_term_partitions=16)
    assert any(v.get("skipped") for v in m3["partitions"].values())


def test_vectorized_merge_equals_row_merge():
    """_merge_range_tables must byte-match the straightforward per-row
    accumulation merge (the round-1 implementation, kept here as oracle)."""
    import pyarrow as pa

    from wikirec_ray.stages.index_build import _encode_terms_table, _merge_range_tables
    from wikirec_ray.state.segments import SEGMENT_SCHEMA, pack_i64, unpack_i64

    rng = np.random.default_rng(5)

    def chunk(term_docs: dict[str, list[int]]) -> pa.Table:
        terms = sorted(term_docs)
        doc_ids, tfs, dls, starts = [], [], [], [0]
        for t in terms:
            ds = sorted(term_docs[t])
            doc_ids += ds
            tfs += list(rng.integers(1, 9, len(ds)))
            dls += list(rng.integers(10, 99, len(ds)))
            starts.append(len(doc_ids))
        return _encode_terms_table(
            terms,
            np.array(starts, np.int64),
            np.array(doc_ids, np.uint64),
            np.array(tfs, np.uint64),
            np.array(dls, np.uint64),
        )

    # range 0: docs < 300 (incl. a 300-posting term that spans >2 blocks),
    # range 1: docs >= 1000; some terms in both, some in only one
    c0 = chunk({"alpha": list(range(0, 300)), "beta": [5, 9], "only0": [7]})
    c1 = chunk({"alpha": list(range(1000, 1170)), "beta": [1001], "only1": [1005]})

    def row_merge(tables):  # round-1 algorithm
        acc = {}
        for t in tables:
            for row in t.to_pylist():
                a = acc.get(row["term"])
                if a is None:
                    acc[row["term"]] = {k: row[k] for k in SEGMENT_SCHEMA.names}
                else:
                    a["n"] += row["n"]
                    a["blk_last"] += row["blk_last"]
                    a["blk_counts"] += row["blk_counts"]
                    a["blk_doc_off"] += pack_i64(
                        unpack_i64(row["blk_doc_off"])[1:] + len(a["doc_blob"])
                    )
                    a["blk_tf_off"] += pack_i64(
                        unpack_i64(row["blk_tf_off"])[1:] + len(a["tf_blob"])
                    )
                    a["doc_blob"] += row["doc_blob"]
                    a["tf_blob"] += row["tf_blob"]
                    a["blk_maxtf"] += row["blk_maxtf"]
                    a["blk_mindl"] += row["blk_mindl"]
                    a["term_maxtf"] = max(a["term_maxtf"], row["term_maxtf"])
                    a["term_mindl"] = min(a["term_mindl"], row["term_mindl"])
        terms = sorted(acc)
        return pa.table(
            {name: [acc[t][name] for t in terms] for name in SEGMENT_SCHEMA.names},
            schema=SEGMENT_SCHEMA,
        )

    want = row_merge([c0, c1])
    got = _merge_range_tables([c0, c1])
    assert got.schema.equals(want.schema)
    assert got.num_rows == want.num_rows
    for name in SEGMENT_SCHEMA.names:
        assert got[name].to_pylist() == want[name].to_pylist(), name


def test_similar_docs_topk_replaces_sim_matrix(ray_session, tmp_path):
    """similar_docs_topk == per-doc IndexReader.topk(distinct tokens) minus
    self — the O(N·k) streaming replacement for the reference's dense
    N×N similarity matrix (model.py:258-290, 340-383)."""
    import re

    import pyarrow as pa
    import ray.data

    from wikirec_ray.pipelines.query import IndexReader, similar_docs_topk
    from wikirec_ray.stages.index_build import build_index

    docs = [
        (0, "spark join window hash merge sort spark join"),
        (1, "spark join window hash merge sort filter scan"),
        (2, "customer order line part value vector"),
        (3, "customer order line part value spark"),
        (4, "the a big small fast slow"),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    )
    idx = str(tmp_path / "simidx")
    build_index(ds, idx, resume=False)
    k = 3
    out = similar_docs_topk(ds, idx, k=k).take_all()
    got: dict = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    reader = IndexReader(idx)
    for doc_id, text in docs:
        terms = sorted(set(w for w in re.split(r"[^a-z0-9]+", text.lower()) if w))
        want = [
            (d, round(s, 6)) for d, s in reader.topk(terms, k + 1) if d != doc_id
        ][:k]
        rows = sorted(got.get(doc_id, []))
        assert [(d, s) for _, d, s in rows] == want, doc_id
        assert [r for r, _, _ in rows] == list(range(1, len(want) + 1))


def test_resume_is_input_aware_incremental(ray_session, tmp_path):
    """Manifest v5 logical input fingerprints: resume must (a) skip
    everything when the input is unchanged, (b) REBUILD partitions whose
    input changed (a stale skip would silently drop appended docs — the
    pre-r4 behavior), (c) re-encode ONLY the touched doc ranges on a
    new-range append (merges re-concatenate, old ranges skip), and
    (d) still skip when the SAME corpus arrives with different block
    boundaries (the real crawl-append read layout — v4's run-blob
    fingerprints rebuilt everything here)."""
    import pyarrow as pa
    import ray.data

    from wikirec_ray.pipelines.query import IndexReader
    from wikirec_ray.schema import DOC_RANGE_SIZE
    from wikirec_ray.stages.index_build import build_index

    def mk(ranges):
        ids = [i for lo, hi in ranges for i in range(lo, hi)]
        txt = [f"alpha beta w{i % 97} gamma{i % 13}" for i in ids]
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(txt, pa.string())})
        )

    idx = str(tmp_path / "incr")
    build_index(mk([(0, 400)]), idx, resume=False)

    # (a) unchanged input -> zero rebuilds
    m_same = build_index(mk([(0, 400)]), idx, resume=True)
    assert all(e.get("skipped") for e in m_same["partitions"].values())

    # (b) in-range append (same doc range, new docs) -> affected partitions
    # rebuild and queries match a fresh build
    m_app = build_index(mk([(0, 600)]), idx, resume=True)
    reb = [k for k, e in m_app["partitions"].items() if not e.get("skipped", True)]
    assert any(k.startswith("postings/") for k in reb)
    full = str(tmp_path / "full")
    build_index(mk([(0, 600)]), full, resume=False)
    rd, rd_full = IndexReader(idx), IndexReader(full)
    for q in (["alpha"], ["w5"], ["gamma7", "w3"]):
        assert rd.topk(q, 10) == rd_full.topk(q, 10)

    # (c) new-range append -> every old-range partition skips; only the new
    # range encodes (merge/df re-concatenation is expected and cheap)
    base = DOC_RANGE_SIZE
    m_new = build_index(mk([(0, 600), (base, base + 300)]), idx, resume=True)
    parts = m_new["partitions"]
    old_range = [k for k, e in parts.items()
                 if e["kind"] in ("norms", "postings") and "range-000000" in k]
    assert old_range and all(parts[k]["skipped"] for k in old_range)
    new_range = [k for k, e in parts.items()
                 if e["kind"] in ("norms", "postings") and "range-000001" in k]
    assert new_range and all(not parts[k]["skipped"] for k in new_range)
    full2 = str(tmp_path / "full2")
    build_index(mk([(0, 600), (base, base + 300)]), full2, resume=False)
    rd2, rd_full2 = IndexReader(idx), IndexReader(full2)
    for q in (["alpha"], ["w5"], ["gamma12"]):
        assert rd2.topk(q, 10) == rd_full2.topk(q, 10)

    # (d) identical corpus, different input blocking -> map batches (and so
    # the shuffle's partial runs) split differently, yet every partition
    # must still skip: the fingerprint is over decoded postings, not runs
    m_reblk = build_index(
        mk([(0, 600), (base, base + 300)]).repartition(7), idx, resume=True
    )
    assert all(e.get("skipped") for e in m_reblk["partitions"].values())


def test_append_index_delta_only(ray_session, tmp_path):
    """append_index streams ONLY the delta corpus yet must be
    indistinguishable from a full rebuild over base+delta: (1) identical
    exact AND WAND topk plus stats, (2) merged partitions carry the same
    logical fingerprints a full build records, so a subsequent full-corpus
    resume skips EVERYTHING (appends and resumes compose), (3) overlapping
    doc ids raise (append-only contract), and (4) after such a failed
    append the next resume build heals the index back to correctness."""
    import pytest
    import pyarrow as pa
    import ray
    import ray.data

    from wikirec_ray.pipelines.query import IndexReader
    from wikirec_ray.schema import DOC_RANGE_SIZE
    from wikirec_ray.stages.index_build import append_index, build_index

    def mk(ranges):
        ids = [i for lo, hi in ranges for i in range(lo, hi)]
        txt = [f"alpha beta w{i % 97} gamma{i % 13}" for i in ids]
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(txt, pa.string())})
        )

    idx = str(tmp_path / "appendable")
    build_index(mk([(0, 500)]), idx, resume=False)

    # delta straddles: tail of range 0 (in-place partition merge) + a brand
    # new doc range (plain encode)
    base = DOC_RANGE_SIZE
    full_ranges = [(0, 700), (base, base + 200)]
    m = append_index(mk([(500, 700), (base, base + 200)]), idx)
    rewritten = [k for k, e in m["partitions"].items() if not e.get("skipped", True)]
    assert any("range-000000" in k for k in rewritten)  # merged boundary range
    assert any("range-000001" in k for k in rewritten)  # new range encoded

    full = str(tmp_path / "appendable_full")
    build_index(mk(full_ranges), full, resume=False)
    rd, rdf = IndexReader(idx), IndexReader(full)
    for q in (["alpha"], ["w5"], (["gamma7", "w3"]), ["w13", "alpha"]):
        assert rd.topk(q, 10) == rdf.topk(q, 10)
        assert rd.topk_wand(q, 10) == rdf.topk_wand(q, 10)
    from wikirec_ray.state.segments import load_stats

    assert load_stats(idx) == load_stats(full)

    # (2) a full-corpus resume over the appended index skips every partition
    m2 = build_index(mk(full_ranges), idx, resume=True)
    assert all(e.get("skipped") for e in m2["partitions"].values())

    # (3) + (4) overlapping ids fail loudly; a resume build then heals any
    # partially rewritten partitions
    with pytest.raises((ray.exceptions.RayTaskError, ValueError)):
        append_index(mk([(600, 650)]), idx)
    build_index(mk(full_ranges), idx, resume=True)
    rd3 = IndexReader(idx)
    for q in (["alpha"], ["w5"]):
        assert rd3.topk(q, 10) == rdf.topk(q, 10)


def test_append_index_refuses_torn_or_duplicate_input(ray_session, tmp_path):
    """append_index safety rails: (1) an on-disk partition that diverges
    from the manifest (torn file from a crashed prior append) must abort the
    append instead of being silently merged into a new, fully 'valid'
    manifest; (2) duplicate doc_ids WITHIN the delta (a repeated crawl
    record) must abort even when the duplicated doc would pass the
    delta-vs-index overlap check; a resume build heals both."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    import ray
    import ray.data

    from wikirec_ray.pipelines.query import IndexReader
    from wikirec_ray.stages.index_build import append_index, build_index

    def mk(ids, texts=None):
        txt = texts or [f"alpha beta w{i % 97}" for i in ids]
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(txt, pa.string())})
        )

    idx = str(tmp_path / "torn")
    build_index(mk(list(range(300))), idx, resume=False)

    # (1) simulate a crashed prior append: rewrite one norms range on disk
    # (valid parquet, extra doc) without touching the manifest
    npath = os.path.join(idx, "norms", "range-000000.parquet")
    old = pq.read_table(npath)
    torn = pa.table({
        "doc_id": pa.concat_arrays(
            [old["doc_id"].combine_chunks(), pa.array([900], pa.int64())]),
        "doc_len": pa.concat_arrays(
            [old["doc_len"].combine_chunks(), pa.array([3], pa.int64())]),
    })
    pq.write_table(torn, npath)
    with pytest.raises((ray.exceptions.RayTaskError, ValueError),
                       match="does not match the manifest"):
        append_index(mk([300, 301]), idx)
    # heal, then the same append succeeds
    build_index(mk(list(range(300))), idx, resume=True)
    append_index(mk([300, 301]), idx)

    # (2) duplicate doc_id inside the delta, split across batches so each
    # batch-local view is clean
    dup = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([500], pa.int64()),
                  "text": pa.array(["alpha dup"], pa.string())})
    ).union(ray.data.from_arrow(
        pa.table({"doc_id": pa.array([500, 501], pa.int64()),
                  "text": pa.array(["alpha dup again", "beta ok"], pa.string())})
    ))
    with pytest.raises((ray.exceptions.RayTaskError, ValueError),
                       match="WITHIN the delta"):
        append_index(dup, idx)
    m = build_index(mk(list(range(302))), idx, resume=True)
    assert sum(1 for e in m["partitions"].values()
               if e["kind"] == "norms") >= 1
    full = str(tmp_path / "torn_full")
    build_index(mk(list(range(302))), full, resume=False)
    assert IndexReader(idx).topk(["alpha"], 10) == IndexReader(full).topk(["alpha"], 10)


def _brute_filtered_bm25(toks, terms, k, match_fn):
    """Shared brute oracle for the positional filter retrievals: docs
    passing ``match_fn(token_list)`` scored with plain multi-term BM25
    (duplicate terms double-count, like topk), engine ranking contract."""
    n = len(toks)
    df = Counter(t for tl in toks for t in set(tl))
    avgdl = sum(len(t) for t in toks) / n
    out = []
    for i, tl in enumerate(toks):
        if not match_fn(tl):
            continue
        s = 0.0
        for t in terms:
            tf = tl.count(t)
            if tf:
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * tf * (BM25_K1 + 1.0) / (
                    tf + BM25_K1 * (1 - BM25_B + BM25_B * len(tl) / avgdl)
                )
        out.append((i, round(s, 9)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def test_positional_index_phrase_topk(ray_session, tmp_path):
    """Positional postings (store_positions=True) + exact phrase retrieval.

    (1) phrase_topk matches a brute-force Python oracle (adjacency over the
    tokenized text, BM25 scoring identical to topk) on 1/2/3-term phrases,
    a repeated-term phrase, and an absent term; (2) a single-term phrase
    equals plain topk; (3) SegmentReader.positions round-trips the exact
    token offsets; (4) the positional layout is invariant to input blocking
    (parallelism invariance — exercises the pos-offset rebase in the merge);
    (5) BM25 topk over a positional index equals the non-positional index's
    (positions are additive); (6) a non-positional index refuses phrase
    queries loudly."""
    import math

    import pyarrow as pa
    import ray.data

    from wikirec_ray.stages.index_build import build_index

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    ids = list(range(500))
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(4, 50)))) for _ in ids]

    def mk(parallelism=None):
        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())})
        )
        return ds.repartition(parallelism) if parallelism else ds

    idx = str(tmp_path / "pos")
    build_index(mk(), idx, resume=False, store_positions=True)
    rd = IndexReader(idx)

    toks = [t.split() for t in texts]

    def brute(phr, k):
        return _brute_filtered_bm25(
            toks, phr, k,
            lambda tl: any(tl[j : j + len(phr)] == phr
                           for j in range(len(tl) - len(phr) + 1)),
        )

    for phr in (["w1", "w2"], ["w3"], ["w5", "w5"], ["w0", "w1", "w2"],
                ["w7", "w29"], ["absent", "w1"]):
        got = rd.phrase_topk(phr, 10)
        want = brute(phr, 10)
        assert [(d, round(s, 6)) for d, s in got] == \
               [(d, round(s, 6)) for d, s in want], phr

    # single-term phrase == plain topk
    assert rd.phrase_topk(["w4"], 10) == rd.topk(["w4"], 10)
    assert rd.phrase_topk([], 10) == []

    # positions round-trip for one doc
    d, tf, p = rd.term_segment("w1").positions("w1")
    docs = d.astype(np.int64)
    target = int(docs[0])
    st = 0
    exp = [j for j, t in enumerate(toks[target]) if t == "w1"]
    assert p[st : st + int(tf[0])].tolist() == exp

    # parallelism invariance of the positional files
    idx2 = str(tmp_path / "pos2")
    build_index(mk(parallelism=13), idx2, resume=False, store_positions=True)
    rd2 = IndexReader(idx2)
    for phr in (["w1", "w2"], ["w0", "w1", "w2"]):
        assert rd2.phrase_topk(phr, 10) == rd.phrase_topk(phr, 10)

    # BM25 unaffected by positions
    idx0 = str(tmp_path / "nopos")
    build_index(mk(), idx0, resume=False, store_positions=False)
    rd0 = IndexReader(idx0)
    for q in (["w1"], ["w2", "w9"], ["w0", "w5", "w7"]):
        assert rd.topk(q, 10) == rd0.topk(q, 10)
        assert rd.topk_wand(q, 10) == rd0.topk_wand(q, 10)

    # non-positional index refuses phrase queries
    with pytest.raises(ValueError, match="store_positions"):
        rd0.phrase_topk(["w1", "w2"], 10)

    # resume across a store_positions flip rebuilds everything
    m_flip = build_index(mk(), idx0, resume=True, store_positions=True)
    assert all(not e.get("skipped", True)
               for e in m_flip["partitions"].values())
    assert IndexReader(idx0).phrase_topk(["w1", "w2"], 10) == \
        rd.phrase_topk(["w1", "w2"], 10)

    # block-selective decode (positions_select over blk_pos_off) must equal
    # slicing the full stream, via a fresh reader whose positions cache is
    # cold (the >2-block term 'w1' exercises multi-block skip)
    from wikirec_ray.functions.compress import gather_segments

    seg = IndexReader(idx).term_segment("w1")
    d, tf, pos_all = IndexReader(idx).term_segment("w1").positions("w1")
    starts = np.zeros(len(tf) + 1, np.int64)
    np.cumsum(tf.astype(np.int64), out=starts[1:])
    for sel in (np.array([0], np.int64),
                np.arange(0, len(d), 7, dtype=np.int64),
                np.arange(len(d), dtype=np.int64)):
        want, wb = gather_segments(pos_all, starts[sel], tf[sel].astype(np.int64))
        got, gb = seg.positions_select("w1", sel)
        assert got.tolist() == want.tolist() and gb.tolist() == wb.tolist()


def test_positions_select_sparse_block_skip(ray_session, tmp_path):
    """The SPARSE branch of positions_select (blk_pos_off block-skip
    decode) — requires a term with enough blocks that a small selection
    stays under the ¼-density gate, which no other test corpus reaches:
    'common' here has 3000 postings ≈ 24 blocks, and selections of ≤5
    postings touch ≤5 blocks (4·5 < 24 → sparse path).  Asserts the branch
    equals full-stream slicing on fresh (cache-cold) readers and that a
    rare-anchored phrase through it matches a brute-force text scan."""
    import pyarrow as pa
    import ray.data

    from wikirec_ray.functions.compress import gather_segments
    from wikirec_ray.schema import BLOCK_SIZE
    from wikirec_ray.stages.index_build import build_index

    rng = np.random.default_rng(31)
    n = 3000
    rare_docs = {17, 1804, 2999}
    texts = []
    for i in range(n):
        body = " ".join(rng.choice(["x1", "x2", "x3"], size=6))
        if i in rare_docs:
            texts.append(f"{body} rare common {body}")
        else:
            texts.append(f"{body} common {body}")
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(list(range(n)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    idx = str(tmp_path / "sparse_pos")
    build_index(ds, idx, resume=False, store_positions=True)

    seg_full = IndexReader(idx).term_segment("common")
    d, tf, pos_all = seg_full.positions("common")
    assert len(d) == n and len(d) > 4 * BLOCK_SIZE  # >= 5 blocks guaranteed
    tf_starts = np.zeros(len(tf) + 1, np.int64)
    np.cumsum(tf.astype(np.int64), out=tf_starts[1:])
    for sel in (np.array([0], np.int64),
                np.array([0, len(d) - 1], np.int64),
                np.array([17, 1804, 2999], np.int64),
                np.array([500, 501, 502], np.int64)):
        want, wb = gather_segments(pos_all, tf_starts[sel], tf[sel].astype(np.int64))
        # fresh reader per selection: positions cache cold → sparse branch
        got, gb = IndexReader(idx).term_segment("common").positions_select(
            "common", sel
        )
        assert got.tolist() == want.tolist() and gb.tolist() == wb.tolist(), sel

    # end-to-end: rare-anchored phrase routes 'common' through the sparse
    # branch (3 candidate docs → ≤3 touched blocks of 24)
    hits = IndexReader(idx).phrase_topk(["rare", "common"], 10)
    assert sorted(doc for doc, _ in hits) == sorted(rare_docs)
    toks0 = texts[17].split()
    assert ["rare", "common"] == toks0[toks0.index("rare"):toks0.index("rare") + 2]


def test_near_topk_proximity(ray_session, tmp_path):
    """near_topk == brute force: docs where every query term occurs within
    `window` tokens of an occurrence of the ANCHOR (least-frequent term,
    lexicographic tie-break), scored as plain multi-term BM25 with the
    standard ranking contract.  Covers window=0 and window larger than any
    doc (degrades to pure AND), plus equality with phrase-free topk
    restricted to the AND set."""
    import math

    import pyarrow as pa
    import ray.data

    from wikirec_ray.stages.index_build import build_index

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(25)]
    ids = list(range(400))
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(4, 60))))
             for _ in ids]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    idx = str(tmp_path / "near")
    build_index(ds, idx, resume=False, store_positions=True)
    rd = IndexReader(idx)

    toks = [t.split() for t in texts]
    df = Counter(t for tl in toks for t in set(tl))

    def brute(terms, k, window):
        anchor = min(set(terms), key=lambda t: (df.get(t, 0), t))

        def near_match(tl):
            occ = {t: [j for j, x in enumerate(tl) if x == t]
                   for t in set(terms)}
            if any(not occ[t] for t in set(terms)):
                return False
            return any(
                all(any(abs(q - p) <= window for q in occ[t])
                    for t in set(terms))
                for p in occ[anchor]
            )

        return _brute_filtered_bm25(toks, terms, k, near_match)

    for terms, w in ((["w1", "w2"], 3), (["w3", "w7", "w9"], 5),
                     (["w0", "w1"], 0), (["w2", "w4"], 1000),
                     (["w5", "w5"], 2), (["absent", "w1"], 4)):
        got = rd.near_topk(terms, 10, window=w)
        want = brute(terms, 10, w)
        assert [(d, round(s, 6)) for d, s in got] == \
               [(d, round(s, 6)) for d, s in want], (terms, w)

    # huge window == conjunctive AND: every doc containing all terms
    and_docs = {i for i, tl in enumerate(toks)
                if "w2" in tl and "w4" in tl}
    got_big = rd.near_topk(["w2", "w4"], 10_000, window=1000)
    assert {d for d, _ in got_big} == and_docs
    assert rd.near_topk([], 10) == []


def test_append_index_positional(ray_session, tmp_path):
    """append_index on a POSITIONAL index: the delta's positions merge into
    the on-disk partitions, phrase results equal a full positional rebuild,
    and the merged fingerprints let a subsequent full-corpus resume skip
    everything (appends and resumes compose for positional layouts too)."""
    import pyarrow as pa
    import ray.data

    from wikirec_ray.schema import DOC_RANGE_SIZE
    from wikirec_ray.stages.index_build import append_index, build_index

    vocab = [f"w{i}" for i in range(20)]

    def texts_for(ids):
        out = []
        for i in ids:
            r = np.random.default_rng(1000 + i)  # per-doc, call-order-free
            out.append(" ".join(r.choice(vocab, size=int(r.integers(6, 40)))))
        return out

    def mk(ids):
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts_for(ids), pa.string())})
        )

    idx = str(tmp_path / "pos_app")
    base_ids = list(range(400))
    build_index(mk(base_ids), idx, resume=False, store_positions=True)
    # delta straddles the boundary range and a brand-new range
    extra_ids = list(range(400, 520)) + list(range(DOC_RANGE_SIZE,
                                                   DOC_RANGE_SIZE + 80))
    append_index(mk(extra_ids), idx)

    full = str(tmp_path / "pos_app_full")
    build_index(mk(base_ids + extra_ids), full, resume=False,
                store_positions=True)
    rd, rdf = IndexReader(idx), IndexReader(full)
    for phr in (["w1", "w2"], ["w3"], ["w0", "w1", "w2"], ["w5", "w5"]):
        assert rd.phrase_topk(phr, 10) == rdf.phrase_topk(phr, 10), phr
    for q in (["w1"], ["w2", "w9"]):
        assert rd.topk(q, 10) == rdf.topk(q, 10)

    m2 = build_index(mk(base_ids + extra_ids), idx, resume=True,
                     store_positions=True)
    assert all(e.get("skipped") for e in m2["partitions"].values())


def test_logical_fingerprint_properties():
    """v5 input fingerprint invariants.  (1) NONLINEAR: compensating tf/dl
    edits (equal byte-sums AND equal position-weighted sums) must change the
    value — a linear checksum collided and resume served stale postings
    (review r04).  (2) Record-order independent: the shuffle does not
    guarantee run arrival order.  (3) Stream position matters: swapping the
    tf and dl streams of a record is a different input.  (4) A single-record
    edit is visible."""
    import numpy as np

    from wikirec_ray.stages.index_build import _logical_fingerprint

    def u(*a):
        return np.array(a, np.uint64)

    base = _logical_fingerprint(u(7, 7, 7), u(0, 1, 2), u(1, 3, 1), u(2, 4, 2))
    comp = _logical_fingerprint(u(7, 7, 7), u(0, 1, 2), u(2, 1, 2), u(3, 2, 3))
    assert base != comp  # (1) compensating edit detected
    perm = _logical_fingerprint(u(7, 7, 7), u(2, 0, 1), u(1, 1, 3), u(2, 2, 4))
    assert base == perm  # (2) record order irrelevant
    assert _logical_fingerprint(u(7), u(0), u(5), u(9)) != _logical_fingerprint(
        u(7), u(0), u(9), u(5)
    )  # (3) tf/dl swap visible
    edit = _logical_fingerprint(u(7, 7, 7), u(0, 1, 2), u(1, 3, 1), u(2, 4, 3))
    assert base != edit  # (4) one-value edit visible
