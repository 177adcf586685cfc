"""Metadata-filtered retrieval + facet counts (the Elasticsearch
filter / terms-aggregation pair over the doc-meta sidecar).

Contracts pinned here (see ``stages/doc_meta.py``):
- the sidecar build is input-aware-resumable (unchanged ranges skip,
  a changed range rewrites only itself);
- ``facet_counts`` = exact (value, count) over docs matching ANY query
  term, alive only, ordered (count desc, value asc) — local, served, and
  a DuckDB replay all agree;
- ``filtered_topk`` = plain BM25 with the attribute as a pure filter
  (corpus-global df/avgdl, like tombstones/boolean clauses) — local ==
  served == DuckDB;
- a matched doc missing from the sidecar fails LOUDLY (stale sidecar),
  never silently miscounts.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from wikirec_ray.pipelines.query import IndexReader

N_DOCS = 300
ID_STRIDE = 37  # span 2 doc ranges
LANGS = ["en", "de", "ru"]
SOURCES = ["crawl", "news", "wiki", "forum", "docs"]


def _mk_corpus():
    vocab = np.array([f"w{i}" for i in range(18)])
    probs = 1.0 / np.arange(1, 19)
    probs /= probs.sum()
    rows = []
    for i in range(N_DOCS):
        rng = np.random.default_rng(9100 + i)  # per-id rng (memory lesson)
        ln = int(rng.integers(5, 40))
        rows.append({
            "doc_id": i * ID_STRIDE,
            "text": " ".join(rng.choice(vocab, size=ln, p=probs)),
            "lang": LANGS[i % 3],
            "source": SOURCES[i % 5],
        })
    return rows


def _ds(rows, cols=("doc_id", "text", "lang", "source")):
    import ray.data

    return ray.data.from_arrow(
        pa.table({c: [r[c] for r in rows] for c in cols})
    )


@pytest.fixture(scope="module")
def fx(ray_session, tmp_path_factory):
    from wikirec_ray.stages.doc_meta import build_doc_meta
    from wikirec_ray.stages.index_build import build_index

    rows = _mk_corpus()
    idx = str(tmp_path_factory.mktemp("facets") / "idx")
    # positional + precomputed bigrams so the col:value filter tests cover
    # the phrase/NEAR/precomputed routes too (BM25 scoring is unchanged)
    build_index(_ds(rows, ("doc_id", "text")), idx, resume=False,
                store_positions=True, precompute_bigrams=16)
    build_doc_meta(_ds(rows, ("doc_id", "lang", "source")), idx,
                   cols=["lang", "source"])
    return {"rows": rows, "idx": idx,
            "attr": {r["doc_id"]: r for r in rows}}


def _brute_matched(rows, terms):
    ts = set(terms)
    return sorted(r["doc_id"] for r in rows if ts & set(r["text"].split()))


def _brute_facets(rows, terms, col, k):
    from collections import Counter

    c = Counter()
    attr = {r["doc_id"]: r[col] for r in rows}
    for d in _brute_matched(rows, terms):
        c[attr[d]] += 1
    return sorted(c.items(), key=lambda it: (-it[1], it[0]))[:k]


QUERY = ["w0", "w7", "w15"]


def test_facet_counts_match_brute(fx):
    rd = IndexReader(fx["idx"])
    for col in ("lang", "source"):
        got = rd.facet_counts(QUERY, col, k=10)
        assert got == _brute_facets(fx["rows"], QUERY, col, 10)
    # k cuts deterministically; absent terms contribute nothing
    assert rd.facet_counts(QUERY, "source", k=2) == _brute_facets(
        fx["rows"], QUERY, "source", 2)
    assert rd.facet_counts(["zzz"], "lang", 5) == []


def test_filtered_topk_matches_brute_filter(fx):
    rd = IndexReader(fx["idx"])
    full = rd.topk(QUERY, N_DOCS)  # engine-order full ranking
    for col, val in (("lang", "de"), ("source", "wiki")):
        want = [(d, s) for d, s in full
                if fx["attr"][d][col] == val][:7]
        assert rd.filtered_topk(QUERY, 7, col, val) == want
    assert rd.filtered_topk(QUERY, 7, "lang", "xx") == []  # unknown value


def test_served_equals_local(fx, ray_session):
    from wikirec_ray.state.server import RangeShardedQueryEngine

    rd = IndexReader(fx["idx"])
    eng = RangeShardedQueryEngine(fx["idx"], pool_size=3)
    try:
        for col in ("lang", "source"):
            assert eng.facet_counts(QUERY, col, 10) == \
                rd.facet_counts(QUERY, col, 10)
        assert eng.filtered_topk(QUERY, 7, "source", "news") == \
            rd.filtered_topk(QUERY, 7, "source", "news")
        assert eng.filtered_topk(["zzz"], 7, "lang", "en") == []
        # duplicate-terms parity (CLAUDE.md rule: every scoring route
        # scores once per OCCURRENCE — a sorted(set()) regression in the
        # served twi construction must fail here)
        dup = ["w0", "w0", "w7"]
        got = eng.filtered_topk(dup, 7, "lang", "en")
        assert got == rd.filtered_topk(dup, 7, "lang", "en")
        assert got != rd.filtered_topk(["w0", "w7"], 7, "lang", "en")
        assert eng.facet_counts(dup, "source", 10) == \
            rd.facet_counts(dup, "source", 10)
    finally:
        eng.shutdown()


def test_deleted_docs_drop_from_facets_and_filter(fx, tmp_path):
    import shutil

    from wikirec_ray.stages.lifecycle import delete_docs

    idx = str(tmp_path / "del")
    shutil.copytree(fx["idx"], idx)
    rd0 = IndexReader(idx)
    victims = [d for d, _ in rd0.filtered_topk(QUERY, 3, "lang", "en")]
    before = dict(rd0.facet_counts(QUERY, "lang", 10))
    delete_docs(idx, victims)
    rd = IndexReader(idx)
    after = dict(rd.facet_counts(QUERY, "lang", 10))
    assert after["en"] == before["en"] - len(victims)
    assert all(d not in [h[0] for h in rd.filtered_topk(QUERY, 50, "lang", "en")]
               for d in victims)
    # aggregations share the alive-match contract: stats count drops by
    # the deleted matches, and the significant_terms BACKGROUND drops the
    # tombstoned docs too (local and served agree after the delete)
    assert rd.cardinality(QUERY, "lang") <= rd0.cardinality(QUERY, "lang")
    _, n_bg0 = rd0._background_counts("lang")
    _, n_bg = rd._background_counts("lang")
    assert n_bg == n_bg0 - len(victims)
    sig = rd.significant_terms(QUERY, "lang", 10)
    from wikirec_ray.state.server import RangeShardedQueryEngine

    eng = RangeShardedQueryEngine(idx, pool_size=2)
    try:
        got = eng.significant_terms(QUERY, "lang", 10)
        assert [(b["value"], b["n_docs"], b["bg_docs"]) for b in got] == \
            [(b["value"], b["n_docs"], b["bg_docs"]) for b in sig]
        assert eng.metric_stats(QUERY, "n_chars" if "n_chars" in
                                rd.meta_cols() else "lang")["count"] == \
            rd.metric_stats(QUERY, "n_chars" if "n_chars" in
                            rd.meta_cols() else "lang")["count"]
    finally:
        eng.shutdown()


def test_sidecar_resume_and_input_awareness(fx, ray_session):
    from wikirec_ray.stages.doc_meta import build_doc_meta

    rows = fx["rows"]
    # unchanged input: every range skips
    m = build_doc_meta(_ds(rows, ("doc_id", "lang", "source")), fx["idx"],
                       cols=["lang", "source"])
    assert all(e["skipped"] for e in m["partitions"].values())
    # one changed value: ONLY its range rewrites (restore in finally so a
    # failure can't poison the other module-scoped tests)
    try:
        rows2 = [dict(r) for r in rows]
        rows2[-1]["lang"] = "fr"
        m2 = build_doc_meta(_ds(rows2, ("doc_id", "lang", "source")),
                            fx["idx"], cols=["lang", "source"])
        changed = [k for k, e in m2["partitions"].items() if not e["skipped"]]
        assert changed == [f"range-{(rows2[-1]['doc_id'] // 8192):06d}.parquet"]
        rd = IndexReader(fx["idx"])
        assert ("fr", 0) not in rd.facet_counts(QUERY, "lang", 10)  # sanity
    finally:
        build_doc_meta(_ds(rows, ("doc_id", "lang", "source")), fx["idx"],
                       cols=["lang", "source"])


def test_stale_sidecar_fails_loudly(fx, tmp_path, ray_session):
    import shutil

    from wikirec_ray.stages.doc_meta import build_doc_meta

    idx = str(tmp_path / "stale")
    shutil.copytree(fx["idx"], idx)
    shutil.rmtree(os.path.join(idx, "meta"))
    # sidecar over a SUBSET of the corpus: matched docs missing from it
    build_doc_meta(_ds(fx["rows"][:10], ("doc_id", "lang", "source")), idx,
                   cols=["lang", "source"])
    rd = IndexReader(idx)
    with pytest.raises(RuntimeError, match="re-run build_doc_meta"):
        rd.facet_counts(QUERY, "lang", 5)
    # the filtered route is equally loud (no silent drop of index docs)
    with pytest.raises(RuntimeError, match="re-run build_doc_meta"):
        rd.filtered_topk(QUERY, 5, "lang", "en")
    # ... and so are both served twins
    from wikirec_ray.state.server import RangeShardedQueryEngine

    eng = RangeShardedQueryEngine(idx, pool_size=2)
    try:
        with pytest.raises(RuntimeError, match="re-run build_doc_meta"):
            eng.facet_counts(QUERY, "lang", 5)
        with pytest.raises(RuntimeError, match="re-run build_doc_meta"):
            eng.filtered_topk(QUERY, 5, "lang", "en")
    finally:
        eng.shutdown()
    # missing sidecar / unknown column are loud too
    with pytest.raises(KeyError, match="rebuild with build_doc_meta"):
        rd._meta = {}
        rd._meta_codes("domain")
    shutil.rmtree(os.path.join(idx, "meta"))
    rd2 = IndexReader(idx)
    with pytest.raises(FileNotFoundError, match="no metadata sidecar"):
        rd2.facet_counts(QUERY, "lang", 5)


def test_sidecar_rewrite_under_live_reader_fails_loudly(fx, tmp_path,
                                                        ray_session):
    """A reader pins the meta-manifest snapshot at first use: a
    build_doc_meta rewrite underneath it must raise on the next column
    load, never serve mixed sidecar generations (the concurrent-replace
    read footgun)."""
    import shutil

    from wikirec_ray.stages.doc_meta import build_doc_meta

    idx = str(tmp_path / "live")
    shutil.copytree(fx["idx"], idx)
    rd = IndexReader(idx)
    rd.facet_counts(QUERY, "lang", 5)  # snapshot taken, lang cached
    rows2 = [dict(r) for r in fx["rows"]]
    for r in rows2:  # guarantee a different file size
        r["source"] = r["source"] + "-rewritten-with-much-longer-values"
    build_doc_meta(_ds(rows2, ("doc_id", "lang", "source")), idx,
                   cols=["lang", "source"])
    with pytest.raises(RuntimeError, match="manifest snapshot"):
        rd.facet_counts(QUERY, "source", 5)
    # a FRESH reader sees the new generation cleanly
    assert IndexReader(idx).facet_counts(QUERY, "source", 5)[0][0].endswith(
        "longer-values")


def test_custom_id_col_normalized_on_disk(fx, tmp_path, ray_session):
    """build_doc_meta(id_col='page_id') writes doc_id-named files —
    readers never need the input's column name."""
    import shutil

    from wikirec_ray.stages.doc_meta import build_doc_meta

    idx = str(tmp_path / "idcol")
    shutil.copytree(fx["idx"], idx)
    shutil.rmtree(os.path.join(idx, "meta"))
    rows = [
        {"page_id": r["doc_id"], "lang": r["lang"], "source": r["source"]}
        for r in fx["rows"]
    ]
    build_doc_meta(_ds(rows, ("page_id", "lang", "source")), idx,
                   cols=["lang", "source"], id_col="page_id")
    rd = IndexReader(idx)
    assert rd.facet_counts(QUERY, "lang", 10) == \
        _brute_facets(fx["rows"], QUERY, "lang", 10)


def _post_filter(hits, attr_map, col, value, k):
    """Reference semantics: a metadata filter composed with any route is a
    pure post-filter on the full (unbounded-k) ranking."""
    return [(d, s) for d, s in hits if attr_map[d][col] == value][:k]


def test_split_filters():
    from wikirec_ray.pipelines.query import split_filters

    cols = ["lang", "source"]
    assert split_filters("lang:en w0 w1", cols) == \
        ([("lang", "en")], "w0 w1")
    assert split_filters("w0 lang:en source:wiki w1", cols) == \
        ([("lang", "en"), ("source", "wiki")], "w0   w1")  # ws is harmless
    # unknown column stays query text; no sidecar -> nothing is a filter
    assert split_filters("time:10 w0", cols) == ([], "time:10 w0")
    assert split_filters("lang:en w0", []) == ([], "lang:en w0")
    # chunks inside quotes / NEAR(...) are protected
    assert split_filters('lang:de "lang:en w0"', cols) == \
        ([("lang", "de")], '"lang:en w0"')
    assert split_filters("source:news NEAR/4(lang:en w0)", cols) == \
        ([("source", "news")], "NEAR/4(lang:en w0)")
    # a chunk STRADDLING a protected span is never lifted (would mangle
    # the NEAR expression / leave a dangling paren)
    assert split_filters("source:NEAR/4(w0 w1)", cols) == \
        ([], "source:NEAR/4(w0 w1)")
    # the chunk's own quoted value is liftable, quotes stripped
    assert split_filters('lang:"de" w0', cols) == ([("lang", "de")], "w0")
    assert split_filters('source:"a b" w0', cols) == \
        ([("source", "a b")], "w0")
    # column names match case-insensitively, canonical name emitted
    assert split_filters("LANG:en w0", cols) == ([("lang", "en")], "w0")


def test_attr_filters_on_every_route(fx):
    """col:value filters compose with BM25 / phrase / NEAR / boolean as
    pure post-filters of the unfiltered ranking (scoring corpus-global),
    locally and via the search() string surface."""
    from wikirec_ray.pipelines.query import search

    rd = IndexReader(fx["idx"])
    attr = fx["attr"]
    # bm25
    want = _post_filter(rd.topk(QUERY, N_DOCS), attr, "lang", "de", 7)
    assert rd.topk(QUERY, 7, attrs=[("lang", "de")]) == want
    assert search(rd, "lang:de w0 w7 w15", 7) == want
    # phrase — both the precomputed fast path and the positional path
    for pair in (["w0", "w1"], ["w15", "w16"]):
        route = "precomputed" if " ".join(pair) in rd.bigrams else "positional"
        wantp = _post_filter(rd.phrase_topk(pair, N_DOCS), attr,
                             "source", "wiki", 5)
        got = rd.phrase_topk(pair, 5, attrs=[("source", "wiki")])
        assert got == wantp, route
        assert search(rd, f'source:wiki "{pair[0]} {pair[1]}"', 5) == wantp
    # NEAR
    wantn = _post_filter(rd.near_topk(["w0", "w7"], N_DOCS, 4), attr,
                         "lang", "en", 5)
    assert rd.near_topk(["w0", "w7"], 5, 4, attrs=[("lang", "en")]) == wantn
    assert search(rd, "lang:en NEAR/4(w0 w7)", 5) == wantn
    # boolean
    wantb = _post_filter(rd.boolean_topk(["w0"], ["w7"], ["w17"], N_DOCS),
                         attr, "lang", "ru", 5)
    assert rd.boolean_topk(["w0"], ["w7"], ["w17"], 5,
                           attrs=[("lang", "ru")]) == wantb
    assert search(rd, "lang:ru w0 +w7 -w17", 5) == wantb
    # conjunctive multi-filter
    want2 = [(d, s) for d, s in rd.topk(QUERY, N_DOCS)
             if attr[d]["lang"] == "de" and attr[d]["source"] == "wiki"][:5]
    assert rd.topk(QUERY, 5,
                   attrs=[("lang", "de"), ("source", "wiki")]) == want2
    assert search(rd, "lang:de source:wiki w0 w7 w15", 5) == want2
    # unknown value matches nothing; filters with no terms return []
    assert rd.topk(QUERY, 5, attrs=[("lang", "xx")]) == []
    assert search(rd, "lang:de", 5) == []


def test_attr_filters_served_equals_local(fx, ray_session):
    from wikirec_ray.pipelines.query import search
    from wikirec_ray.state.server import RangeShardedQueryEngine

    rd = IndexReader(fx["idx"])
    eng = RangeShardedQueryEngine(fx["idx"], pool_size=3)
    try:
        assert eng.meta_cols() == ["lang", "source"]
        for q in ("lang:de w0 w7 w15",
                  'source:wiki "w0 w1"',      # precomputed or positional
                  'lang:en "w15 w16"',
                  "lang:en NEAR/4(w0 w7)",
                  "lang:ru w0 +w7 -w17",
                  "lang:de source:wiki w0 w7 w15"):
            assert search(eng, q, 5) == search(rd, q, 5), q
    finally:
        eng.shutdown()


def test_facets_and_filter_match_duckdb(fx):
    """DuckDB replay: OR-match facet counts and the filtered BM25 ranking
    (same tokenizer, same rounding conventions as the driver oracles)."""
    import duckdb

    rd = IndexReader(fx["idx"])
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": [r["doc_id"] for r in fx["rows"]],
        "text": [r["text"] for r in fx["rows"]],
        "lang": [r["lang"] for r in fx["rows"]],
        "source": [r["source"] for r in fx["rows"]],
    }))
    terms = ", ".join(f"('{t}')" for t in QUERY)
    got = rd.facet_counts(QUERY, "source", 10)
    want = con.execute(f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split_regex(lower(text),
                '[^a-z0-9]+')) AS term FROM documents
        ), q(term) AS (VALUES {terms}),
        m AS (SELECT DISTINCT doc_id FROM tok JOIN q USING (term))
        SELECT d.source, COUNT(*) AS n FROM m JOIN documents d USING (doc_id)
        GROUP BY d.source ORDER BY n DESC, d.source LIMIT 10
    """).fetchall()
    assert [(v, int(n)) for v, n in want] == got

    k1, b = 1.5, 0.75
    got_f = rd.filtered_topk(QUERY, 7, "lang", "ru")
    want_f = con.execute(f"""
        WITH tok AS (
            SELECT doc_id, t AS term FROM (SELECT doc_id,
                unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
                FROM documents) WHERE t <> ''
        ),
        tf AS (SELECT doc_id, term, COUNT(*)::DOUBLE AS tf FROM tok
               GROUP BY doc_id, term),
        dl AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM tok GROUP BY doc_id),
        st AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl FROM dl),
        dfv AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term),
        q(term) AS (VALUES {terms}),
        scored AS (
            SELECT tf.doc_id, SUM(
                ln(1 + (st.n - dfv.df + 0.5) / (dfv.df + 0.5)) * tf.tf *
                ({k1} + 1) / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / st.avgdl))
            ) AS score
            FROM q JOIN tf USING (term) JOIN dfv USING (term)
            JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st
            GROUP BY tf.doc_id
        )
        SELECT s.doc_id, ROUND(s.score, 9) FROM scored s
        JOIN documents d USING (doc_id)
        WHERE d.lang = 'ru' AND round(s.score, 9) > 0
        ORDER BY round(s.score, 9) DESC, s.doc_id LIMIT 7
    """).fetchall()
    assert [(int(d), float(s)) for d, s in want_f] == got_f


def test_attr_matching_codes_unit():
    """The one value-spec interpreter: literal equality vs numeric range,
    strict numeric grammar on BOTH the bound and the stored values (so
    Python and DuckDB TRY_CAST agree — float()'s '1_0' and ' 5 ' forms
    are rejected)."""
    from wikirec_ray.pipelines.query import attr_matching_codes as amc

    vals = ["10", "250", "3", "abc", "2.5e1", "-4", "", "1_0"]
    assert amc(vals, "250").tolist() == [1]
    assert amc(vals, "abc").tolist() == [3]
    assert amc(vals, "nope").tolist() == []
    assert amc(vals, ">9").tolist() == [0, 1, 4]      # 10, 250, 25.0
    assert amc(vals, ">=10").tolist() == [0, 1, 4]
    assert amc(vals, "<3").tolist() == [5]            # -4 only
    assert amc(vals, "<=3").tolist() == [2, 5]
    # non-numeric / underscore stored values never match a range
    assert all(3 not in amc(vals, op + "0").tolist()
               for op in (">", ">=", "<", "<="))
    assert 7 not in amc(vals, ">1").tolist()          # '1_0' is not numeric
    # non-numeric bound matches nothing (user input must not crash)
    assert amc(vals, ">abc").tolist() == []
    assert amc(vals, ">=1_0").tolist() == []
    assert amc(vals, ">").tolist() == []


@pytest.fixture(scope="module")
def numfx(ray_session, tmp_path_factory):
    """Own index + sidecar with a NUMERIC attribute (n_tok, stored as
    string like every sidecar column) alongside a categorical one."""
    from wikirec_ray.stages.doc_meta import build_doc_meta
    from wikirec_ray.stages.index_build import build_index

    rows = _mk_corpus()
    for r in rows:
        r["n_tok"] = str(len(r["text"].split()))
    idx = str(tmp_path_factory.mktemp("rangefx") / "idx")
    build_index(_ds(rows, ("doc_id", "text")), idx, resume=False)
    build_doc_meta(_ds(rows, ("doc_id", "lang", "n_tok")), idx,
                   cols=["lang", "n_tok"])
    return {"rows": rows, "idx": idx}


def test_range_filters_match_brute_and_duckdb(numfx):
    import duckdb

    rows = numfx["rows"]
    rd = IndexReader(numfx["idx"])
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "text": [r["text"] for r in rows],
        "n_tok": [int(r["n_tok"]) for r in rows],
    }))
    k1, b = 1.5, 0.75
    terms = ", ".join(f"('{t}')" for t in QUERY)
    for spec, sqlpred in [
        (">=20", "TRY_CAST(d.n_tok AS DOUBLE) >= 20"),
        (">20", "TRY_CAST(d.n_tok AS DOUBLE) > 20"),
        ("<12", "TRY_CAST(d.n_tok AS DOUBLE) < 12"),
        ("<=12", "TRY_CAST(d.n_tok AS DOUBLE) <= 12"),
        ("12", "d.n_tok = 12"),
    ]:
        got = rd.filtered_topk(QUERY, 7, "n_tok", spec)
        want = con.execute(f"""
            WITH tok AS (
                SELECT doc_id, t AS term FROM (SELECT doc_id,
                    unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
                    FROM documents) WHERE t <> ''
            ),
            tf AS (SELECT doc_id, term, COUNT(*)::DOUBLE AS tf FROM tok
                   GROUP BY doc_id, term),
            dl AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM tok GROUP BY doc_id),
            st AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl FROM dl),
            dfv AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term),
            q(term) AS (VALUES {terms}),
            scored AS (
                SELECT tf.doc_id, SUM(
                    ln(1 + (st.n - dfv.df + 0.5) / (dfv.df + 0.5)) * tf.tf *
                    ({k1} + 1) / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / st.avgdl))
                ) AS score
                FROM q JOIN tf USING (term) JOIN dfv USING (term)
                JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st
                GROUP BY tf.doc_id
            )
            SELECT s.doc_id, ROUND(s.score, 9) FROM scored s
            JOIN documents d USING (doc_id)
            WHERE {sqlpred} AND round(s.score, 9) > 0
            ORDER BY round(s.score, 9) DESC, s.doc_id LIMIT 7
        """).fetchall()
        assert [(int(d), float(s)) for d, s in want] == got, spec
        assert got, spec  # every spec must actually select something

    # brute sanity on the raw keep set: range == python comparison
    n_tok = {r["doc_id"]: int(r["n_tok"]) for r in rows}
    base = {d for d, _ in rd.topk(QUERY, 10_000)}
    kept = {d for d, _ in rd.filtered_topk(QUERY, 10_000, "n_tok", ">=20")}
    assert kept == {d for d in base if n_tok[d] >= 20}

    # a range over a NON-numeric column matches nothing, never crashes
    assert rd.filtered_topk(QUERY, 7, "lang", ">=1") == []
    # garbage bound: same
    assert rd.filtered_topk(QUERY, 7, "n_tok", ">=abc") == []


def test_range_filters_compose_with_search_and_serving(numfx, ray_session):
    from wikirec_ray.pipelines.query import search
    from wikirec_ray.state.server import RangeShardedQueryEngine

    rd = IndexReader(numfx["idx"])
    q = "n_tok:>=20 w0 w7 w15"
    local = search(rd, q, 7)
    assert local == rd.filtered_topk(["w0", "w7", "w15"], 7, "n_tok", ">=20")
    eng = RangeShardedQueryEngine(numfx["idx"], pool_size=3)
    try:
        assert search(eng, q, 7) == local
        assert eng.topk(["w0", "w7", "w15"], 7,
                        attrs=[("n_tok", "<12"), ("lang", "en")]) == \
            rd.topk(["w0", "w7", "w15"], 7,
                    attrs=[("n_tok", "<12"), ("lang", "en")])
    finally:
        eng.shutdown()


# ---------------------------------------------------------------------------
# metric stats aggregation (Elasticsearch `stats`: count/min/max/sum/avg
# of a numeric sidecar column over the OR-matched docs)
# ---------------------------------------------------------------------------

_EMPTY_STATS = {"count": 0, "sum": 0.0, "min": None, "max": None,
                "avg": None}


def _brute_stats(rows, terms, col, pred=None):
    attr = {r["doc_id"]: r for r in rows}
    vals = []
    for d in _brute_matched(rows, terms):
        r = attr[d]
        if pred is not None and not pred(r):
            continue
        try:
            vals.append(float(r[col]))
        except ValueError:
            continue
    if not vals:
        return dict(_EMPTY_STATS)
    return {"count": len(vals), "sum": sum(vals), "min": min(vals),
            "max": max(vals), "avg": sum(vals) / len(vals)}


def _assert_stats_close(got, want):
    assert got["count"] == want["count"]
    for key in ("sum", "min", "max", "avg"):
        if want[key] is None:
            assert got[key] is None, key
        else:
            assert got[key] == pytest.approx(want[key], rel=1e-12), key


def test_metric_stats_matches_brute_and_duckdb(numfx):
    import duckdb

    rows = numfx["rows"]
    rd = IndexReader(numfx["idx"])

    got = rd.metric_stats(QUERY, "n_tok")
    _assert_stats_close(got, _brute_stats(rows, QUERY, "n_tok"))

    # attrs compose: the filter narrows the match set BEFORE aggregation
    got_f = rd.metric_stats(QUERY, "n_tok", attrs=[("lang", "de")])
    _assert_stats_close(
        got_f,
        _brute_stats(rows, QUERY, "n_tok",
                     pred=lambda r: r["lang"] == "de"),
    )
    assert got_f["count"] < got["count"]

    # DuckDB replay: distinct OR-match join + strict-grammar-guarded cast
    from wikirec_ray.pipelines.query import NUMERIC_GRAMMAR_RE

    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "text": [r["text"] for r in rows],
        "n_tok": [r["n_tok"] for r in rows],  # string, like the sidecar
    }))
    terms = ", ".join(f"('{t}')" for t in sorted(set(QUERY)))
    want = con.execute(f"""
        WITH tok AS (
            SELECT doc_id, t AS term FROM (SELECT doc_id,
                unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
                FROM documents) WHERE t <> ''
        ),
        q(term) AS (VALUES {terms}),
        m AS (SELECT DISTINCT doc_id FROM tok JOIN q USING (term))
        SELECT COUNT(*)::BIGINT, SUM(v), MIN(v), MAX(v), AVG(v) FROM (
            SELECT TRY_CAST(d.n_tok AS DOUBLE) AS v
            FROM m JOIN documents d USING (doc_id)
            WHERE regexp_full_match(d.n_tok, '{NUMERIC_GRAMMAR_RE}')
        )
    """).fetchone()
    _assert_stats_close(got, {
        "count": int(want[0]), "sum": float(want[1]), "min": float(want[2]),
        "max": float(want[3]), "avg": float(want[4]),
    })

    # non-numeric column: every stored value fails the strict parse —
    # the ES empty-stats shape, never a crash
    assert rd.metric_stats(QUERY, "lang") == _EMPTY_STATS
    # absent term / empty query: empty shape
    assert rd.metric_stats(["zzz"], "n_tok") == _EMPTY_STATS
    assert rd.metric_stats([], "n_tok") == _EMPTY_STATS
    # attrs that empty the match set: empty shape
    assert rd.metric_stats(QUERY, "n_tok",
                           attrs=[("lang", "xx")]) == _EMPTY_STATS


def test_metric_stats_served_equals_local(numfx, ray_session):
    from wikirec_ray.state.server import RangeShardedQueryEngine

    rd = IndexReader(numfx["idx"])
    eng = RangeShardedQueryEngine(numfx["idx"], pool_size=3)
    try:
        for terms, attrs in [
            (QUERY, None),
            (QUERY, [("lang", "en")]),
            (QUERY, [("n_tok", ">=20")]),
            (["w0", "w0", "w7"], None),  # duplicate-terms parity
            (["zzz"], None),
        ]:
            _assert_stats_close(
                eng.metric_stats(terms, "n_tok", attrs=attrs),
                rd.metric_stats(terms, "n_tok", attrs=attrs),
            )
        assert eng.metric_stats(QUERY, "lang") == _EMPTY_STATS
    finally:
        eng.shutdown()


# ---------------------------------------------------------------------------
# extended_stats (+ variance/std) and histogram aggregations
# ---------------------------------------------------------------------------

_EMPTY_EXT = {"count": 0, "sum": 0.0, "sum_of_squares": 0.0, "min": None,
              "max": None, "avg": None, "variance": None,
              "std_deviation": None}


def test_extended_stats_matches_brute_and_duckdb(numfx):
    import duckdb

    rows = numfx["rows"]
    rd = IndexReader(numfx["idx"])
    got = rd.extended_stats(QUERY, "n_tok")

    # brute: population moments over the matched docs' values
    vals = [float(r["n_tok"]) for r in rows
            if r["doc_id"] in set(_brute_matched(rows, QUERY))]
    n = len(vals)
    mean = sum(vals) / n
    var = sum(v * v for v in vals) / n - mean * mean
    assert got["count"] == n
    assert got["avg"] == pytest.approx(mean, rel=1e-12)
    assert got["sum_of_squares"] == pytest.approx(
        sum(v * v for v in vals), rel=1e-12)
    assert got["variance"] == pytest.approx(var, rel=1e-9)
    assert got["std_deviation"] == pytest.approx(var ** 0.5, rel=1e-9)
    # the plain-stats fields agree with metric_stats exactly
    st = rd.metric_stats(QUERY, "n_tok")
    assert {k: got[k] for k in st} == st

    # DuckDB replay (VAR_POP / STDDEV_POP are the ES population moments)
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "text": [r["text"] for r in rows],
        "n_tok": [r["n_tok"] for r in rows],
    }))
    terms = ", ".join(f"('{t}')" for t in sorted(set(QUERY)))
    want = con.execute(f"""
        WITH tok AS (
            SELECT doc_id, t AS term FROM (SELECT doc_id,
                unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
                FROM documents) WHERE t <> ''
        ),
        q(term) AS (VALUES {terms}),
        m AS (SELECT DISTINCT doc_id FROM tok JOIN q USING (term))
        SELECT VAR_POP(v), STDDEV_POP(v) FROM (
            SELECT TRY_CAST(d.n_tok AS DOUBLE) AS v
            FROM m JOIN documents d USING (doc_id)
        )
    """).fetchone()
    assert got["variance"] == pytest.approx(float(want[0]), rel=1e-9)
    assert got["std_deviation"] == pytest.approx(float(want[1]), rel=1e-9)

    # attrs compose; empty shapes
    got_f = rd.extended_stats(QUERY, "n_tok", attrs=[("lang", "de")])
    assert 0 < got_f["count"] < got["count"]
    assert rd.extended_stats(QUERY, "lang") == _EMPTY_EXT
    assert rd.extended_stats(["zzz"], "n_tok") == _EMPTY_EXT


def _brute_hist(rows, terms, col, interval, pred=None):
    import math as _m

    buckets = {}
    attr = {r["doc_id"]: r for r in rows}
    for d in _brute_matched(rows, terms):
        r = attr[d]
        if pred is not None and not pred(r):
            continue
        try:
            v = float(r[col])
        except ValueError:
            continue
        key = _m.floor(v / interval) * interval
        buckets[key] = buckets.get(key, 0) + 1
    return sorted(buckets.items())


def test_histogram_matches_brute_and_duckdb(numfx):
    import duckdb

    rows = numfx["rows"]
    rd = IndexReader(numfx["idx"])

    for interval in (5.0, 7.5, 1.0):
        got = rd.histogram(QUERY, "n_tok", interval)
        assert got == _brute_hist(rows, QUERY, "n_tok", interval), interval
    got = rd.histogram(QUERY, "n_tok", 5.0)
    assert sum(c for _, c in got) == rd.metric_stats(QUERY, "n_tok")["count"]
    assert [lo for lo, _ in got] == sorted(lo for lo, _ in got)

    # DuckDB replay: FLOOR(v/i)*i GROUP BY bucket
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "text": [r["text"] for r in rows],
        "n_tok": [r["n_tok"] for r in rows],
    }))
    terms = ", ".join(f"('{t}')" for t in sorted(set(QUERY)))
    want = con.execute(f"""
        WITH tok AS (
            SELECT doc_id, t AS term FROM (SELECT doc_id,
                unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
                FROM documents) WHERE t <> ''
        ),
        q(term) AS (VALUES {terms}),
        m AS (SELECT DISTINCT doc_id FROM tok JOIN q USING (term))
        SELECT FLOOR(v / 5.0) * 5.0 AS b, COUNT(*) FROM (
            SELECT TRY_CAST(d.n_tok AS DOUBLE) AS v
            FROM m JOIN documents d USING (doc_id)
        ) GROUP BY 1 ORDER BY 1
    """).fetchall()
    assert got == [(float(b), int(c)) for b, c in want]

    # attrs compose
    assert rd.histogram(QUERY, "n_tok", 5.0, attrs=[("lang", "de")]) == \
        _brute_hist(rows, QUERY, "n_tok", 5.0,
                    pred=lambda r: r["lang"] == "de")
    # empty shapes and validation
    assert rd.histogram(["zzz"], "n_tok", 5.0) == []
    assert rd.histogram(QUERY, "lang", 5.0) == []
    for bad in (0.0, -1.0, float("inf"), float("nan")):
        with pytest.raises(ValueError):
            rd.histogram(QUERY, "n_tok", bad)


def _brute_grouped(rows, terms, by_col, val_col, k, pred=None):
    attr = {r["doc_id"]: r for r in rows}
    groups = {}
    for d in _brute_matched(rows, terms):
        r = attr[d]
        if pred is not None and not pred(r):
            continue
        g = groups.setdefault(r[by_col], {"n": 0, "vals": []})
        g["n"] += 1
        try:
            g["vals"].append(float(r[val_col]))
        except ValueError:
            pass
    out = []
    for v in sorted(groups, key=lambda v: (-groups[v]["n"], v))[:k]:
        g = groups[v]
        bucket = {"value": v, "n_docs": g["n"], "count": len(g["vals"])}
        if not g["vals"]:
            bucket.update(sum=0.0, min=None, max=None, avg=None)
        else:
            bucket.update(sum=sum(g["vals"]), min=min(g["vals"]),
                          max=max(g["vals"]),
                          avg=sum(g["vals"]) / len(g["vals"]))
        out.append(bucket)
    return out


def _assert_buckets_close(got, want):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["value"], g["n_docs"], g["count"]) == \
            (w["value"], w["n_docs"], w["count"])
        for key in ("sum", "min", "max", "avg"):
            if w[key] is None:
                assert g[key] is None, key
            else:
                assert g[key] == pytest.approx(w[key], rel=1e-12), key


def test_grouped_stats_matches_brute_and_duckdb(numfx):
    import duckdb

    rows = numfx["rows"]
    rd = IndexReader(numfx["idx"])

    got = rd.grouped_stats(QUERY, "lang", "n_tok")
    _assert_buckets_close(got, _brute_grouped(rows, QUERY, "lang", "n_tok",
                                              10))
    # bucket keys and order == facet_counts (the ES terms-agg contract)
    assert [(b["value"], b["n_docs"]) for b in got] == \
        rd.facet_counts(QUERY, "lang", 10)
    # k cuts buckets
    assert rd.grouped_stats(QUERY, "lang", "n_tok", k=2) == got[:2]
    # attrs compose
    _assert_buckets_close(
        rd.grouped_stats(QUERY, "lang", "n_tok",
                         attrs=[("n_tok", ">=20")]),
        _brute_grouped(rows, QUERY, "lang", "n_tok", 10,
                       pred=lambda r: float(r["n_tok"]) >= 20),
    )
    # non-numeric VALCOL: buckets still come back with empty stats
    allnull = rd.grouped_stats(QUERY, "lang", "lang")
    assert [b["value"] for b in allnull] == [b["value"] for b in got]
    assert all(b["count"] == 0 and b["min"] is None for b in allnull)
    # empty match set
    assert rd.grouped_stats(["zzz"], "lang", "n_tok") == []

    # DuckDB replay: GROUP BY with a guarded-cast aggregate
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "text": [r["text"] for r in rows],
        "lang": [r["lang"] for r in rows],
        "n_tok": [r["n_tok"] for r in rows],
    }))
    terms = ", ".join(f"('{t}')" for t in sorted(set(QUERY)))
    want = con.execute(f"""
        WITH tok AS (
            SELECT doc_id, t AS term FROM (SELECT doc_id,
                unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
                FROM documents) WHERE t <> ''
        ),
        q(term) AS (VALUES {terms}),
        m AS (SELECT DISTINCT doc_id FROM tok JOIN q USING (term))
        SELECT d.lang, COUNT(*), COUNT(v), SUM(v), MIN(v), MAX(v), AVG(v)
        FROM (SELECT doc_id, lang, TRY_CAST(n_tok AS DOUBLE) AS v
              FROM documents) d
        JOIN m USING (doc_id)
        GROUP BY d.lang ORDER BY COUNT(*) DESC, d.lang
    """).fetchall()
    assert [(b["value"], b["n_docs"], b["count"]) for b in got] == \
        [(w[0], int(w[1]), int(w[2])) for w in want]
    for b, w in zip(got, want):
        assert b["sum"] == pytest.approx(float(w[3]), rel=1e-12)
        assert b["avg"] == pytest.approx(float(w[6]), rel=1e-12)


def test_grouped_stats_trailing_empty_bucket_minmax(ray_session,
                                                    tmp_path_factory):
    """Review-r5 regression (reproduced): when the highest-coded
    dictionary value has NO contributing docs, the old clamped-reduceat
    truncated the last non-empty bucket's segment and reported a wrong
    min/max (e.g. [5, 9, 1] → min 5).  Two mirrored queries — each
    matching docs of only ONE by-value — guarantee the
    trailing-empty-after-last-nonempty shape regardless of which value
    the dictionary codes first."""
    from wikirec_ray.stages.doc_meta import build_doc_meta
    from wikirec_ray.stages.index_build import build_index
    from wikirec_ray.state.server import RangeShardedQueryEngine

    rows = [
        {"doc_id": 1, "text": "alpha common", "src": "a", "v": "5"},
        {"doc_id": 2, "text": "alpha common", "src": "a", "v": "9"},
        {"doc_id": 3, "text": "alpha common", "src": "a", "v": "1"},
        {"doc_id": 4, "text": "beta common", "src": "b", "v": "7"},
        {"doc_id": 5, "text": "beta common", "src": "b", "v": "2"},
        {"doc_id": 6, "text": "beta common", "src": "b", "v": "8"},
    ]
    idx = str(tmp_path_factory.mktemp("trailing") / "idx")
    build_index(_ds(rows, ("doc_id", "text")), idx, resume=False)
    build_doc_meta(_ds(rows, ("doc_id", "src", "v")), idx,
                   cols=["src", "v"])
    rd = IndexReader(idx)
    eng = RangeShardedQueryEngine(idx, pool_size=2)
    try:
        for terms, vals in [(["alpha"], [5.0, 9.0, 1.0]),
                            (["beta"], [7.0, 2.0, 8.0])]:
            (b,) = rd.grouped_stats(terms, "src", "v")
            assert b["min"] == min(vals) and b["max"] == max(vals), terms
            assert b["sum"] == sum(vals) and b["count"] == 3
            (sb,) = eng.grouped_stats(terms, "src", "v")
            assert sb == b, terms
        # both buckets present: still exact
        got = rd.grouped_stats(["common"], "src", "v")
        assert [(b["value"], b["min"], b["max"]) for b in got] == \
            [("a", 1.0, 9.0), ("b", 2.0, 8.0)]
        assert eng.grouped_stats(["common"], "src", "v") == got
    finally:
        eng.shutdown()


def test_grouped_stats_served_equals_local(numfx, ray_session):
    from wikirec_ray.state.server import RangeShardedQueryEngine

    rd = IndexReader(numfx["idx"])
    eng = RangeShardedQueryEngine(numfx["idx"], pool_size=3)
    try:
        for terms, attrs in [
            (QUERY, None),
            (QUERY, [("n_tok", ">=20")]),
            (["w0", "w0", "w7"], None),
            (["zzz"], None),
        ]:
            _assert_buckets_close(
                eng.grouped_stats(terms, "lang", "n_tok", attrs=attrs),
                rd.grouped_stats(terms, "lang", "n_tok", attrs=attrs),
            )
        # k cut and non-numeric VALCOL parity
        assert eng.grouped_stats(QUERY, "lang", "n_tok", k=2) == \
            rd.grouped_stats(QUERY, "lang", "n_tok", k=2)
        assert eng.grouped_stats(QUERY, "lang", "lang") == \
            rd.grouped_stats(QUERY, "lang", "lang")
    finally:
        eng.shutdown()


def _brute_significant(rows, terms, col, k, pred=None):
    attr = {r["doc_id"]: r for r in rows}
    fg = {}
    matched = [attr[d] for d in _brute_matched(rows, terms)]
    if pred is not None:
        matched = [r for r in matched if pred(r)]
    for r in matched:
        fg[r[col]] = fg.get(r[col], 0) + 1
    bg = {}
    for r in rows:  # background = whole corpus, never pred-narrowed
        bg[r[col]] = bg.get(r[col], 0) + 1
    n_fg, n_bg = len(matched), len(rows)
    out = []
    for v, f in fg.items():
        fp, bp = f / n_fg, bg[v] / n_bg
        if fp <= bp:
            continue
        out.append({"value": v, "n_docs": f, "bg_docs": bg[v],
                    "score": (fp - bp) * (fp / bp)})
    out.sort(key=lambda b: (-round(b["score"], 9), b["value"]))
    return out[:k]


def test_significant_terms_matches_brute_and_duckdb(numfx):
    import duckdb

    rows = numfx["rows"]
    rd = IndexReader(numfx["idx"])

    # a skewed query: w0 appears in nearly every doc, so use a rarer one
    for terms in (["w15", "w17"], QUERY, ["w9"]):
        got = rd.significant_terms(terms, "lang", 10)
        want = _brute_significant(rows, terms, "lang", 10)
        assert [(b["value"], b["n_docs"], b["bg_docs"]) for b in got] == \
            [(b["value"], b["n_docs"], b["bg_docs"]) for b in want], terms
        for g, w in zip(got, want):
            assert g["score"] == pytest.approx(w["score"], rel=1e-12)
    # every reported value is genuinely overrepresented
    for b in rd.significant_terms(["w15", "w17"], "lang", 10):
        n_fg = len(_brute_matched(rows, ["w15", "w17"]))
        assert b["n_docs"] / n_fg > b["bg_docs"] / len(rows)
    # attrs narrow the FOREGROUND only (background stays corpus-global)
    got_f = rd.significant_terms(QUERY, "n_tok", 5,
                                 attrs=[("lang", "de")])
    want_f = _brute_significant(rows, QUERY, "n_tok", 5,
                                pred=lambda r: r["lang"] == "de")
    assert [(b["value"], b["n_docs"], b["bg_docs"]) for b in got_f] == \
        [(b["value"], b["n_docs"], b["bg_docs"]) for b in want_f]
    # empty match set
    assert rd.significant_terms(["zzz"], "lang") == []

    # DuckDB replay of the JLH scoring end to end
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "text": [r["text"] for r in rows],
        "lang": [r["lang"] for r in rows],
    }))
    terms = ", ".join(f"('{t}')" for t in sorted({"w15", "w17"}))
    want_sql = con.execute(f"""
        WITH tok AS (
            SELECT doc_id, t AS term FROM (SELECT doc_id,
                unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
                FROM documents) WHERE t <> ''
        ),
        q(term) AS (VALUES {terms}),
        m AS (SELECT DISTINCT doc_id FROM tok JOIN q USING (term)),
        fg AS (SELECT d.lang AS value, COUNT(*)::DOUBLE AS f
               FROM m JOIN documents d USING (doc_id) GROUP BY 1),
        bg AS (SELECT lang AS value, COUNT(*)::DOUBLE AS b
               FROM documents GROUP BY 1),
        tot AS (SELECT (SELECT SUM(f) FROM fg) AS nf,
                       (SELECT COUNT(*)::DOUBLE FROM documents) AS nb)
        SELECT value, CAST(f AS BIGINT), CAST(b AS BIGINT),
               (f/nf - b/nb) * ((f/nf)/(b/nb)) AS score
        FROM fg JOIN bg USING (value) CROSS JOIN tot
        WHERE f/nf > b/nb ORDER BY round(score, 9) DESC, value
    """).fetchall()
    got = rd.significant_terms(["w15", "w17"], "lang", 10)
    assert [(b["value"], b["n_docs"], b["bg_docs"]) for b in got] == \
        [(w[0], int(w[1]), int(w[2])) for w in want_sql]
    for g, w in zip(got, want_sql):
        assert g["score"] == pytest.approx(float(w[3]), rel=1e-12)


def test_significant_terms_served_equals_local(numfx, ray_session):
    from wikirec_ray.state.server import RangeShardedQueryEngine

    rd = IndexReader(numfx["idx"])
    eng = RangeShardedQueryEngine(numfx["idx"], pool_size=3)
    try:
        for terms, attrs in [
            (["w15", "w17"], None),
            (QUERY, None),
            (QUERY, [("n_tok", ">=20")]),
            (["w0", "w0", "w7"], None),
            (["zzz"], None),
        ]:
            got = eng.significant_terms(terms, "lang", 10, attrs=attrs)
            want = rd.significant_terms(terms, "lang", 10, attrs=attrs)
            assert [(b["value"], b["n_docs"], b["bg_docs"]) for b in got] \
                == [(b["value"], b["n_docs"], b["bg_docs"]) for b in want]
            for g, w in zip(got, want):
                assert g["score"] == pytest.approx(w["score"], rel=1e-12)
        # second call hits the coordinator's background cache — same result
        assert eng.significant_terms(QUERY, "lang", 10) == \
            eng.significant_terms(QUERY, "lang", 10)
    finally:
        eng.shutdown()


def test_top_hits_by_matches_global_ranking(numfx):
    rows = numfx["rows"]
    rd = IndexReader(numfx["idx"])

    got = rd.top_hits_by(QUERY, "lang", n_buckets=3, k_per_bucket=4)
    # bucket keys/order/counts == facet_counts (the ES terms-agg contract)
    assert [(b["value"], b["n_docs"]) for b in got] == \
        rd.facet_counts(QUERY, "lang", 3)
    # each bucket's hit list is exactly the value-filtered slice of the
    # independently-oracled global ranking
    universe = rd.topk(QUERY, len(rows))
    attr = {r["doc_id"]: r for r in rows}
    for b in got:
        want = [h for h in universe
                if attr[h[0]]["lang"] == b["value"]][:4]
        assert b["hits"] == want, b["value"]
        # hits ordered by the engine convention and non-empty
        assert b["hits"] == sorted(b["hits"],
                                   key=lambda h: (-round(h[1], 9), h[0]))
        assert 1 <= len(b["hits"]) <= 4
    # attrs compose: restrict to one lang → one bucket, == filtered_topk
    got_f = rd.top_hits_by(QUERY, "lang", 3, 5, attrs=[("lang", "de")])
    assert len(got_f) == 1 and got_f[0]["value"] == "de"
    assert got_f[0]["hits"] == rd.filtered_topk(QUERY, 5, "lang", "de")
    # weights thread through (boost changes the ranking like topk)
    got_w = rd.top_hits_by(["w7", "w15"], "lang", 3, 4,
                           weights=[5.0, 1.0])
    uw = rd.topk(["w7", "w15"], len(rows), weights=[5.0, 1.0])
    for b in got_w:
        assert b["hits"] == [h for h in uw
                             if attr[h[0]]["lang"] == b["value"]][:4]
    # empties and degenerate args
    assert rd.top_hits_by(["zzz"], "lang") == []
    assert rd.top_hits_by(QUERY, "lang", n_buckets=0) == []
    assert rd.top_hits_by(QUERY, "lang", k_per_bucket=0) == []


def test_top_hits_by_served_equals_local(numfx, ray_session):
    from wikirec_ray.state.server import RangeShardedQueryEngine

    rd = IndexReader(numfx["idx"])
    eng = RangeShardedQueryEngine(numfx["idx"], pool_size=3)
    try:
        for terms, attrs in [
            (QUERY, None),
            (QUERY, [("n_tok", ">=20")]),
            (["w0", "w0", "w7"], None),  # duplicate-terms parity
            (["zzz"], None),
        ]:
            got = eng.top_hits_by(terms, "lang", 3, 4, attrs=attrs)
            want = rd.top_hits_by(terms, "lang", 3, 4, attrs=attrs)
            assert [(b["value"], b["n_docs"]) for b in got] == \
                [(b["value"], b["n_docs"]) for b in want]
            for g, w in zip(got, want):
                assert [h[0] for h in g["hits"]] == [h[0] for h in w["hits"]]
                for gh, wh in zip(g["hits"], w["hits"]):
                    assert gh[1] == pytest.approx(wh[1], abs=1e-9)
        # high-cardinality column: buckets still bounded at n_buckets
        got = eng.top_hits_by(QUERY, "n_tok", 5, 2)
        assert got == rd.top_hits_by(QUERY, "n_tok", 5, 2) and len(got) == 5
    finally:
        eng.shutdown()


def test_percentiles_matches_numpy_and_duckdb(numfx):
    import duckdb

    rows = numfx["rows"]
    rd = IndexReader(numfx["idx"])
    attr = {r["doc_id"]: r for r in rows}
    vals = np.array([float(attr[d]["n_tok"])
                     for d in _brute_matched(rows, QUERY)])

    percents = (0.0, 25.0, 50.0, 75.0, 95.0, 99.0, 100.0)
    got = rd.percentiles(QUERY, "n_tok", percents)
    # EXACT numpy.percentile equality (linear interpolation) — not approx
    for p in percents:
        assert got[p] == float(np.percentile(vals, p)), p
    assert got[0.0] == vals.min() and got[100.0] == vals.max()

    # DuckDB quantile_cont replay (same linear interpolation)
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "text": [r["text"] for r in rows],
        "n_tok": [r["n_tok"] for r in rows],
    }))
    terms = ", ".join(f"('{t}')" for t in sorted(set(QUERY)))
    want = con.execute(f"""
        WITH tok AS (
            SELECT doc_id, t AS term FROM (SELECT doc_id,
                unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
                FROM documents) WHERE t <> ''
        ),
        q(term) AS (VALUES {terms}),
        m AS (SELECT DISTINCT doc_id FROM tok JOIN q USING (term))
        SELECT quantile_cont(v, [0.25, 0.5, 0.75]) FROM (
            SELECT TRY_CAST(d.n_tok AS DOUBLE) AS v
            FROM m JOIN documents d USING (doc_id)
        )
    """).fetchone()[0]
    for p, w in zip((25.0, 50.0, 75.0), want):
        assert got[p] == pytest.approx(float(w), rel=1e-12), p

    # attrs compose
    sub = np.array([float(attr[d]["n_tok"])
                    for d in _brute_matched(rows, QUERY)
                    if attr[d]["lang"] == "de"])
    got_f = rd.percentiles(QUERY, "n_tok", (50.0,), attrs=[("lang", "de")])
    assert got_f[50.0] == float(np.percentile(sub, 50.0))
    # empty / non-numeric: all-None shape
    assert rd.percentiles(["zzz"], "n_tok", (50.0,)) == {50.0: None}
    assert rd.percentiles(QUERY, "lang", (50.0,)) == {50.0: None}
    # out-of-range percents raise
    for bad in (-1.0, 100.5):
        with pytest.raises(ValueError):
            rd.percentiles(QUERY, "n_tok", (bad,))


def test_percentiles_served_equals_local(numfx, ray_session):
    from wikirec_ray.state.server import RangeShardedQueryEngine

    rd = IndexReader(numfx["idx"])
    eng = RangeShardedQueryEngine(numfx["idx"], pool_size=3)
    percents = (10.0, 50.0, 90.0, 99.0)
    try:
        for terms, attrs in [
            (QUERY, None),
            (QUERY, [("lang", "en")]),
            (QUERY, [("n_tok", ">=20")]),
            (["w0", "w0", "w7"], None),
            (["zzz"], None),
        ]:
            # bit-for-bit: both sides run the same weighted kernel
            assert eng.percentiles(terms, "n_tok", percents, attrs=attrs) \
                == rd.percentiles(terms, "n_tok", percents, attrs=attrs)
        assert eng.percentiles(QUERY, "lang", (50.0,)) == {50.0: None}
        with pytest.raises(ValueError):
            eng.percentiles(QUERY, "n_tok", (101.0,))
    finally:
        eng.shutdown()


def test_multi_terms_matches_brute_and_duckdb(numfx, ray_session):
    import duckdb

    from wikirec_ray.state.server import RangeShardedQueryEngine

    rows = numfx["rows"]
    attr = {r["doc_id"]: r for r in rows}
    rd = IndexReader(numfx["idx"])

    def brute(terms, cols, k, pred=None):
        counts = {}
        for d in _brute_matched(rows, terms):
            r = attr[d]
            if pred is not None and not pred(r):
                continue
            t = tuple(r[c] for c in cols)
            counts[t] = counts.get(t, 0) + 1
        return sorted(counts.items(), key=lambda it: (-it[1], it[0]))[:k]

    got = rd.multi_terms(QUERY, ["lang", "n_tok"], 12)
    assert got == brute(QUERY, ["lang", "n_tok"], 12)
    # column order matters (distinct composite keys)
    assert rd.multi_terms(QUERY, ["n_tok", "lang"], 12) == \
        brute(QUERY, ["n_tok", "lang"], 12)
    # attrs compose; empties; validation
    assert rd.multi_terms(QUERY, ["lang", "n_tok"], 12,
                          attrs=[("lang", "de")]) == \
        brute(QUERY, ["lang", "n_tok"], 12,
              pred=lambda r: r["lang"] == "de")
    assert rd.multi_terms(["zzz"], ["lang", "n_tok"]) == []
    assert rd.multi_terms(QUERY, ["lang", "n_tok"], k=0) == []
    with pytest.raises(ValueError):
        rd.multi_terms(QUERY, ["lang"])

    # DuckDB replay: GROUP BY both columns over the OR-match join
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "text": [r["text"] for r in rows],
        "lang": [r["lang"] for r in rows],
        "n_tok": [r["n_tok"] for r in rows],
    }))
    terms = ", ".join(f"('{t}')" for t in sorted(set(QUERY)))
    want = con.execute(f"""
        WITH tok AS (
            SELECT doc_id, t AS term FROM (SELECT doc_id,
                unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
                FROM documents) WHERE t <> ''
        ),
        q(term) AS (VALUES {terms}),
        m AS (SELECT DISTINCT doc_id FROM tok JOIN q USING (term))
        SELECT d.lang, d.n_tok, COUNT(*) FROM m
        JOIN documents d USING (doc_id)
        GROUP BY 1, 2 ORDER BY COUNT(*) DESC, d.lang, d.n_tok
        LIMIT 12
    """).fetchall()
    assert got == [((w[0], w[1]), int(w[2])) for w in want]

    eng = RangeShardedQueryEngine(numfx["idx"], pool_size=3)
    try:
        for terms, attrs in [
            (QUERY, None),
            (QUERY, [("n_tok", ">=20")]),
            (["w0", "w0", "w7"], None),
            (["zzz"], None),
        ]:
            assert eng.multi_terms(terms, ["lang", "n_tok"], 12,
                                   attrs=attrs) == \
                rd.multi_terms(terms, ["lang", "n_tok"], 12, attrs=attrs)
        with pytest.raises(ValueError):
            eng.multi_terms(QUERY, ["lang"])
    finally:
        eng.shutdown()


def test_rare_terms_matches_brute(numfx, ray_session):
    from wikirec_ray.state.server import RangeShardedQueryEngine

    rows = numfx["rows"]
    attr = {r["doc_id"]: r for r in rows}
    rd = IndexReader(numfx["idx"])

    def brute(terms, col, k, maxdc=None, pred=None):
        counts = {}
        for d in _brute_matched(rows, terms):
            r = attr[d]
            if pred is not None and not pred(r):
                continue
            counts[r[col]] = counts.get(r[col], 0) + 1
        return sorted(
            ((v, n) for v, n in counts.items()
             if maxdc is None or n <= maxdc),
            key=lambda it: (it[1], it[0]),
        )[:k]

    got = rd.rare_terms(QUERY, "n_tok", 8)
    assert got == brute(QUERY, "n_tok", 8)
    assert got == sorted(got, key=lambda it: (it[1], it[0]))
    # the rare end is the facet end reversed over the full value set
    full = rd.rare_terms(QUERY, "lang", 100)
    assert sorted(full, key=lambda it: (-it[1], it[0])) == \
        rd.facet_counts(QUERY, "lang", 100)
    # max_doc_count caps; attrs compose; validation
    assert rd.rare_terms(QUERY, "n_tok", 100, max_doc_count=2) == \
        brute(QUERY, "n_tok", 100, maxdc=2)
    assert rd.rare_terms(QUERY, "n_tok", 8, attrs=[("lang", "de")]) == \
        brute(QUERY, "n_tok", 8, pred=lambda r: r["lang"] == "de")
    assert rd.rare_terms(["zzz"], "n_tok") == []
    assert rd.rare_terms(QUERY, "n_tok", k=0) == []
    with pytest.raises(ValueError):
        rd.rare_terms(QUERY, "n_tok", max_doc_count=0)

    eng = RangeShardedQueryEngine(numfx["idx"], pool_size=3)
    try:
        for terms, maxdc, attrs in [
            (QUERY, None, None),
            (QUERY, 2, None),
            (QUERY, None, [("lang", "en")]),
            (["w0", "w0", "w7"], None, None),
            (["zzz"], None, None),
        ]:
            assert eng.rare_terms(terms, "n_tok", 8, max_doc_count=maxdc,
                                  attrs=attrs) == \
                rd.rare_terms(terms, "n_tok", 8, max_doc_count=maxdc,
                              attrs=attrs), (terms, maxdc, attrs)
        with pytest.raises(ValueError):
            eng.rare_terms(QUERY, "n_tok", max_doc_count=0)
    finally:
        eng.shutdown()


def test_attr_values_hit_decoration(numfx, ray_session):
    from wikirec_ray.state.server import RangeShardedQueryEngine

    rows = numfx["rows"]
    attr = {r["doc_id"]: r for r in rows}
    rd = IndexReader(numfx["idx"])
    hits = rd.topk(QUERY, 7)
    ids = [d for d, _ in hits]

    got = rd.attr_values(ids, ["lang", "n_tok"])
    assert set(got) == set(ids)
    for d in ids:
        assert got[d] == {"lang": attr[d]["lang"],
                          "n_tok": attr[d]["n_tok"]}
    assert rd.attr_values([], ["lang"]) == {}
    # a doc outside the sidecar fails loudly
    with pytest.raises(RuntimeError):
        rd.attr_values([ids[0] + 1], ["lang"])  # ID_STRIDE gaps

    eng = RangeShardedQueryEngine(numfx["idx"], pool_size=3)
    try:
        assert eng.attr_values(ids, ["lang", "n_tok"]) == got
        assert eng.attr_values([], ["lang"]) == {}
        with pytest.raises(RuntimeError):
            eng.attr_values([ids[0] + 1], ["lang"])
    finally:
        eng.shutdown()


def test_weighted_percentiles_property_vs_numpy():
    """The shared percentile kernel must equal numpy.percentile on the
    EXPANDED multiset for arbitrary (values, counts, percent) inputs —
    hypothesis sweeps the space the fixture corpus cannot."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from wikirec_ray.pipelines.query import _weighted_percentiles

    @settings(max_examples=200, deadline=None)
    @given(
        pairs=st.lists(
            st.tuples(
                st.floats(-1e6, 1e6, allow_nan=False).map(
                    lambda v: round(v, 3)),
                st.integers(1, 7),
            ),
            min_size=1, max_size=20, unique_by=lambda p: p[0],
        ),
        p=st.floats(0.0, 100.0, allow_nan=False),
    )
    def check(pairs, p):
        pairs.sort()
        vals = np.array([v for v, _ in pairs], np.float64)
        counts = np.array([c for _, c in pairs], np.int64)
        expanded = np.repeat(vals, counts)
        got = _weighted_percentiles(vals, counts, (p,))[p]
        assert got == pytest.approx(
            float(np.percentile(expanded, p)), rel=1e-12, abs=1e-12)

    check()


def test_score_significant_properties():
    """JLH kernel invariants on arbitrary fg/bg count tables: output keys
    are the positive-lift subset of fg, scores positive, order is
    (round(score, 9) desc, value asc), k cuts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from wikirec_ray.pipelines.query import _score_significant

    @settings(max_examples=200, deadline=None)
    @given(
        table=st.dictionaries(
            st.text(st.characters(min_codepoint=97, max_codepoint=122),
                    min_size=1, max_size=4),
            st.tuples(st.integers(1, 50), st.integers(0, 200)),
            min_size=1, max_size=15,
        ),
        k=st.integers(1, 8),
    )
    def check(table, k):
        fg = {v: f for v, (f, _) in table.items()}
        bg = {v: f + extra for v, (f, extra) in table.items()}
        n_fg = sum(fg.values())
        n_bg = sum(bg.values()) + 17  # other docs outside every fg value
        out = _score_significant(fg, n_fg, bg, n_bg, k)
        assert len(out) <= k
        seen = set()
        for b in out:
            v = b["value"]
            assert v in fg and v not in seen
            seen.add(v)
            assert b["n_docs"] == fg[v] and b["bg_docs"] == bg[v]
            assert b["n_docs"] / n_fg > b["bg_docs"] / n_bg
            assert b["score"] > 0
        keys = [(-round(b["score"], 9), b["value"]) for b in out]
        assert keys == sorted(keys)
        # k=len(fg) returns every positive-lift value
        full = _score_significant(fg, n_fg, bg, n_bg, len(fg))
        assert {b["value"] for b in full} == {
            v for v in fg if fg[v] / n_fg > bg[v] / n_bg
        }

    check()


def test_cardinality_matches_brute_and_duckdb(numfx):
    import duckdb

    rows = numfx["rows"]
    rd = IndexReader(numfx["idx"])

    def brute(terms, col, pred=None):
        attr = {r["doc_id"]: r for r in rows}
        return len({attr[d][col] for d in _brute_matched(rows, terms)
                    if pred is None or pred(attr[d])})

    got = rd.cardinality(QUERY, "lang")
    assert got == brute(QUERY, "lang") == 3
    # works on ANY column (raw stored strings — no numeric parse)
    assert rd.cardinality(QUERY, "n_tok") == brute(QUERY, "n_tok")
    # attrs compose
    assert rd.cardinality(QUERY, "n_tok", attrs=[("lang", "de")]) == \
        brute(QUERY, "n_tok", pred=lambda r: r["lang"] == "de")
    # empty match set
    assert rd.cardinality(["zzz"], "lang") == 0
    assert rd.cardinality([], "lang") == 0

    # DuckDB replay: COUNT(DISTINCT value) over the OR-match join
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "text": [r["text"] for r in rows],
        "n_tok": [r["n_tok"] for r in rows],
    }))
    terms = ", ".join(f"('{t}')" for t in sorted(set(QUERY)))
    want = con.execute(f"""
        WITH tok AS (
            SELECT doc_id, t AS term FROM (SELECT doc_id,
                unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
                FROM documents) WHERE t <> ''
        ),
        q(term) AS (VALUES {terms}),
        m AS (SELECT DISTINCT doc_id FROM tok JOIN q USING (term))
        SELECT COUNT(DISTINCT d.n_tok)
        FROM m JOIN documents d USING (doc_id)
    """).fetchone()[0]
    assert rd.cardinality(QUERY, "n_tok") == int(want)


def test_extended_and_histogram_served_equals_local(numfx, ray_session):
    from wikirec_ray.state.server import RangeShardedQueryEngine

    rd = IndexReader(numfx["idx"])
    eng = RangeShardedQueryEngine(numfx["idx"], pool_size=3)
    try:
        for terms, attrs in [
            (QUERY, None),
            (QUERY, [("lang", "en")]),
            (QUERY, [("n_tok", ">=20")]),
            (["w0", "w0", "w7"], None),  # duplicate-terms parity
            (["zzz"], None),
        ]:
            got = eng.extended_stats(terms, "n_tok", attrs=attrs)
            want = rd.extended_stats(terms, "n_tok", attrs=attrs)
            assert got["count"] == want["count"]
            for key in ("sum", "sum_of_squares", "min", "max", "avg",
                        "variance", "std_deviation"):
                if want[key] is None:
                    assert got[key] is None, key
                else:
                    assert got[key] == pytest.approx(want[key],
                                                     rel=1e-12), key
            assert eng.histogram(terms, "n_tok", 5.0, attrs=attrs) == \
                rd.histogram(terms, "n_tok", 5.0, attrs=attrs)
            for ccol in ("lang", "n_tok"):
                assert eng.cardinality(terms, ccol, attrs=attrs) == \
                    rd.cardinality(terms, ccol, attrs=attrs), (terms, ccol)
        assert eng.extended_stats(QUERY, "lang") == _EMPTY_EXT
        assert eng.histogram(QUERY, "lang", 5.0) == []
        with pytest.raises(ValueError):
            eng.histogram(QUERY, "n_tok", 0.0)
    finally:
        eng.shutdown()


# ---------------------------------------------------------------------------
# field collapsing (Elasticsearch `collapse`: best doc per attribute value)
# ---------------------------------------------------------------------------


def _brute_collapsed(full, attr, col, k, after=None):
    """Walk the engine-order full ranking, keep the first doc per value."""
    seen, out = set(), []
    for d, s in full:
        if after is not None and not (
            round(s, 9) < round(after[1], 9)
            or (round(s, 9) == round(after[1], 9) and d > after[0])
        ):
            continue
        v = attr[d][col]
        if v not in seen:
            seen.add(v)
            out.append((d, s, v))
            if len(out) == k:
                break
    return out


def test_collapsed_topk_matches_brute(fx):
    rd = IndexReader(fx["idx"])
    full = rd.topk(QUERY, N_DOCS)
    for col, k in (("lang", 2), ("lang", 3), ("source", 4), ("source", 5)):
        assert rd.collapsed_topk(QUERY, k, col) == \
            _brute_collapsed(full, fx["attr"], col, k)
    # k beyond the distinct value count returns every value once
    got = rd.collapsed_topk(QUERY, 50, "lang")
    assert got == _brute_collapsed(full, fx["attr"], "lang", 50)
    assert sorted(v for _, _, v in got) == sorted(LANGS)
    # composes with attribute filters: collapse-by-source over lang=de docs
    filt = [(d, s) for d, s in full if fx["attr"][d]["lang"] == "de"]
    assert rd.collapsed_topk(QUERY, 4, "source", attrs=[("lang", "de")]) \
        == _brute_collapsed(filt, fx["attr"], "source", 4)
    # absent terms / k=0
    assert rd.collapsed_topk(["zzz"], 5, "lang") == []
    assert rd.collapsed_topk(QUERY, 0, "lang") == []


def test_collapsed_after_pages_underlying_order(fx):
    rd = IndexReader(fx["idx"])
    full = rd.topk(QUERY, N_DOCS)
    p1 = rd.collapsed_topk(QUERY, 2, "source")
    cursor = (p1[-1][0], p1[-1][1])
    p2 = rd.collapsed_topk(QUERY, 2, "source", after=cursor)
    assert p2 == _brute_collapsed(full, fx["attr"], "source", 2, cursor)
    # the documented ES contract: a page-1 key MAY reappear on page 2
    # with its next-best doc (strictly-after filter, then collapse) —
    # just pin that page 2 never repeats a page-1 DOC
    assert not {d for d, _, _ in p1} & {d for d, _, _ in p2}


def test_collapsed_kernel_escalates_preselect():
    """A head of 500 same-key docs forces the tie-inclusive preselect
    (m = max(4k, 64)) through two x4 escalations before k distinct keys
    surface — the loop branch no small corpus reaches."""
    from wikirec_ray.pipelines.query import collapsed_topk_from_dense

    n = 1000
    scores = np.linspace(2.0, 1.0, n)  # doc 0 best, strictly decreasing
    codes = np.zeros(n, np.int64)
    codes[600] = 1
    codes[900] = 2
    got = collapsed_topk_from_dense(scores, 3, lambda d: codes[d])
    assert [(d, c) for d, _, c in got] == [(0, 0), (600, 1), (900, 2)]
    # ties settle doc-ascending inside one key and across keys
    flat = np.full(16, 1.0)
    fcodes = np.asarray([i % 4 for i in range(16)], np.int64)
    got = collapsed_topk_from_dense(flat, 4, lambda d: fcodes[d])
    assert [(d, c) for d, _, c in got] == [(0, 0), (1, 1), (2, 2), (3, 3)]


def test_collapsed_served_equals_local(fx, ray_session):
    from wikirec_ray.state.server import RangeShardedQueryEngine

    rd = IndexReader(fx["idx"])
    eng = RangeShardedQueryEngine(fx["idx"], pool_size=3)
    try:
        for col, k in (("lang", 3), ("source", 3), ("source", 50)):
            assert eng.collapsed_topk(QUERY, k, col) == \
                rd.collapsed_topk(QUERY, k, col)
        # duplicate-occurrence parity (engine-wide contract)
        dup = ["w0", "w0", "w7"]
        assert eng.collapsed_topk(dup, 4, "source") == \
            rd.collapsed_topk(dup, 4, "source")
        assert eng.collapsed_topk(dup, 4, "source") != \
            rd.collapsed_topk(["w0", "w7"], 4, "source")
        # attrs + after compose served too
        p1 = eng.collapsed_topk(QUERY, 2, "source", attrs=[("lang", "de")])
        cur = (p1[-1][0], p1[-1][1])
        assert eng.collapsed_topk(
            QUERY, 2, "source", attrs=[("lang", "de")], after=cur
        ) == rd.collapsed_topk(
            QUERY, 2, "source", attrs=[("lang", "de")], after=cur)
        assert eng.collapsed_topk(["zzz"], 5, "lang") == []
    finally:
        eng.shutdown()


def test_collapsed_stale_sidecar_fails_loudly(fx, tmp_path, ray_session):
    import shutil

    from wikirec_ray.stages.doc_meta import build_doc_meta

    idx = str(tmp_path / "stale_collapse")
    shutil.copytree(fx["idx"], idx)
    shutil.rmtree(os.path.join(idx, "meta"))
    build_doc_meta(_ds(fx["rows"][:10], ("doc_id", "lang", "source")), idx,
                   cols=["lang", "source"])
    rd = IndexReader(idx)
    with pytest.raises(RuntimeError, match="re-run build_doc_meta"):
        rd.collapsed_topk(QUERY, 5, "lang")
    from wikirec_ray.state.server import RangeShardedQueryEngine

    eng = RangeShardedQueryEngine(idx, pool_size=2)
    try:
        with pytest.raises(Exception, match="re-run build_doc_meta"):
            eng.collapsed_topk(QUERY, 5, "lang")
    finally:
        eng.shutdown()


def test_collapse_on_search_surface_and_cli(fx, ray_session, capsys):
    from wikirec_ray.pipelines.query import search_with_terms

    rd = IndexReader(fx["idx"])
    # the query-string surface composes collapse with parse + filters
    hits, positive, phrase = search_with_terms(
        rd, "w0 w7 w15", 4, collapse="source")
    assert hits == rd.collapsed_topk(QUERY, 4, "source")
    assert positive == QUERY and phrase is None
    hits2, _, _ = search_with_terms(
        rd, "lang:de w0 w7 w15", 4, collapse="source")
    assert hits2 == rd.collapsed_topk(
        QUERY, 4, "source", attrs=[("lang", "de")])
    # collapse on a non-dense parse mode fails loudly, never silently
    # returns uncollapsed pages
    with pytest.raises(ValueError, match="plain/expanded BM25"):
        search_with_terms(rd, '"w0 w7"', 4, collapse="source")

    # CLI: --collapse attaches the collapse value per hit; an unknown
    # column is a named error
    import json as _json

    from wikirec_ray.__main__ import main

    rc = main(["query", "--index", fx["idx"], "w0 w7 w15", "-k", "4",
               "--collapse", "source"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [(h["doc_id"], h["score"], h["collapse_value"])
            for h in out["hits"]] == rd.collapsed_topk(QUERY, 4, "source")
    with pytest.raises(SystemExit, match="not in the metadata sidecar"):
        main(["query", "--index", fx["idx"], "w0", "--collapse", "nope"])
