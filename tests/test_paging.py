"""search_after pagination (Elasticsearch deep paging): every top-k
route accepts an ``after`` cursor — the previous page's last hit ``(doc_id, score)`` — and returns only docs
STRICTLY after it in the engine-wide (round(score, 9) desc, doc_id asc)
total order.

Oracle: page-walking with the LAST hit of each page as the next cursor
must reproduce one big top-k exactly, page-boundary ties included —
checked on every route (exact, WAND router, boolean, fuzzy, phrase,
sloppy, NEAR, filtered) and on the served engine, plus a direct DuckDB
replay of page 2 as rows k+1..2k of the global ordering.
"""

import os

import numpy as np
import pytest

from wikirec_ray.pipelines.query import (
    IndexReader,
    topk_from_dense,
    topk_from_sparse,
)

QUERY = ["spark", "join", "table"]


def _walk(fn, page, n_pages):
    """Page-walk: repeated fn(after=cursor) pages concatenated."""
    out, after = [], None
    for _ in range(n_pages):
        hits = fn(page, after)
        out.extend(hits)
        if len(hits) < page:
            break
        after = hits[-1]
    return out


def test_funnels_after_semantics():
    # the cursor IS a hit tuple (doc_id, score) — the previous page's last
    # element passed back verbatim
    scores = np.array([0.0, 3.0, 1.0, 3.0, 2.0, 3.0])
    full = topk_from_dense(scores, 10)
    assert full == [(1, 3.0), (3, 3.0), (5, 3.0), (4, 2.0), (2, 1.0)]
    # cursor mid-tie: only later doc_ids at the same score, then lower
    assert topk_from_dense(scores, 10, after=(3, 3.0)) == full[2:]
    assert topk_from_dense(scores, 10, after=(5, 3.0)) == full[3:]
    assert topk_from_dense(scores, 10, after=(2, 1.0)) == []
    # k still caps after the cursor filter
    assert topk_from_dense(scores, 1, after=(1, 3.0)) == [(3, 3.0)]
    # sparse twin agrees
    ids = np.array([1, 3, 4, 5, 2, 3], np.int64)
    cs = np.array([3.0, 1.5, 2.0, 3.0, 1.0, 1.5])
    assert topk_from_sparse(ids, cs, 10, after=(3, 3.0)) == \
        topk_from_dense(scores, 10, after=(3, 3.0))
    # a cursor below every score -> empty page (end of results)
    assert topk_from_sparse(ids, cs, 10, after=(0, 0.0)) == []


def test_page_walk_every_local_route(built_index):
    rd = IndexReader(built_index[0])
    routes = {
        "topk": lambda p, a: rd.topk(QUERY, p, after=a),
        "wand": lambda p, a: rd.topk_wand(QUERY, p, after=a),
        "boolean": lambda p, a: rd.boolean_topk(
            ["spark"], ["join"], ["slow"], p, after=a
        ),
        "fuzzy": lambda p, a: rd.fuzzy_topk(["spark", "jion"], p, after=a),
    }
    full = {
        "topk": rd.topk(QUERY, 60),
        "wand": rd.topk_wand(QUERY, 60),
        "boolean": rd.boolean_topk(["spark"], ["join"], ["slow"], 60),
        "fuzzy": rd.fuzzy_topk(["spark", "jion"], 60),
    }
    for name, fn in routes.items():
        want = full[name][:40]
        assert want, name
        for page in (1, 3, 7):
            got = _walk(fn, page, (len(want) + page - 1) // page)
            assert got[: len(want)] == want, (name, page)


def test_page_walk_positional_routes(ray_session, sf_dir, tmp_path_factory):
    import ray.data

    from wikirec_ray.stages.index_build import build_index

    idx = str(tmp_path_factory.mktemp("paging_pos"))
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(ds, idx, resume=False, store_positions=True,
                precompute_bigrams=[("spark", "join")])
    rd = IndexReader(idx)
    routes = {
        "phrase": lambda p, a: rd.phrase_topk(["spark", "join"], p, after=a),
        "sloppy": lambda p, a: rd.sloppy_phrase_topk(
            ["spark", "join"], p, slop=3, after=a
        ),
        "near": lambda p, a: rd.near_topk(
            ["spark", "join"], p, window=5, after=a
        ),
    }
    full = {
        "phrase": rd.phrase_topk(["spark", "join"], 50),
        "sloppy": rd.sloppy_phrase_topk(["spark", "join"], 50, slop=3),
        "near": rd.near_topk(["spark", "join"], 50, window=5),
    }
    # the two-term phrase goes through the precomputed fast path here;
    # paging must hold there too
    assert "spark join" in rd.bigrams
    for name, fn in routes.items():
        want = full[name]
        assert want, name
        for page in (2, 5):
            got = _walk(fn, page, (len(want) + page - 1) // page)
            assert got == want, (name, page)


def test_page_walk_served_equals_local(built_index, ray_session):
    from wikirec_ray.state.server import RangeShardedQueryEngine

    rd = IndexReader(built_index[0])
    eng = RangeShardedQueryEngine(built_index[0], pool_size=3)
    try:
        full = rd.topk(QUERY, 30)
        after = None
        got = []
        for _ in range(6):
            hits = eng.topk(QUERY, 5, after=after)
            assert hits == rd.topk(QUERY, 5, after=after)
            if not hits:
                break
            got.extend(hits)
            after = hits[-1]
        assert got == full[: len(got)] and len(got) >= 25
        b_local = rd.boolean_topk(["spark"], ["join"], (), 5,
                                  after=full[4])
        assert eng.boolean_topk(["spark"], ["join"], (), 5,
                                after=full[4]) == b_local
    finally:
        eng.shutdown()


def test_page2_matches_duckdb_rows_k_to_2k(built_index, sf_dir):
    import duckdb

    rd = IndexReader(built_index[0])
    k = 10
    page1 = rd.topk(QUERY, k)
    page2 = rd.topk(QUERY, k, after=page1[-1])
    terms = ", ".join(f"('{t}')" for t in QUERY)
    k1, b = 1.5, 0.75
    con = duckdb.connect()
    want = con.execute(f"""
        WITH documents AS (
            SELECT * FROM read_parquet('{os.path.join(sf_dir, "documents.parquet")}')
        ),
        tok AS (
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
        SELECT doc_id, round(score, 9) FROM scored
        WHERE round(score, 9) > 0
        ORDER BY round(score, 9) DESC, doc_id
        LIMIT {k} OFFSET {k}
    """).fetchall()
    assert page2 == [(int(d), float(s)) for d, s in want]


def test_search_string_pages_every_mode(built_index, ray_session,
                                         sf_dir, tmp_path_factory):
    """The search() query-string surface pages: the SAME query string with
    after=prev_page[-1] walks the full ranking on every parse mode, local
    and through the replicated coordinator tier."""
    import os as _os

    import ray.data

    from wikirec_ray.pipelines.query import search
    from wikirec_ray.stages.index_build import build_index
    from wikirec_ray.state.server import ReplicatedSearchTier

    idx = str(tmp_path_factory.mktemp("paging_search"))
    ds = ray.data.read_parquet(
        _os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    build_index(ds, idx, resume=False, store_positions=True)
    rd = IndexReader(idx)
    queries = [
        "spark join table",          # bm25 (wand router -> exact w/ after)
        '"spark join"',              # exact phrase
        '"spark join"~3',            # sloppy
        "NEAR/5(spark join)",        # proximity
        "+spark -slow join",         # boolean
        "spark jion~",               # fuzzy expansion
    ]
    for q in queries:
        full = search(rd, q, 40)
        assert full, q
        got = _walk(lambda p_, a: search(rd, q, p_, after=a), 7,
                    (len(full) + 6) // 7)
        # the last 7-wide page may step past the 40-cap when the ranking
        # is deeper — the walked prefix must match exactly
        assert got[: len(full)] == full and len(got) >= len(full), q
    tier = ReplicatedSearchTier(idx, n_coordinators=2, pool_size=2)
    try:
        q = "spark join table"
        full = search(rd, q, 15)
        page1 = tier.search(q, 5, client_id=0)
        page2 = tier.search(q, 5, client_id=1, after=page1[-1])
        page3 = tier.search(q, 5, client_id=2, after=page2[-1])
        assert page1 + page2 + page3 == full
    finally:
        tier.shutdown()


def test_after_respects_attrs_and_guards(built_index):
    rd = IndexReader(built_index[0])
    # after composes with nothing to return: cursor past the end
    tail = rd.topk(QUERY, 10_000)[-1]
    assert rd.topk(QUERY, 5, after=tail) == []
    # zero/negative cursor scores page nothing (only rounded>0 qualify)
    assert rd.topk(QUERY, 5, after=(-1, 0.0)) == []
    # wand with after routes through the exact dense path (same results)
    assert rd.topk_wand(QUERY, 5, after=rd.topk(QUERY, 3)[-1]) == \
        rd.topk(QUERY, 5, after=rd.topk(QUERY, 3)[-1])
