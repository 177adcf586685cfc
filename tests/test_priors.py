"""Static-prior ranking (ES function_score, boost_mode=sum): BM25 decides
membership, ``prior_weight × sidecar prior`` re-ranks — against a brute
NumPy replay AND a DuckDB replay with the strict-numeric TRY_CAST guard."""

import math
import os

import numpy as np
import pytest

from wikirec_ray.pipelines.query import IndexReader

K = 15
PRIOR_W = 0.001  # n_chars runs to ~10^3; w scales it into bm25's range


@pytest.fixture(scope="module")
def prior_fx(ray_session, sf_dir, tmp_path_factory):
    """An own index (so the shared session fixture's sidecar surface stays
    untouched) + a sidecar with a numeric (n_chars) and a non-numeric
    (lang) column + the oracle maps."""
    import pyarrow.parquet as pq
    import ray.data

    from wikirec_ray.stages.doc_meta import build_doc_meta
    from wikirec_ray.stages.index_build import build_index

    index_dir = str(tmp_path_factory.mktemp("priors") / "idx")
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(docs, index_dir, resume=False)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )
    build_doc_meta(ds, index_dir, ["lang", "n_chars"], resume=False)
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    n_chars = dict(zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()))
    langs = dict(zip(t["doc_id"].to_pylist(), t["lang"].to_pylist()))
    return IndexReader(index_dir), n_chars, langs


def brute_prior_topk(corpus_tokens, priors, terms, k, w,
                     allowed=None, weights=None):
    """Unrounded BM25 + w·prior, rounded ONCE like the engine (a reused
    rounded-bm25 brute would double-round at the boundary ulps)."""
    from wikirec_ray.schema import BM25_B, BM25_K1

    weights = weights or [1.0] * len(terms)
    docs = sorted(corpus_tokens)
    dls = np.array([len(corpus_tokens[d]) for d in docs], float)
    avgdl = dls.mean()
    n = len(docs)
    scores = np.zeros(n)
    agg = {}
    for t, ww in zip(terms, weights):
        agg[t] = agg.get(t, 0.0) + ww
    for t, ww in agg.items():
        df = sum(1 for d in docs if t in set(corpus_tokens[d]))
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * ww
        tf = np.array([corpus_tokens[d].count(t) for d in docs], float)
        scores += idf * tf * (BM25_K1 + 1) / (
            tf + BM25_K1 * (1 - BM25_B + BM25_B * dls / avgdl)
        )
    scored = [
        (d, round(s + w * float(priors.get(d, 0)), 9))
        for d, s in zip(docs, scores)
        if s > 0 and (allowed is None or d in allowed)
    ]
    scored = [(d, s) for d, s in scored if s > 0]
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def test_prior_topk_equals_brute(prior_fx, corpus_tokens):
    reader, n_chars, _ = prior_fx
    for terms in (["spark", "join"], ["the"], ["vector", "window", "hash"]):
        for w in (PRIOR_W, 0.01, -PRIOR_W):
            got = reader.prior_topk(terms, K, "n_chars", w)
            assert got == brute_prior_topk(
                corpus_tokens, n_chars, terms, K, w
            ), (terms, w)
    # the prior never SELECTS: absent term stays empty whatever the prior
    assert reader.prior_topk(["zzzabsent"], K, "n_chars", 100.0) == []


def test_prior_duckdb_oracle(prior_fx, sf_dir):
    """SQL replay: shared bm25 shape + the guarded TRY_CAST numeric parse
    (the same NUMERIC_GRAMMAR contract range filters pin)."""
    import duckdb

    from wikirec_ray.pipelines.query import NUMERIC_GRAMMAR_RE
    from wikirec_ray.schema import BM25_B, BM25_K1

    reader, _, _ = prior_fx
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"
    )
    terms = ["spark", "join"]
    qvals = ", ".join(f"('{t}')" for t in terms)
    rows = con.execute(f"""
        WITH tok AS (SELECT doc_id, t AS term FROM (SELECT doc_id,
             unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
             FROM documents) WHERE t <> ''),
        tf AS (SELECT doc_id, term, COUNT(*)::DOUBLE AS tf FROM tok
               GROUP BY doc_id, term),
        dl AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM tok
               GROUP BY doc_id),
        st AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl FROM dl),
        dfv AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term),
        q(term) AS (VALUES {qvals}),
        bm25 AS (
            SELECT tf.doc_id,
                   SUM(ln(1 + (st.n - dfv.df + 0.5) / (dfv.df + 0.5))
                       * tf.tf * ({BM25_K1} + 1)
                       / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B}
                          * dl.dl / st.avgdl))) AS score
            FROM q JOIN tf USING (term) JOIN dfv USING (term)
            JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st
            GROUP BY tf.doc_id
        ),
        pri AS (
            SELECT doc_id, CASE WHEN regexp_full_match(
                       CAST(n_chars AS VARCHAR), '{NUMERIC_GRAMMAR_RE}')
                   THEN TRY_CAST(CAST(n_chars AS VARCHAR) AS DOUBLE)
                   ELSE 0.0 END AS p
            FROM documents
        )
        SELECT b.doc_id, ROUND(b.score + {PRIOR_W!r} * COALESCE(pri.p, 0), 9)
               AS score
        FROM bm25 b LEFT JOIN pri USING (doc_id)
        WHERE round(b.score + {PRIOR_W!r} * COALESCE(pri.p, 0), 9) > 0
        ORDER BY score DESC, doc_id LIMIT {K}
    """).fetchall()
    got = reader.prior_topk(terms, K, "n_chars", PRIOR_W)
    assert [(d, round(s, 6)) for d, s in got] == \
        [(d, round(s, 6)) for d, s in rows]


def test_prior_composes(prior_fx, corpus_tokens):
    """attrs filters, search_after paging and query boosts all compose
    with the prior add."""
    reader, n_chars, langs = prior_fx
    de = {d for d, l in langs.items() if l == "de"}
    got = reader.prior_topk(["spark", "join"], K, "n_chars", PRIOR_W,
                            attrs=[("lang", "de")])
    assert got == brute_prior_topk(
        corpus_tokens, n_chars, ["spark", "join"], K, PRIOR_W, allowed=de
    )
    full = reader.prior_topk(["spark", "join"], 30, "n_chars", PRIOR_W)
    p1 = reader.prior_topk(["spark", "join"], 10, "n_chars", PRIOR_W)
    p2 = reader.prior_topk(["spark", "join"], 10, "n_chars", PRIOR_W,
                           after=p1[-1])
    p3 = reader.prior_topk(["spark", "join"], 10, "n_chars", PRIOR_W,
                           after=p2[-1])
    assert p1 + p2 + p3 == full
    terms, w = ["spark", "join", "spark"], [2.0, 1.0, 0.5]
    assert reader.prior_topk(terms, K, "n_chars", PRIOR_W, weights=w) == \
        brute_prior_topk(corpus_tokens, n_chars, terms, K, PRIOR_W,
                         weights=w)


def test_prior_non_numeric_and_validation(prior_fx):
    reader, _, _ = prior_fx
    # a non-numeric column parses to all-zero priors == plain ranking
    assert reader.prior_topk(["spark", "join"], K, "lang", 5.0) == \
        reader.topk(["spark", "join"], K)
    for bad in (math.nan, math.inf):
        with pytest.raises(ValueError, match="finite"):
            reader.prior_topk(["spark"], K, "n_chars", bad)
    with pytest.raises(Exception, match="nope"):
        reader.prior_topk(["spark"], K, "nope", 1.0)
    # eager column validation: a typo'd column raises even when no term
    # matches — a silent [] would look like a valid empty result
    with pytest.raises(Exception, match="nope"):
        reader.prior_topk(["zzzabsent"], K, "nope", 1.0)


def test_prior_served_equals_local(prior_fx, ray_session):
    from wikirec_ray.state.server import RangeShardedQueryEngine

    reader, _, langs = prior_fx
    eng = RangeShardedQueryEngine(reader.index_dir, pool_size=3)
    try:
        for terms, w in ((["spark", "join"], PRIOR_W), (["the"], 0.01),
                         (["vector", "hash"], -PRIOR_W)):
            assert eng.prior_topk(terms, K, "n_chars", w) == \
                reader.prior_topk(terms, K, "n_chars", w), (terms, w)
        assert eng.prior_topk(["spark", "join"], K, "n_chars", PRIOR_W,
                              attrs=[("lang", "de")]) == \
            reader.prior_topk(["spark", "join"], K, "n_chars", PRIOR_W,
                              attrs=[("lang", "de")])
        p1 = reader.prior_topk(["spark", "join"], 10, "n_chars", PRIOR_W)
        assert eng.prior_topk(["spark", "join"], 10, "n_chars", PRIOR_W,
                              after=p1[-1]) == \
            reader.prior_topk(["spark", "join"], 10, "n_chars", PRIOR_W,
                              after=p1[-1])
        # duplicate-terms + weights parity on the served route (the
        # CLAUDE.md rule: every new scoring path needs one) — dup ≡
        # integer boost, fractional weights served == local
        dup = ["spark", "spark", "join"]
        assert eng.prior_topk(dup, K, "n_chars", PRIOR_W) == \
            reader.prior_topk(dup, K, "n_chars", PRIOR_W)
        assert eng.prior_topk(dup, K, "n_chars", PRIOR_W) == \
            eng.prior_topk(["spark", "join"], K, "n_chars", PRIOR_W,
                           weights=[2.0, 1.0])
        fw = ["spark", "join", "spark"]
        assert eng.prior_topk(fw, K, "n_chars", PRIOR_W,
                              weights=[2.0, 1.0, 0.5]) == \
            reader.prior_topk(fw, K, "n_chars", PRIOR_W,
                              weights=[2.0, 1.0, 0.5])
        # eager column validation on the coordinator too
        with pytest.raises(Exception, match="nope"):
            eng.prior_topk(["zzzabsent"], K, "nope", 1.0)
    finally:
        eng.shutdown()


def test_cli_prior_query(prior_fx, capsys):
    """``query --prior COL:W`` routes through prior_topk — local hits equal
    the library ranking (incl. boosts and col:value filters); bad specs
    and unsupported modes are named errors."""
    import json

    from wikirec_ray.__main__ import main

    reader, _, _ = prior_fx
    idx = reader.index_dir

    def run(argv):
        rc = main(argv)
        return rc, json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    rc, res = run(["query", "--index", idx, "--prior",
                   f"n_chars:{PRIOR_W}", "spark join", "-k", "5"])
    assert rc == 0 and res["prior"] == {"col": "n_chars", "weight": PRIOR_W}
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
        reader.prior_topk(["spark", "join"], 5, "n_chars", PRIOR_W)
    rc, res = run(["query", "--index", idx, "--prior",
                   f"n_chars:{PRIOR_W}", "spark^2 join lang:de", "-k", "5"])
    assert rc == 0
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
        reader.prior_topk(["spark", "join"], 5, "n_chars", PRIOR_W,
                          attrs=[("lang", "de")], weights=[2.0, 1.0])
    for bad in (["--prior", "nope:1", "spark"],
                ["--prior", "n_chars", "spark"],
                ["--prior", "n_chars:x", "spark"],
                ["--prior", "n_chars:inf", "spark"],
                ["--prior", "n_chars:1", '"spark join"'],
                ["--prior", "n_chars:1", "--facets", "lang", "spark"],
                ["--prior", "n_chars:1", "--collapse", "lang", "spark"]):
        with pytest.raises(SystemExit, match="prior"):
            main(["query", "--index", idx] + bad)
        capsys.readouterr()
