"""Query-time term boosts (term^2.5) + pseudo-relevance feedback.

Oracle strategy: boosts generalize the engine-wide duplicate-occurrence
contract (["a"], [2.0] must equal ["a", "a"] exactly — both scale idf by
2), so integer-weight cases are pinned against the already-oracle-checked
duplicate route on EVERY engine, and fractional weights against a brute
NumPy BM25 replay over the corpus tokens.  PRF expansion is pinned against
an independent replay of the relevance-model estimate over the exported
texts.
"""
import math
import os
import re

import numpy as np
import pytest

from wikirec_ray.pipelines.query import (
    IndexReader,
    check_weights,
    parse_query,
    prf_expand,
    prf_topk,
    search,
    wand_topk,
)

K = 15


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------


def test_parse_boost_chunks():
    mode, (terms, weights), w = parse_query("spark^2.5 join")
    assert mode == "boosted" and w is None
    assert terms == ["spark", "join"]
    assert weights == [2.5, 1.0]


def test_parse_boost_multi_token_chunk_and_int():
    mode, (terms, weights), _ = parse_query("new-york^3 pizza")
    assert mode == "boosted"
    assert terms == ["new", "york", "pizza"]
    assert weights == [3.0, 3.0, 1.0]


def test_parse_boost_zero_and_overflow_are_literal_text():
    # x^0 and a float()-overflowing digit string are plain text, never a
    # crash (the user-facing-parser contract); the tokenizer strips ^
    mode, terms, _ = parse_query("spark^0 join")
    assert mode == "bm25" and terms == ["spark", "0", "join"]
    mode, terms, _ = parse_query("spark^" + "9" * 400)
    assert mode == "bm25" and terms[0] == "spark"


def test_parse_boost_loses_to_structural_modes():
    # expand operators win a mixed query; ^ inside phrase/NEAR/boolean
    # stays literal (tokenizer-stripped) — today's behavior, unchanged
    mode, _, _ = parse_query("spark^2 tabel~")
    assert mode == "expand"
    mode, _, _ = parse_query('"spark^2 join"')
    assert mode == "phrase"
    mode, _, _ = parse_query("spark^2 +join")
    assert mode == "boolean"


def test_check_weights_validation(built_index):
    reader = IndexReader(built_index[0])
    with pytest.raises(ValueError, match="align"):
        reader.topk(["spark"], 5, weights=[1.0, 2.0])
    for bad in (0.0, -1.0, math.nan, math.inf):
        with pytest.raises(ValueError, match="finite and > 0"):
            reader.topk(["spark"], 5, weights=[bad])
    check_weights(["a"], None)  # None is always fine


# ---------------------------------------------------------------------------
# scoring: every route, both oracles
# ---------------------------------------------------------------------------


def brute_boosted_topk(corpus_tokens, terms, weights, k):
    """Independent NumPy BM25 with per-occurrence boosts over the oracle
    tokenization; same (round(score, 9) desc, doc asc) ranking contract."""
    from wikirec_ray.schema import BM25_B, BM25_K1

    docs = sorted(corpus_tokens)
    dls = np.array([len(corpus_tokens[d]) for d in docs], float)
    avgdl = dls.mean()
    n = len(docs)
    scores = np.zeros(n)
    for t, w in zip(terms, weights):
        df = sum(1 for d in docs if t in set(corpus_tokens[d]))
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * w
        tf = np.array([corpus_tokens[d].count(t) for d in docs], float)
        scores += idf * tf * (BM25_K1 + 1) / (
            tf + BM25_K1 * (1 - BM25_B + BM25_B * dls / avgdl)
        )
    r = np.round(scores, 9)
    order = sorted(
        (i for i in range(n) if r[i] > 0), key=lambda i: (-r[i], docs[i])
    )[:k]
    return [(docs[i], float(r[i])) for i in order]


def test_boosted_equals_brute_oracle(built_index, corpus_tokens):
    reader = IndexReader(built_index[0])
    terms = ["spark", "join", "vector"]
    weights = [2.5, 1.0, 0.25]
    expect = brute_boosted_topk(corpus_tokens, terms, weights, K)
    assert reader.topk(terms, K, weights=weights) == expect
    # WAND route is rank-safe under boosts (bounds linear in idf)
    assert reader.topk_wand(
        terms, K, force_wand=True, weights=weights
    ) == expect


def test_unit_weights_equal_plain(built_index):
    reader = IndexReader(built_index[0])
    for q in (["spark", "join"], ["the"], ["vector", "window", "hash"]):
        plain = reader.topk(q, K)
        assert reader.topk(q, K, weights=[1.0] * len(q)) == plain
        assert reader.topk_wand(
            q, K, force_wand=True, weights=[1.0] * len(q)
        ) == plain


def test_integer_boost_equals_duplicates_every_engine(
    built_index, ray_session
):
    """["a"], [2.0] == ["a", "a"] on the dense path, forced WAND, the
    term-sharded engine, and the range-sharded engine — the boost is the
    multiplicity mechanism generalized."""
    from wikirec_ray.state.server import (
        DistributedQueryEngine,
        RangeShardedQueryEngine,
    )

    index_dir, _ = built_index
    reader = IndexReader(index_dir)
    terms, dup = ["spark", "join"], ["spark", "spark", "join"]
    w = [2.0, 1.0]
    expect = reader.topk(dup, K)
    assert reader.topk(terms, K, weights=w) == expect
    assert reader.topk_wand(terms, K, force_wand=True, weights=w) == expect
    assert wand_topk(reader, terms, K, weights=w) == expect
    e1 = DistributedQueryEngine(index_dir, pool_size=2)
    e2 = RangeShardedQueryEngine(index_dir, pool_size=2)
    try:
        assert e1.topk(terms, K, weights=w) == expect
        assert e2.topk(terms, K, weights=w) == expect
    finally:
        e1.shutdown()
        e2.shutdown()


def test_fractional_boost_served_equals_local(built_index, ray_session):
    from wikirec_ray.state.server import (
        DistributedQueryEngine,
        RangeShardedQueryEngine,
    )

    index_dir, _ = built_index
    reader = IndexReader(index_dir)
    terms = ["spark", "join", "the"]
    w = [3.25, 1.0, 0.5]
    expect = reader.topk(terms, K, weights=w)
    assert expect, "query must hit"
    e1 = DistributedQueryEngine(index_dir, pool_size=2)
    e2 = RangeShardedQueryEngine(index_dir, pool_size=2)
    try:
        assert e1.topk(terms, K, weights=w) == expect
        assert e2.topk(terms, K, weights=w) == expect
    finally:
        e1.shutdown()
        e2.shutdown()


def test_search_string_routes_boosts(built_index):
    reader = IndexReader(built_index[0])
    got = search(reader, "spark^2.5 join", k=K)
    assert got == reader.topk_wand(
        ["spark", "join"], K, weights=[2.5, 1.0]
    )
    # a boost changes the ranking vs the unboosted query somewhere in
    # the corpus (sanity that the weight actually flows)
    assert search(reader, "spark^9 join", k=K) != search(
        reader, "spark join^9", k=K
    )


# ---------------------------------------------------------------------------
# pseudo-relevance feedback
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def prf_store(ray_session, sf_dir, tmp_path_factory):
    import ray.data

    from wikirec_ray.pipelines.export import export_clean_corpus
    from wikirec_ray.state.docstore import DocStore

    out = str(tmp_path_factory.mktemp("prf_export"))
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    export_clean_corpus(ds, out, range_size=64, resume=False)
    return DocStore(out)


def brute_prf_expand(reader, corpus_tokens, terms, fb_docs, fb_terms,
                     fb_weight):
    hits = reader.topk_wand(terms, fb_docs)
    rel = {}
    for d, _ in hits:
        toks = corpus_tokens[d]
        for t in set(toks):
            rel[t] = rel.get(t, 0.0) + toks.count(t) / len(toks)
    scored = sorted(
        (-round(v * reader.idf(t), 9), t)
        for t, v in rel.items()
        if t not in set(terms) and reader.df.get(t, 0) > 0
    )[:fb_terms]
    scored = [(n, t) for n, t in scored if n < 0.0]
    out_t, out_w = list(terms), [1.0] * len(terms)
    if scored:
        best = -scored[0][0]
        for n, t in scored:
            out_t.append(t)
            out_w.append(fb_weight * (-n) / best)
    return out_t, out_w


def test_prf_expand_matches_brute_replay(built_index, prf_store,
                                         corpus_tokens):
    reader = IndexReader(built_index[0])
    terms = ["spark", "join"]
    got_t, got_w = prf_expand(reader, terms, prf_store,
                              fb_docs=5, fb_terms=8, fb_weight=0.5)
    exp_t, exp_w = brute_prf_expand(reader, corpus_tokens, terms, 5, 8, 0.5)
    assert got_t == exp_t
    assert np.allclose(got_w, exp_w, atol=0)
    # shape contract: originals first at weight 1, expansions positive,
    # best expansion exactly fb_weight, and it actually expanded
    assert got_t[: len(terms)] == terms and got_w[: len(terms)] == [1.0, 1.0]
    assert len(got_t) > len(terms)
    assert got_w[len(terms)] == 0.5
    assert all(0 < w <= 0.5 for w in got_w[len(terms):])
    assert not set(got_t[len(terms):]) & set(terms)


def test_prf_topk_is_the_weighted_route(built_index, prf_store):
    reader = IndexReader(built_index[0])
    terms = ["spark", "join"]
    ex_t, ex_w = prf_expand(reader, terms, prf_store,
                            fb_docs=5, fb_terms=8, fb_weight=0.5)
    assert prf_topk(reader, terms, prf_store, k=K,
                    fb_docs=5, fb_terms=8, fb_weight=0.5) == \
        reader.topk_wand(ex_t, K, weights=ex_w)


def test_prf_no_hits_returns_original(built_index, prf_store):
    reader = IndexReader(built_index[0])
    assert prf_expand(reader, ["absentterm"], prf_store) == (
        ["absentterm"], [1.0]
    )
    assert prf_topk(reader, ["absentterm"], prf_store, k=5) == []


def test_prf_validation(built_index, prf_store):
    reader = IndexReader(built_index[0])
    with pytest.raises(ValueError):
        prf_expand(reader, ["spark"], prf_store, fb_docs=0)
    with pytest.raises(ValueError):
        prf_expand(reader, ["spark"], prf_store, fb_weight=0.0)


# ---------------------------------------------------------------------------
# review-r5 regressions
# ---------------------------------------------------------------------------


def test_parse_boost_never_eats_expand_operators():
    # an expand operator INSIDE a boost chunk is literal text (pre-boost
    # tokenization), never a silently-deoperatored boosted term
    mode, terms, _ = parse_query("spar*^2 join")
    assert mode == "bm25" and terms == ["spar", "2", "join"]
    mode, terms, _ = parse_query("tabel~^2")
    assert mode == "bm25" and terms == ["tabel", "2"]
    # a LEADING wildcard still triggers expand (the '*' is at the chunk
    # edge, so the operator survives; the boost digits become literal
    # exact tokens) — the suffix expansion is preserved, nothing eaten
    mode, (exact, fuzzy, prefixes, suffixes, regexes), _ = \
        parse_query("*fix^2")
    assert mode == "expand" and suffixes == ["fix"] and exact == ["2"]
    mode, terms, _ = parse_query("/sp.rk/^2")
    assert mode == "bm25"
    # and a plain boost next to a real expand chunk still yields expand
    mode, _, _ = parse_query("spark^2 tabel~")
    assert mode == "expand"


def test_boosted_paging_on_engine_without_attrs(built_index, ray_session):
    """search_after on a boosted query must work against engines whose
    topk has no attrs parameter (DistributedQueryEngine) — review r5: the
    merged attrs-or-after branch crashed page 2 with a TypeError."""
    from wikirec_ray.pipelines.query import search_with_terms
    from wikirec_ray.state.server import DistributedQueryEngine

    index_dir, _ = built_index
    reader = IndexReader(index_dir)
    eng = DistributedQueryEngine(index_dir, pool_size=2)
    try:
        page1, _, _ = search_with_terms(eng, "spark^2.5 join", k=5)
        assert page1 == reader.topk(
            ["spark", "join"], 5, weights=[2.5, 1.0]
        )
        page2, _, _ = search_with_terms(
            eng, "spark^2.5 join", k=5, after=page1[-1]
        )
        assert page2 == reader.topk(
            ["spark", "join"], 5, after=page1[-1], weights=[2.5, 1.0]
        )
        assert page2 and not set(d for d, _ in page1) & set(
            d for d, _ in page2
        )
    finally:
        eng.shutdown()


@pytest.fixture(scope="module")
def scoped_fx(ray_session, tmp_path_factory):
    """Tiny two-language corpus where the vocabulary is attribute-
    correlated, with index + meta sidecar + docstore export — the PRF
    attrs-scoping oracle (expansion terms must come from inside the
    filter scope)."""
    import pyarrow as pa
    import ray.data

    from wikirec_ray.pipelines.export import export_clean_corpus
    from wikirec_ray.stages.doc_meta import build_doc_meta
    from wikirec_ray.stages.index_build import build_index
    from wikirec_ray.state.docstore import DocStore

    rows = []
    for i in range(30):
        filler_en = f"money credit loan w{i % 5}"
        filler_de = f"fluss ufer wasser w{i % 5}"
        if i % 2 == 0:
            rows.append({"doc_id": i, "lang": "en",
                         "text": f"bank finance {filler_en}"})
        else:
            rows.append({"doc_id": i, "lang": "de",
                         "text": f"bank river {filler_de}"})
    base = str(tmp_path_factory.mktemp("prf_scoped"))
    idx, exp = base + "/idx", base + "/exp"
    tbl = pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "text": [r["text"] for r in rows],
        "lang": [r["lang"] for r in rows],
    })
    ds = ray.data.from_arrow(tbl)
    build_index(ds.select_columns(["doc_id", "text"]), idx, resume=False)
    build_doc_meta(ds.select_columns(["doc_id", "lang"]), idx,
                   cols=["lang"])
    export_clean_corpus(ds.select_columns(["doc_id", "text"]), exp,
                        range_size=16, resume=False)
    return {"idx": idx, "store": DocStore(exp), "rows": rows}


def test_prf_attrs_scope_feedback_pass(scoped_fx):
    """prf_expand(attrs=...) draws feedback docs from INSIDE the filter
    scope (review r5: unfiltered feedback polluted scoped queries with
    out-of-scope vocabulary)."""
    reader = IndexReader(scoped_fx["idx"])
    de_vocab = {
        t for r in scoped_fx["rows"] if r["lang"] == "de"
        for t in r["text"].split()
    }
    t_de, w_de = prf_expand(reader, ["bank"], scoped_fx["store"],
                            fb_docs=5, fb_terms=6, fb_weight=0.5,
                            attrs=[("lang", "de")])
    exp_de = t_de[1:]
    assert exp_de, "scoped PRF must still expand"
    assert set(exp_de) <= de_vocab, exp_de
    assert "money" not in exp_de and "finance" not in exp_de
    # unfiltered PRF on this corpus mixes scopes -> different expansion
    t_all, _ = prf_expand(reader, ["bank"], scoped_fx["store"],
                          fb_docs=5, fb_terms=6, fb_weight=0.5)
    assert t_all != t_de
    # and prf_topk(attrs=...) returns only in-scope docs, ranked by the
    # scoped expansion
    hits = prf_topk(reader, ["bank"], scoped_fx["store"], k=10,
                    fb_docs=5, fb_terms=6, fb_weight=0.5,
                    attrs=[("lang", "de")])
    de_ids = {r["doc_id"] for r in scoped_fx["rows"] if r["lang"] == "de"}
    assert hits and {d for d, _ in hits} <= de_ids
    assert hits == reader.topk(t_de, 10, attrs=[("lang", "de")],
                               weights=w_de)


def test_cli_boosted_query_and_explain(built_index, capsys):
    """CLI boost syntax routes through the weighted path, and the explain
    subcommand recomposes exactly the score the query subcommand printed
    (mode-aware via the shared scoring_terms switch; errors keep the JSON
    line protocol).  Lives here (not test_cli.py) so it can reuse the
    session-built index — test_cli's module-scoped sf_dir shadows the
    session fixture chain."""
    import json

    from wikirec_ray.__main__ import main

    def run_cli(argv):
        rc = main(argv)
        return rc, json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    idx = built_index[0]
    reader = IndexReader(idx)
    rc, res = run_cli(["query", "--index", idx, "spark^2.5 join", "-k", "5"])
    assert rc == 0
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
        reader.topk_wand(["spark", "join"], 5, weights=[2.5, 1.0])

    top = res["hits"][0]
    rc, ex = run_cli(["explain", "--index", idx,
                      "spark^2.5 join", str(top["doc_id"])])
    assert rc == 0 and ex["mode"] == "boosted"
    assert ex["score"] == top["score"]
    by_term = {t["term"]: t for t in ex["terms"]}
    assert by_term["spark"]["weight"] == 2.5
    assert by_term["join"]["weight"] == 1.0

    # phrase mode: the breakdown explains the plain BM25 scoring side
    rc, ex2 = run_cli(["explain", "--index", idx,
                       '"spark join"', str(top["doc_id"])])
    assert rc == 0 and ex2["mode"] == "phrase"
    assert ex2["score"] == \
        reader.explain(["spark", "join"], top["doc_id"])["score"]

    # user-input errors keep the JSON line protocol (review r5): no
    # scoring terms, out-of-range doc_id, invalid regex pattern
    rc, err = run_cli(["explain", "--index", idx, "", "0"])
    assert rc == 1 and "no scoring terms" in err["error"]
    rc, err = run_cli(["explain", "--index", idx, "spark", "999999999"])
    assert rc == 1 and "doc range" in err["error"]
    rc, err = run_cli(["explain", "--index", idx, "/[bad(/", "0"])
    assert rc == 1 and err["error"]


# ---------------------------------------------------------------------------
# significant_text (ES: which terms characterize the matching docs)
# ---------------------------------------------------------------------------


def brute_significant_text(reader, corpus_tokens, terms, k, sample):
    hits = reader.topk_wand(terms, sample)
    orig = set(terms)
    fg, n_fg = {}, 0
    for d, _ in hits:
        toks = set(corpus_tokens[d]) - orig
        if not toks:
            continue
        n_fg += 1
        for t in toks:
            fg[t] = fg.get(t, 0) + 1
    n = reader.stats["n_docs"]
    out = []
    for t, f in fg.items():
        df = reader.df.get(t, 0)
        if df == 0:
            continue
        fp, bp = f / n_fg, df / n
        if fp <= bp:
            continue
        out.append({"value": t, "n_docs": f, "bg_docs": df,
                    "score": (fp - bp) * (fp / bp)})
    out.sort(key=lambda b: (-round(b["score"], 9), b["value"]))
    return out[:k]


def test_significant_text_matches_brute(built_index, prf_store,
                                        corpus_tokens):
    from wikirec_ray.pipelines.query import significant_text

    reader = IndexReader(built_index[0])
    for terms in (["spark", "join"], ["window"]):
        got = significant_text(reader, terms, prf_store, k=8, sample=20)
        want = brute_significant_text(reader, corpus_tokens, terms, 8, 20)
        assert [(b["value"], b["n_docs"], b["bg_docs"]) for b in got] == \
            [(b["value"], b["n_docs"], b["bg_docs"]) for b in want], terms
        for g, w in zip(got, want):
            assert g["score"] == pytest.approx(w["score"], rel=1e-12)
        # original query terms never surface; every bucket has real lift
        assert not {b["value"] for b in got} & set(terms)
        assert all(b["score"] > 0 for b in got)
    # absent term / empty query → []
    assert significant_text(reader, ["zzzabsent"], prf_store) == []
    assert significant_text(reader, [], prf_store) == []
    with pytest.raises(ValueError):
        significant_text(reader, ["spark"], prf_store, k=0)
    with pytest.raises(ValueError):
        significant_text(reader, ["spark"], prf_store, sample=0)


def test_significant_text_served_equals_local(built_index, prf_store,
                                              ray_session):
    from wikirec_ray.pipelines.query import significant_text
    from wikirec_ray.state.server import RangeShardedQueryEngine

    reader = IndexReader(built_index[0])
    eng = RangeShardedQueryEngine(built_index[0], pool_size=2)
    try:
        for terms in (["spark", "join"], ["window"], ["zzzabsent"]):
            got = significant_text(eng, terms, prf_store, k=8, sample=20)
            want = significant_text(reader, terms, prf_store, k=8,
                                    sample=20)
            assert [(b["value"], b["n_docs"], b["bg_docs"]) for b in got] \
                == [(b["value"], b["n_docs"], b["bg_docs"]) for b in want]
    finally:
        eng.shutdown()


# ---------------------------------------------------------------------------
# boosting query (ES: soft demotion via negative_boost)
# ---------------------------------------------------------------------------


def test_boosting_topk_demotes_matching_docs(built_index, corpus_tokens):
    import numpy as np

    from wikirec_ray.pipelines.query import topk_from_dense

    reader = IndexReader(built_index[0])
    terms, neg, nb = ["spark", "join"], ["slow", "error"], 0.3

    got = reader.boosting_topk(terms, K, neg, negative_boost=nb)
    # independent brute: raw dense scores, demote docs whose ORACLE
    # token set hits any negative term, rank with the shared kernel
    scores = reader.score_exact(terms).copy()
    negset = {d for d, toks in corpus_tokens.items()
              if set(toks) & set(neg)}
    for d in negset:
        scores[d] *= nb
    assert got == topk_from_dense(scores, K)

    # per-doc invariant vs the plain ranking: demoted docs score nb x
    # their plain score, others are untouched
    plain = dict(reader.topk(terms, 10_000))
    for d, s in got:
        if d in negset:
            assert s == pytest.approx(plain[d] * nb, abs=2e-9), d
        else:
            assert s == plain[d], d
    # the demotion actually moved something
    assert [d for d, _ in got] != [d for d, _ in reader.topk(terms, K)]
    # nb=1 is a no-op; attrs/after compose like topk
    assert reader.boosting_topk(terms, K, neg, 1.0) == reader.topk(terms, K)
    page1 = reader.boosting_topk(terms, 5, neg, nb)
    page2 = reader.boosting_topk(terms, 5, neg, nb, after=page1[-1])
    assert page1 + page2 == reader.boosting_topk(terms, 10, neg, nb)
    # no negative matches == plain; empty positives == []
    assert reader.boosting_topk(terms, K, ["zzzabsent"], nb) == \
        reader.topk(terms, K)
    assert reader.boosting_topk([], K, neg, nb) == []
    for bad in (0.0, -0.5, 1.5, float("nan")):
        with pytest.raises(ValueError):
            reader.boosting_topk(terms, K, neg, bad)


def test_boosting_topk_served_equals_local(built_index, ray_session):
    from wikirec_ray.state.server import RangeShardedQueryEngine

    reader = IndexReader(built_index[0])
    eng = RangeShardedQueryEngine(built_index[0], pool_size=2)
    try:
        for terms, neg, nb, w in [
            (["spark", "join"], ["slow", "error"], 0.3, None),
            (["spark", "join"], ["slow"], 0.9, None),
            (["spark", "spark", "join"], ["slow"], 0.5, None),  # dups
            (["spark", "join"], ["slow"], 0.4, [2.5, 1.0]),  # weights
            (["spark"], ["zzzabsent"], 0.5, None),
        ]:
            got = eng.boosting_topk(terms, K, neg, nb, weights=w)
            want = reader.boosting_topk(terms, K, neg, nb, weights=w)
            assert got == want, (terms, neg, nb, w)
        with pytest.raises(ValueError):
            eng.boosting_topk(["spark"], K, ["slow"], 0.0)
    finally:
        eng.shutdown()
