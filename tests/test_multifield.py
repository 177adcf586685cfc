"""Multi-field retrieval: per-field indexes (body + page <title>) ranked by
a field-weighted BM25 sum (Lucene/ES multi_match most_fields), against an
independent NumPy per-field replay."""

import math
import os
import re

import numpy as np
import pytest

from wikirec_ray.pipelines.multifield import MultiFieldReader
from wikirec_ray.pipelines.query import IndexReader
from wikirec_ray.stages.extract import extract_title_single

K = 15


# ---------------------------------------------------------------------------
# title extraction (pure kernel)
# ---------------------------------------------------------------------------


def test_extract_title_single():
    assert extract_title_single(
        b"<html><head><title>Tom &amp; Jerry \xe2\x80\x94 ep1</title>"
        b"</head><body><p>x</p></body></html>"
    ) == "Tom & Jerry — ep1"
    # inner markup stripped, whitespace trimmed, attributes tolerated
    assert extract_title_single(
        b'<title lang="en">  a <b>bold</b> title\n</title>'
    ) == "a bold title"
    # first tag wins; absent tag -> ""
    assert extract_title_single(b"<title>one</title><title>two</title>") == "one"
    assert extract_title_single(b"<html><p>no head</p></html>") == ""
    # comment/script-embedded titles never shadow the real tag (the page is
    # comment/script/style-stripped FIRST, like extract_text_single)
    assert extract_title_single(
        b"<!-- <title>old seo title</title> --><head><title>Real</title></head>"
    ) == "Real"
    assert extract_title_single(
        b"<script>var t = '<title>fake</title>';</script><title>Real</title>"
    ) == "Real"
    assert extract_title_single(b"<!-- <title>only in comment</title> -->") == ""


# ---------------------------------------------------------------------------
# fixtures: body + title field indexes over the synthetic crawl
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def field_indexes(ray_session, sf_dir, tmp_path_factory):
    """(body_dir, title_dir, {doc: body tokens}, {doc: title tokens}) —
    both fields extracted from the SAME pages Dataset in one pass, each
    indexed by the ordinary single-shuffle build."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wikirec_ray.sources.synth import pages_dataset
    from wikirec_ray.stages.extract import extract_pages
    from wikirec_ray.stages.index_build import build_index

    root = tmp_path_factory.mktemp("multifield")
    pages = pages_dataset(sf_dir, columns=["url", "html"])
    corpus = extract_pages(pages, title_col="title").map_batches(
        lambda b: b.append_column(
            "doc_id",
            pc.cast(pc.replace_substring_regex(b["url"], r"^.*/", ""), pa.int64()),
        ),
        batch_format="pyarrow",
    ).materialize()
    body_dir, title_dir = str(root / "body"), str(root / "title")
    build_index(corpus, body_dir, resume=False)
    build_index(corpus, title_dir, text_col="title", resume=False)

    def toks(col):
        out = {}
        for row in corpus.select_columns(["doc_id", col]).take_all():
            out[int(row["doc_id"])] = [
                w for w in re.split(r"[^a-z0-9]+", (row[col] or "").lower()) if w
            ]
        return out

    return body_dir, title_dir, toks("text"), toks("title")


def brute_field_bm25(corpus_tokens, terms, weights=None):
    """{doc: unweighted BM25 over ONE field's oracle tokenization} —
    independent of the engine (formula transcribed, not imported)."""
    from wikirec_ray.schema import BM25_B, BM25_K1

    docs = sorted(corpus_tokens)
    dls = np.array([len(corpus_tokens[d]) for d in docs], float)
    avgdl = dls.mean()
    n = len(docs)
    scores = np.zeros(n)
    weights = weights or [1.0] * len(terms)
    agg = {}
    for t, w in zip(terms, weights):
        agg[t] = agg.get(t, 0.0) + w
    for t, w in agg.items():
        df = sum(1 for d in docs if t in set(corpus_tokens[d]))
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * w
        tf = np.array([corpus_tokens[d].count(t) for d in docs], float)
        scores += idf * tf * (BM25_K1 + 1) / (
            tf + BM25_K1 * (1 - BM25_B + BM25_B * dls / avgdl)
        )
    return dict(zip(docs, scores))


def brute_multifield_topk(field_toks, field_weights, terms, k, weights=None):
    per_field = [brute_field_bm25(ft, terms, weights) for ft in field_toks]
    docs = sorted(per_field[0])
    total = {
        d: sum(fw * pf[d] for fw, pf in zip(field_weights, per_field))
        for d in docs
    }
    r = {d: round(total[d], 9) for d in docs}
    order = sorted((d for d in docs if r[d] > 0), key=lambda d: (-r[d], d))[:k]
    return [(d, float(r[d])) for d in order]


# ---------------------------------------------------------------------------
# ranking
# ---------------------------------------------------------------------------


def test_multifield_equals_brute(field_indexes):
    body_dir, title_dir, body_toks, title_toks = field_indexes
    mf = MultiFieldReader([(body_dir, 1.0), (title_dir, 2.0)])
    # src* tokens live in every title AND in body footers' absence — pick a
    # query mixing a title-heavy token with body-only vocabulary
    for terms in (["spark", "join"], ["src3", "spark"], ["doc"], ["src1"]):
        expect = brute_multifield_topk(
            [body_toks, title_toks], [1.0, 2.0], terms, K
        )
        assert mf.topk(terms, K) == expect, terms
    # per-occurrence query boosts apply inside every field
    terms, w = ["spark", "src3", "spark"], [2.0, 0.5, 1.0]
    assert mf.topk(terms, K, weights=w) == brute_multifield_topk(
        [body_toks, title_toks], [1.0, 2.0], terms, K, weights=w
    )


def test_single_field_weight1_equals_plain(field_indexes):
    body_dir, _, _, _ = field_indexes
    mf = MultiFieldReader([(body_dir, 1.0)])
    rd = IndexReader(body_dir)
    for q in (["spark", "join"], ["the"], ["absentterm"]):
        assert mf.topk(q, K) == rd.topk(q, K)


def test_title_weight_drives_ranking(field_indexes):
    """A token that is IN some titles ranks those docs above pure body
    matches once the title weight dominates."""
    body_dir, title_dir, _, title_toks = field_indexes
    titled = {d for d, tk in title_toks.items() if "src2" in tk}
    assert titled  # the synthetic corpus has src2 pages
    heavy = MultiFieldReader([(body_dir, 1.0), (title_dir, 50.0)])
    top = [d for d, _ in heavy.topk(["src2"], len(titled))]
    assert set(top) <= titled


def test_multifield_paging(field_indexes):
    body_dir, title_dir, *_ = field_indexes
    mf = MultiFieldReader([(body_dir, 1.0), (title_dir, 2.0)])
    full = mf.topk(["spark", "doc"], 30)
    assert len(full) == 30
    page1 = mf.topk(["spark", "doc"], 10)
    page2 = mf.topk(["spark", "doc"], 10, after=page1[-1])
    page3 = mf.topk(["spark", "doc"], 10, after=page2[-1])
    assert page1 + page2 + page3 == full


def test_multifield_attrs_filter(field_indexes, ray_session, sf_dir):
    """attrs= composes: the primary field's sidecar filters the summed
    ranking, same contract as every single-field route."""
    import ray.data

    from wikirec_ray.stages.doc_meta import build_doc_meta

    body_dir, title_dir, *_ = field_indexes
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    build_doc_meta(ds, body_dir, ["lang"], resume=False)
    mf = MultiFieldReader([(body_dir, 1.0), (title_dir, 2.0)])
    assert mf.meta_cols() == ["lang"]
    hits = mf.topk(["spark", "doc"], K, attrs=[("lang", "de")])
    de = {
        int(r["doc_id"])
        for r in ds.take_all()
        if r["lang"] == "de"
    }
    assert hits and {d for d, _ in hits} <= de
    unfiltered = dict(mf.topk(["spark", "doc"], 500))
    assert all(abs(unfiltered[d] - s) < 1e-12 for d, s in hits)


# ---------------------------------------------------------------------------
# explain / deletes / validation
# ---------------------------------------------------------------------------


def test_multifield_explain_recomposes(field_indexes):
    body_dir, title_dir, *_ = field_indexes
    mf = MultiFieldReader([(body_dir, 1.0), (title_dir, 2.0)])
    terms, w = ["spark", "src3", "spark"], [2.0, 0.5, 1.0]
    for d, s in mf.topk(terms, K, weights=w):
        ex = mf.explain(terms, d, weights=w)
        assert ex["score"] == s
        assert [f["field_weight"] for f in ex["fields"]] == [1.0, 2.0]
        # field_score is the addend the sum used
        assert ex["score"] == round(
            sum(f["field_score"] for f in ex["fields"]), 9
        )


def test_tombstone_union(ray_session, field_indexes, tmp_path_factory):
    """Deleting a doc from ONE field's index kills it in the combined
    ranking (and explain reports deleted) — a delete never depends on how
    many field indexes exist."""
    import shutil

    from wikirec_ray.stages.lifecycle import delete_docs

    body_dir, title_dir, *_ = field_indexes
    # copy the title index so the shared fixture stays undeleted
    t2 = str(tmp_path_factory.mktemp("mf_del") / "title")
    shutil.copytree(title_dir, t2)
    mf0 = MultiFieldReader([(body_dir, 1.0), (t2, 2.0)])
    victim = mf0.topk(["spark", "doc"], 1)[0][0]
    delete_docs(t2, [victim])
    mf = MultiFieldReader([(body_dir, 1.0), (t2, 2.0)])  # fresh snapshot
    assert all(d != victim for d, _ in mf.topk(["spark", "doc"], 100))
    ex = mf.explain(["spark", "doc"], victim)
    assert ex["deleted"] is True and ex["score"] == 0.0
    # served union too: the shard zeroes EVERY field's tombs on the summed
    # accumulator, so the title-only delete kills the doc there as well
    from wikirec_ray.state.server import MultiFieldShardedEngine

    eng = MultiFieldShardedEngine([(body_dir, 1.0), (t2, 2.0)], pool_size=2)
    try:
        served = eng.topk(["spark", "doc"], 100)
        assert all(d != victim for d, _ in served)
        assert served == mf.topk(["spark", "doc"], 100)
    finally:
        eng.shutdown()


def test_served_multifield_equals_local(field_indexes, ray_session, sf_dir):
    """MultiFieldShardedEngine (per-field resolver pools + doc-range shards
    summing field_weight × field BM25 range-locally) returns exactly the
    local MultiFieldReader ranking — plain, boosted, paged, filtered."""
    import ray.data

    from wikirec_ray.stages.doc_meta import build_doc_meta
    from wikirec_ray.state.server import MultiFieldShardedEngine

    body_dir, title_dir, *_ = field_indexes
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    build_doc_meta(ds, body_dir, ["lang"], resume=True)  # idempotent
    local = MultiFieldReader([(body_dir, 1.0), (title_dir, 2.0)])
    eng = MultiFieldShardedEngine(
        [(body_dir, 1.0), (title_dir, 2.0)], pool_size=3,
        resolver_pool_size=2,
    )
    try:
        assert eng.meta_cols() == ["lang"]
        for terms in (["spark", "join"], ["src3", "spark"], ["doc"],
                      ["absentterm"], []):
            assert eng.topk(terms, K) == local.topk(terms, K), terms
        terms, w = ["spark", "src3", "spark"], [2.0, 0.5, 1.0]
        assert eng.topk(terms, K, weights=w) == local.topk(terms, K, weights=w)
        p1 = eng.topk(["spark", "doc"], 10)
        assert eng.topk(["spark", "doc"], 10, after=p1[-1]) == \
            local.topk(["spark", "doc"], 10, after=p1[-1])
        assert eng.topk(["spark", "doc"], K, attrs=[("lang", "de")]) == \
            local.topk(["spark", "doc"], K, attrs=[("lang", "de")])
    finally:
        eng.shutdown()


def test_field_validation(field_indexes):
    body_dir, title_dir, *_ = field_indexes
    with pytest.raises(ValueError, match="at least one"):
        MultiFieldReader([])
    for bad in (0.0, -2.0, math.nan, math.inf):
        with pytest.raises(ValueError, match="finite and > 0"):
            MultiFieldReader([(body_dir, bad)])
    # mismatched doc spaces fail loudly at construction
    rd = IndexReader(title_dir)
    rd.norms = rd.norms[:-5]
    with pytest.raises(ValueError, match="doc-id space"):
        MultiFieldReader([(body_dir, 1.0), (rd, 2.0)])


def test_cli_multifield_query(field_indexes, ray_session, capsys):
    """``query --title-index`` routes through the multi-field engines —
    local and served hits equal the library ranking; unsupported modes
    are a named error."""
    import json

    from wikirec_ray.__main__ import main

    body_dir, title_dir, *_ = field_indexes
    mf = MultiFieldReader([(body_dir, 1.0), (title_dir, 2.5)])

    def run(argv):
        rc = main(argv)
        return rc, json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    base = ["query", "--index", body_dir, "--title-index", title_dir,
            "--title-weight", "2.5"]
    rc, res = run(base + ["spark src3", "-k", "5"])
    assert rc == 0
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
        mf.topk(["spark", "src3"], 5)
    rc, res = run(base + ["spark^2 src3", "-k", "5"])
    assert rc == 0
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
        mf.topk(["spark", "src3"], 5, weights=[2.0, 1.0])
    rc, res = run(base + ["--serve", "2", "spark src3", "-k", "5"])
    assert rc == 0
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
        mf.topk(["spark", "src3"], 5)
    for bad in (base + ['"spark src3"'],
                base + ["--collapse", "lang", "spark"],
                base + ["--facets", "lang", "spark"]):
        with pytest.raises(SystemExit, match="title-index supports"):
            main(bad)
        capsys.readouterr()

    # --mf-mode best_fields wires the DisMax reader through the CLI
    mfb = MultiFieldReader([(body_dir, 1.0), (title_dir, 2.5)],
                           mode="best_fields", tie_breaker=0.3)
    rc, res = run(base + ["--mf-mode", "best_fields",
                          "--tie-breaker", "0.3", "spark src3", "-k", "5"])
    assert rc == 0
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
        mfb.topk(["spark", "src3"], 5)
    # orphaned mf flags (no --title-index) are a loud error, never a
    # silently-plain query
    for orphan in (["query", "--index", body_dir, "spark",
                    "--mf-mode", "best_fields"],
                   ["query", "--index", body_dir, "spark",
                    "--tie-breaker", "0.3"]):
        with pytest.raises(SystemExit, match="mf-mode"):
            main(orphan)
        capsys.readouterr()
    # an out-of-range tie breaker hits the reader's validation
    with pytest.raises(ValueError):
        main(base + ["--mf-mode", "best_fields", "--tie-breaker", "1.5",
                     "spark"])
    capsys.readouterr()


def test_served_doc_space_mismatch(ray_session, field_indexes, sf_dir,
                                   tmp_path_factory):
    """A field built over a TRUNCATED corpus shares every norms range-file
    NAME (the missing docs fall inside the last range), so the served
    engine must compare stats n_docs, not just the range layout — the same
    rejection the local reader makes by norms length."""
    import ray.data

    from wikirec_ray.stages.index_build import build_index
    from wikirec_ray.state.server import MultiFieldShardedEngine

    body_dir, *_ = field_indexes
    short_dir = str(tmp_path_factory.mktemp("mf_short") / "idx")
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).filter(lambda r: r["doc_id"] < 495)
    build_index(ds, short_dir, resume=False)
    with pytest.raises(ValueError, match="doc-id space"):
        MultiFieldShardedEngine([(body_dir, 1.0), (short_dir, 2.0)])


# ---------------------------------------------------------------------------
# best_fields (Lucene DisMax: max + tie_breaker x the rest)
# ---------------------------------------------------------------------------


def brute_bestfields_topk(field_toks, field_weights, terms, k, tb):
    per_field = [brute_field_bm25(ft, terms) for ft in field_toks]
    docs = sorted(per_field[0])
    out = {}
    for d in docs:
        fs = [fw * pf[d] for fw, pf in zip(field_weights, per_field)]
        mx = max(fs)
        out[d] = mx + tb * (sum(fs) - mx)
    r = {d: round(out[d], 9) for d in docs}
    order = sorted((d for d in docs if r[d] > 0), key=lambda d: (-r[d], d))[:k]
    return [(d, float(r[d])) for d in order]


def test_best_fields_matches_brute_dismax(field_indexes):
    body_dir, title_dir, body_toks, title_toks = field_indexes
    for tb in (0.0, 0.3, 1.0):
        mf = MultiFieldReader([(body_dir, 1.0), (title_dir, 2.0)],
                              mode="best_fields", tie_breaker=tb)
        for terms in (["spark", "join"], ["src3", "spark"], ["doc"]):
            expect = brute_bestfields_topk(
                [body_toks, title_toks], [1.0, 2.0], terms, K, tb
            )
            got = mf.topk(terms, K)
            assert [d for d, _ in got] == [d for d, _ in expect], (tb, terms)
            for (gd, gs), (wd, ws) in zip(got, expect):
                assert gs == pytest.approx(ws, abs=2e-9), (tb, terms, gd)
    # tie_breaker=1 == most_fields sum, bit for bit
    mf1 = MultiFieldReader([(body_dir, 1.0), (title_dir, 2.0)],
                           mode="best_fields", tie_breaker=1.0)
    mfs = MultiFieldReader([(body_dir, 1.0), (title_dir, 2.0)])
    for terms in (["spark", "join"], ["src1"]):
        got1, gots = mf1.topk(terms, K), mfs.topk(terms, K)
        assert [d for d, _ in got1] == [d for d, _ in gots]
        for (d1, s1), (_, s2) in zip(got1, gots):
            assert s1 == pytest.approx(s2, abs=2e-9)
    # the mode actually changes a ranking somewhere
    mf0 = MultiFieldReader([(body_dir, 1.0), (title_dir, 2.0)],
                           mode="best_fields", tie_breaker=0.0)
    assert any(
        mf0.topk(t, K) != mfs.topk(t, K)
        for t in (["spark", "join"], ["src3", "spark"], ["doc"])
    )
    # explain recomposes the DisMax score exactly
    top = mf0.topk(["src3", "spark"], 3)
    for d, s in top:
        ex = mf0.explain(["src3", "spark"], d)
        assert ex["score"] == s and ex["mode"] == "best_fields"
    # duplicate-terms parity (the CLAUDE.md rule: every new scoring path
    # needs one): a repeated occurrence == the same term integer-boosted,
    # on the DisMax route too
    dup = mf0.topk(["spark", "spark", "join"], K)
    boosted = mf0.topk(["spark", "join"], K, weights=[2.0, 1.0])
    assert [d for d, _ in dup] == [d for d, _ in boosted]
    for (_, s1), (_, s2) in zip(dup, boosted):
        assert s1 == pytest.approx(s2, abs=2e-9)
    # validation
    with pytest.raises(ValueError):
        MultiFieldReader([(body_dir, 1.0)], mode="nope")
    with pytest.raises(ValueError):
        MultiFieldReader([(body_dir, 1.0)], mode="best_fields",
                         tie_breaker=1.5)


def test_best_fields_served_equals_local(field_indexes, ray_session):
    from wikirec_ray.state.server import MultiFieldShardedEngine

    body_dir, title_dir, _, _ = field_indexes
    mf = MultiFieldReader([(body_dir, 1.0), (title_dir, 2.0)],
                          mode="best_fields", tie_breaker=0.3)
    eng = MultiFieldShardedEngine([(body_dir, 1.0), (title_dir, 2.0)],
                                  pool_size=2, mode="best_fields",
                                  tie_breaker=0.3)
    try:
        for terms in (["spark", "join"], ["src3", "spark"], ["doc"],
                      ["spark", "spark", "join"],  # duplicate-terms parity
                      ["zzzabsent"]):
            got, want = eng.topk(terms, K), mf.topk(terms, K)
            assert [d for d, _ in got] == [d for d, _ in want], terms
            for (gd, gs), (_, ws) in zip(got, want):
                assert gs == pytest.approx(ws, abs=2e-9), (terms, gd)
        with pytest.raises(ValueError):
            MultiFieldShardedEngine([(body_dir, 1.0)], mode="bad")
    finally:
        eng.shutdown()
