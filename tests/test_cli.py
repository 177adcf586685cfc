"""python -m wikirec_ray: the ray-job-submit CLI surface over the library.

Each subcommand is exercised through main() under the session's Ray (the
_ensure_ray guard skips init when a session exists); outputs are the JSON
lines a job driver would parse."""

import json
import os

import pytest


@pytest.fixture(scope="module")
def sf_dir():
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def run_cli(capsys, argv):
    from wikirec_ray.__main__ import main

    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_cli_build_stats_query_append(ray_session, tmp_path, capsys, sf_dir):
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = os.path.join(sf_dir, "documents.parquet")
    idx = str(tmp_path / "cli_idx")

    rc, built = run_cli(capsys, [
        "build", "--input", docs, "--format", "documents", "--index", idx,
        "--positions", "--bigrams", "32", "--no-resume",
    ])
    assert rc == 0 and built["n_docs"] > 0 and built["partitions"] > 0

    rc, st = run_cli(capsys, ["stats", "--index", idx])
    assert rc == 0
    assert st["n_docs"] == built["n_docs"]
    assert st["positions"] is True and st["bigrams"] == 32
    assert st["lineage"]["format"] == "documents"

    # all three query routes, equal to the library surface
    from wikirec_ray.pipelines.query import IndexReader, search

    rd = IndexReader(idx)
    a, b = sorted(rd.bigrams)[0].split()
    for q in (f"{a} {b}", f'"{a} {b}"', f"NEAR/4({a} {b})"):
        rc, res = run_cli(capsys, ["query", "--index", idx, q, "-k", "5"])
        assert rc == 0
        assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
            search(rd, q, 5), q

    # --after deep paging: page 2 continues exactly where page 1 stopped
    rc, p1 = run_cli(capsys, ["query", "--index", idx, f"{a} {b}", "-k", "5"])
    last = p1["hits"][-1]
    rc, p2 = run_cli(capsys, [
        "query", "--index", idx, f"{a} {b}", "-k", "5",
        "--after", f"{last['doc_id']}:{last['score']!r}",
    ])
    assert rc == 0
    walked = [(h["doc_id"], h["score"]) for h in p1["hits"] + p2["hits"]]
    assert walked == search(rd, f"{a} {b}", 10)
    with pytest.raises(SystemExit):
        run_cli(capsys, ["query", "--index", idx, a, "--after", "notacursor"])
    # a non-finite cursor score would fail every strictly-after test and
    # silently return empty pages — it must be rejected like other
    # malformed cursors
    for bad in ("12:nan", "12:inf", "12:-inf"):
        with pytest.raises(SystemExit):
            run_cli(capsys, ["query", "--index", idx, a, "--after", bad])

    # served query path
    rc, res = run_cli(capsys, [
        "query", "--index", idx, f"{a} {b}", "-k", "5", "--serve", "2",
    ])
    assert rc == 0
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
        search(rd, f"{a} {b}", 5)

    # delta append: new ids, text reused — n_docs grows by the delta size
    t = pq.read_table(docs, columns=["doc_id", "text"]).slice(0, 20)
    delta = pa.table({
        "doc_id": pa.compute.add(t["doc_id"], 10_000_000),
        "text": t["text"],
    })
    delta_path = tmp_path / "delta"
    delta_path.mkdir()
    pq.write_table(delta, delta_path / "part-0.parquet")
    rc, appended = run_cli(capsys, [
        "append", "--input", str(delta_path), "--format", "documents",
        "--index", idx,
    ])
    assert rc == 0 and appended["n_docs"] == built["n_docs"] + 20


def test_cli_merge(ray_session, tmp_path, capsys, sf_dir):
    """merge combines two CLI-built indexes (disjoint id blocks) and the
    result answers queries like one full build over the union."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from wikirec_ray.schema import DOC_RANGE_SIZE

    docs = os.path.join(sf_dir, "documents.parquet")
    t = pq.read_table(docs, columns=["doc_id", "text"])
    half = t.num_rows // 2
    a, b = t.slice(0, half), t.slice(half)
    b = pa.table({
        "doc_id": pc.add(b["doc_id"], 2 * DOC_RANGE_SIZE),
        "text": b["text"],
    })
    parts = {}
    for name, tbl in (("a", a), ("b", b)):
        d = tmp_path / f"corpus_{name}"
        d.mkdir()
        pq.write_table(tbl, d / "part-0.parquet")
        idx = str(tmp_path / f"idx_{name}")
        rc, built = run_cli(capsys, [
            "build", "--input", str(d), "--format", "documents",
            "--index", idx, "--no-resume",
        ])
        assert rc == 0 and built["n_docs"] == tbl.num_rows
        parts[name] = idx
    merged = str(tmp_path / "idx_merged")
    rc, out = run_cli(capsys, [
        "merge", "--index", merged, parts["a"], parts["b"],
    ])
    assert rc == 0 and out["n_docs"] == t.num_rows
    assert out["merged_from"] == [parts["a"], parts["b"]]

    from wikirec_ray.pipelines.query import IndexReader

    rm = IndexReader(merged)
    # hits span both input id blocks
    hits = rm.topk(["the", "table"], 50)
    owners = {d >= 2 * DOC_RANGE_SIZE for d, _ in hits}
    assert owners == {True, False}
    rc, res = run_cli(capsys, ["query", "--index", merged, "the", "-k", "5"])
    assert rc == 0 and len(res["hits"]) == 5


def test_cli_meta_filters_facets(ray_session, tmp_path, capsys, sf_dir):
    """meta builds the attribute sidecar; query then honors col:value
    filter chunks and --facets reports per-value match counts — all equal
    to the library surface."""
    docs = os.path.join(sf_dir, "documents.parquet")
    idx = str(tmp_path / "meta_idx")
    rc, _ = run_cli(capsys, [
        "build", "--input", docs, "--format", "documents", "--index", idx,
        "--no-resume",
    ])
    assert rc == 0
    rc, meta = run_cli(capsys, [
        "meta", "--index", idx, "--input", docs, "--cols", "lang,source",
    ])
    assert rc == 0 and meta["cols"] == ["lang", "source"]
    assert meta["n_docs"] > 0 and meta["skipped"] == 0
    # resumed run: every range skips; whitespace after commas is stripped
    rc, meta2 = run_cli(capsys, [
        "meta", "--index", idx, "--input", docs, "--cols", "lang, source",
    ])
    assert meta2["cols"] == ["lang", "source"]
    assert meta2["skipped"] == meta2["partitions"]

    from wikirec_ray.pipelines.query import IndexReader, search

    rd = IndexReader(idx)
    rc, res = run_cli(capsys, [
        "query", "--index", idx, "lang:en the table", "-k", "5",
        "--facets", "lang,source",
    ])
    assert rc == 0
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
        search(rd, "lang:en the table", 5)
    for col in ("lang", "source"):
        assert [(f["value"], f["n_docs"]) for f in res["facets"][col]] == \
            rd.facet_counts(["the", "table"], col, 5)

    # facet terms come from the query PARSER, not raw tokenization:
    # boolean operators / filter chunks never become facet query terms,
    # and --facets strips whitespace after commas
    rc, res = run_cli(capsys, [
        "query", "--index", idx, "lang:en +the table", "-k", "5",
        "--facets", "lang, source",
    ])
    assert rc == 0
    for col in ("lang", "source"):
        assert [(f["value"], f["n_docs"]) for f in res["facets"][col]] == \
            rd.facet_counts(["table", "the"], col, 5)

    # fuzzy (~) query + --facets: the facet term set is exact terms plus
    # the typo's expansion (regression: the (exact, fuzzy) tuple used to
    # reach facet_counts unexpanded and crash on set())
    rc, res = run_cli(capsys, [
        "query", "--index", idx, "tabl~ the", "-k", "5", "--facets", "lang",
    ])
    assert rc == 0
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
        search(rd, "tabl~ the", 5)
    exp = ["the"] + [v for v, _ in rd.fuzzy_expand("tabl")]
    assert [(f["value"], f["n_docs"]) for f in res["facets"]["lang"]] == \
        rd.facet_counts(exp, "lang", 5)

    # --stats: ES stats aggregation over a NUMERIC sidecar column; the
    # query's col:value filter composes into the aggregation (attrs),
    # unlike --facets which documents the unfiltered OR-match set.  The
    # sidecar gains n_chars, so a FRESH reader (the old one pinned the
    # two-column manifest snapshot).
    rc, meta3 = run_cli(capsys, [
        "meta", "--index", idx, "--input", docs,
        "--cols", "lang,source,n_chars",
    ])
    assert rc == 0 and meta3["cols"] == ["lang", "source", "n_chars"]
    rd2 = IndexReader(idx)
    rc, res = run_cli(capsys, [
        "query", "--index", idx, "lang:en the table", "-k", "5",
        "--stats", "n_chars, lang",
    ])
    assert rc == 0
    want = rd2.metric_stats(["the", "table"], "n_chars",
                            attrs=[("lang", "en")])
    assert res["stats"]["n_chars"] == want and want["count"] > 0
    # a non-numeric column reports the ES empty-stats shape, no crash
    assert res["stats"]["lang"]["count"] == 0
    assert res["stats"]["lang"]["min"] is None

    # --extended-stats and --histogram ride the same match set
    rc, res = run_cli(capsys, [
        "query", "--index", idx, "the table", "-k", "5",
        "--extended-stats", "n_chars", "--histogram", "n_chars:100",
        "--cardinality", "lang,n_chars",
    ])
    assert rc == 0
    assert res["cardinality"]["lang"] == \
        rd2.cardinality(["the", "table"], "lang")
    assert res["cardinality"]["n_chars"] == \
        rd2.cardinality(["the", "table"], "n_chars")
    assert res["extended_stats"]["n_chars"] == \
        rd2.extended_stats(["the", "table"], "n_chars")
    assert res["extended_stats"]["n_chars"]["variance"] > 0
    assert res["histogram"] == {
        "col": "n_chars", "interval": 100.0,
        "buckets": [{"key": lo, "n_docs": n} for lo, n in
                    rd2.histogram(["the", "table"], "n_chars", 100.0)],
    }
    # --stats-by: per-value stats (ES terms+stats sub-aggregation)
    rc, res = run_cli(capsys, [
        "query", "--index", idx, "the table", "-k", "2",
        "--stats-by", "lang:n_chars",
    ])
    assert rc == 0
    assert res["stats_by"] == {
        "by": "lang", "col": "n_chars",
        "buckets": rd2.grouped_stats(["the", "table"], "lang", "n_chars",
                                     k=2),
    }
    assert len(res["stats_by"]["buckets"]) == 2  # -k cuts buckets

    # --percentiles: default percents and a custom list
    rc, res = run_cli(capsys, [
        "query", "--index", idx, "the table", "-k", "2",
        "--percentiles", "n_chars:50,90",
    ])
    assert rc == 0
    wantp = rd2.percentiles(["the", "table"], "n_chars", (50.0, 90.0))
    assert res["percentiles"] == {
        "col": "n_chars",
        "values": {"50.0": wantp[50.0], "90.0": wantp[90.0]},
    }

    # --fields: per-hit sidecar decoration (ES docvalue_fields)
    rc, res = run_cli(capsys, [
        "query", "--index", idx, "the table", "-k", "3",
        "--fields", "lang,source",
    ])
    assert rc == 0 and len(res["hits"]) == 3
    want_f = rd2.attr_values([h["doc_id"] for h in res["hits"]],
                             ["lang", "source"])
    for h in res["hits"]:
        assert h["fields"] == want_f[h["doc_id"]]
        assert set(h["fields"]) == {"lang", "source"}

    # --demote: ES boosting query (soft demotion)
    rc, res = run_cli(capsys, [
        "query", "--index", idx, "lang:en the table", "-k", "5",
        "--demote", "slow line", "--negative-boost", "0.3",
    ])
    assert rc == 0
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
        rd2.boosting_topk(["the", "table"], 5, ["slow", "line"], 0.3,
                          attrs=[("lang", "en")])
    import pytest as _p2

    with _p2.raises(SystemExit):  # non-plain demote terms
        run_cli(capsys, ["query", "--index", idx, "the",
                         "--demote", '"a phrase"'])
    with _p2.raises(SystemExit):  # phrase main query has no demote route
        run_cli(capsys, ["query", "--index", idx, '"the table"',
                         "--demote", "slow"])

    # --multi-terms: composite-key buckets (ES multi_terms)
    rc, res = run_cli(capsys, [
        "query", "--index", idx, "the table", "-k", "4",
        "--multi-terms", "lang,source",
    ])
    assert rc == 0
    assert res["multi_terms"] == {
        "cols": ["lang", "source"],
        "buckets": [{"values": list(t), "n_docs": n} for t, n in
                    rd2.multi_terms(["the", "table"],
                                    ["lang", "source"], 4)],
    }
    import pytest as _pt

    with _pt.raises(SystemExit):
        run_cli(capsys, ["query", "--index", idx, "the",
                         "--multi-terms", "lang"])

    # --rare: long-tail values (ES rare_terms)
    rc, res = run_cli(capsys, [
        "query", "--index", idx, "the table", "-k", "4",
        "--rare", "source",
    ])
    assert rc == 0
    assert res["rare"] == {
        "col": "source", "max_doc_count": None,
        "buckets": [{"value": v, "n_docs": n} for v, n in
                    rd2.rare_terms(["the", "table"], "source", 4)],
    }
    for bad in ("source:", "source:0", "source:x", ":3"):
        rc_bad = None
        try:
            run_cli(capsys, ["query", "--index", idx, "the",
                             "--rare", bad])
        except SystemExit:
            rc_bad = "exit"
        assert rc_bad == "exit", bad

    # --significant: overrepresented sidecar values (ES significant_terms)
    rc, res = run_cli(capsys, [
        "query", "--index", idx, "the table", "-k", "5",
        "--significant", "lang",
    ])
    assert rc == 0
    assert res["significant"]["lang"] == \
        rd2.significant_terms(["the", "table"], "lang", 5)

    # --top-hits: grouped search results (ES terms+top_hits)
    rc, res = run_cli(capsys, [
        "query", "--index", idx, "the table", "-k", "2",
        "--top-hits", "lang:2",
    ])
    assert rc == 0
    want_th = rd2.top_hits_by(["the", "table"], "lang", 2, 2)
    assert res["top_hits"] == {
        "col": "lang", "k_per_bucket": 2,
        "buckets": [
            {"value": b["value"], "n_docs": b["n_docs"],
             "hits": [{"doc_id": d, "score": s} for d, s in b["hits"]]}
            for b in want_th
        ],
    }
    assert len(res["top_hits"]["buckets"]) == 2  # -k cuts buckets

    # malformed specs are named CLI errors, not crashes
    import pytest as _pytest

    for bad in ("n_chars", "n_chars:0", "n_chars:x", "n_chars:-2",
                "n_chars:inf"):
        with _pytest.raises(SystemExit):
            run_cli(capsys, ["query", "--index", idx, "the",
                             "--histogram", bad])
    with _pytest.raises(SystemExit):
        run_cli(capsys, ["query", "--index", idx, "the",
                         "--stats-by", "lang"])
    for bad in ("n_chars:", "n_chars:101", "n_chars:x", "n_chars:-5"):
        with _pytest.raises(SystemExit):
            run_cli(capsys, ["query", "--index", idx, "the",
                             "--percentiles", bad])
    for bad in ("lang:", "lang:0", "lang:x"):
        with _pytest.raises(SystemExit):
            run_cli(capsys, ["query", "--index", idx, "the",
                             "--top-hits", bad])


def test_cli_stats_missing_index(ray_session, tmp_path, capsys):
    rc, out = run_cli(capsys, ["stats", "--index", str(tmp_path / "nope")])
    assert rc == 1 and "error" in out


def test_cli_pages_format(ray_session, tmp_path, capsys, sf_dir):
    """--format pages runs the html extraction chain; doc ids come from the
    trailing url integer, matching the library's bench/entry convention."""
    from wikirec_ray.sources.synth import build_pages

    pages_dir = build_pages(sf_dir)  # cached synth pages (url, html, ...)
    rc, built = run_cli(capsys, [
        "build", "--input", pages_dir, "--format", "pages",
        "--index", str(tmp_path / "pages_idx"), "--no-resume",
    ])
    assert rc == 0 and built["n_docs"] > 0

    # byte-identity invariant carried: the pages build indexes the same
    # corpus as the documents build, so a query answers identically
    docs_idx = str(tmp_path / "docs_idx")
    rc, built2 = run_cli(capsys, [
        "build", "--input", os.path.join(sf_dir, "documents.parquet"),
        "--format", "documents", "--index", docs_idx, "--no-resume",
    ])
    assert built2["n_docs"] == built["n_docs"]
    from wikirec_ray.pipelines.query import IndexReader

    r1 = IndexReader(str(tmp_path / "pages_idx"))
    r2 = IndexReader(docs_idx)
    assert r1.topk(["the", "table"], 10) == r2.topk(["the", "table"], 10)


def test_cli_serve_stdin(ray_session, tmp_path, capsys, monkeypatch, sf_dir):
    """serve: query lines in, JSON lines out; malformed queries error
    per-line without killing the server; EOF shuts the tier down."""
    import io
    import os as _os
    import sys as _sys

    docs = _os.path.join(sf_dir, "documents.parquet")
    idx = str(tmp_path / "serve_idx")
    rc, _ = run_cli(capsys, [
        "build", "--input", docs, "--format", "documents", "--index", idx,
        "--positions", "--no-resume",
    ])
    assert rc == 0

    from wikirec_ray.__main__ import main
    from wikirec_ray.pipelines.query import IndexReader, search

    rd = IndexReader(idx)
    page1 = search(IndexReader(idx), "table hash", 5)
    cursor = json.dumps({"query": "table hash", "k": 5,
                         "after": list(page1[-1])})
    monkeypatch.setattr(
        _sys, "stdin",
        io.StringIO('table hash\n\n"the table"\n'
                    'NEAR/99999999999999999(a b)\n' + cursor + "\n"
                    "{table} hash\n"           # invalid JSON -> plain query
                    '{"q": "table"}\n'))       # valid JSON, missing "query"
    rc = main(["serve", "--index", idx, "-k", "5",
               "--coordinators", "2", "--pool", "2"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["ready"] is True and lines[0]["pools"] == 1
    assert [(h["doc_id"], h["score"]) for h in lines[1]["hits"]] == \
        search(rd, "table hash", 5)
    assert [(h["doc_id"], h["score"]) for h in lines[2]["hits"]] == \
        search(rd, '"the table"', 5)
    # the huge NEAR window CLAMPS (parse surface) and still answers
    assert "hits" in lines[3]
    # JSON request form: {"query", "k", "after"} pages past page 1
    assert [(h["doc_id"], h["score"]) for h in lines[4]["hits"]] == \
        search(rd, "table hash", 5, after=page1[-1])
    # a '{'-leading line that is NOT JSON stays a plain-text query (the
    # tokenizer strips the braces), never a parse error
    assert [(h["doc_id"], h["score"]) for h in lines[5]["hits"]] == \
        search(rd, "{table} hash", 5)
    # valid JSON missing "query" gets a named error, not a bare KeyError
    assert "query" in lines[6]["error"] and "hits" not in lines[6]
    assert len(lines) == 7  # blank line skipped

