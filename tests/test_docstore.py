"""Stored-fields DocStore + query-then-fetch search_results.

Oracle: the export's texts are the documents table's texts verbatim
(export_clean_corpus writes surviving docs unchanged), so fetch correctness
is a direct dict compare against the parquet; snippet correctness rides the
already-oracle-pinned KWIC kernels (test_pipelines.py) — here we pin the
per-hit wiring: mode routing, first-occurrence choice, rank preservation,
and the absent-doc contract.
"""
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from wikirec_ray.pipelines.query import IndexReader, search
from wikirec_ray.state.docstore import DocStore, search_results


@pytest.fixture(scope="module")
def exported(ray_session, sf_dir, tmp_path_factory):
    import ray.data

    from wikirec_ray.pipelines.export import export_clean_corpus

    out = str(tmp_path_factory.mktemp("docstore_export"))
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    # small ranges so fetches genuinely cross partition files
    export_clean_corpus(ds, out, range_size=64, resume=False)
    return out


@pytest.fixture(scope="module")
def pos_index(ray_session, sf_dir, tmp_path_factory):
    """Positional variant of built_index (phrase snippets need positions)."""
    import ray.data

    from wikirec_ray.stages.index_build import build_index

    idx = str(tmp_path_factory.mktemp("docstore_posidx"))
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(ds, idx, resume=False, store_positions=True)
    return idx


@pytest.fixture(scope="module")
def doc_texts(sf_dir):
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def test_fetch_exact_texts_across_ranges(exported, doc_texts):
    store = DocStore(exported)
    # ids spread over several 64-doc ranges, plus duplicates in the request
    ids = [0, 1, 63, 64, 65, 200, 301, 499, 499]
    got = store.fetch(ids)
    present = [i for i in set(ids) if i in doc_texts]
    # exact dedup may drop ids whose text duplicates an earlier doc — every
    # RETURNED text must match the source, and non-duplicate ids must appear
    for i, row in got.items():
        assert row["text"] == doc_texts[i]
    # dedup is corpus-GLOBAL (survivor = min doc_id per text), so a probed
    # id is only guaranteed present when its text is unique corpus-wide
    from collections import Counter

    text_counts = Counter(doc_texts.values())
    uniq = [i for i in present if text_counts[doc_texts[i]] == 1]
    assert set(uniq) <= set(got)


def test_fetch_doc_id_in_requested_columns(exported, doc_texts):
    store = DocStore(exported)
    got = store.fetch([0, 65], columns=["doc_id", "text"])
    for i, row in got.items():
        assert row["doc_id"] == i
        assert row["text"] == doc_texts[i]


def test_fetch_absent_and_empty(exported):
    store = DocStore(exported)
    assert store.fetch([]) == {}
    assert store.fetch([1 << 40]) == {}
    got = store.fetch([0, 1 << 40])
    assert set(got) <= {0}


def test_cache_is_bounded(exported):
    store = DocStore(exported, cache_ranges=2)
    for i in range(0, 500, 64):  # touch every range
        store.fetch([i])
    assert len(store._cache) <= 2
    # and a cached range still answers correctly after eviction churn
    assert 0 in store.fetch([0])


def test_manifest_required(tmp_path):
    with pytest.raises(FileNotFoundError):
        DocStore(str(tmp_path))


def test_search_results_bm25_and_phrase(built_index, exported, corpus_tokens):
    reader = IndexReader(built_index[0])
    store = DocStore(exported)

    rows = search_results(reader, store, "spark join", k=5, snippet_window=3)
    hits = search(reader, "spark join", 5)
    assert [(r["doc_id"], r["score"]) for r in rows] == hits
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        if r["snippet"] is not None:
            toks = r["snippet"].split(" ")
            assert "spark" in toks or "join" in toks
            # the snippet is a contiguous token window of the doc
            doc = corpus_tokens[r["doc_id"]]
            j = " ".join(doc)
            assert r["snippet"] in j

def test_search_results_pages_with_after(built_index, exported):
    """Deep paging hydrates only the requested page: page 2 via the
    previous page's last hit equals rows 6-10 of one big fetch."""
    reader = IndexReader(built_index[0])
    store = DocStore(exported)
    big = search_results(reader, store, "spark join", k=10)
    p1 = search_results(reader, store, "spark join", k=5)
    last = (p1[-1]["doc_id"], p1[-1]["score"])
    p2 = search_results(reader, store, "spark join", k=5, after=last)
    # ranks restart per page (rank is page-local position), rest identical
    strip = lambda rows: [
        {k: v for k, v in r.items() if k != "rank"} for r in rows
    ]
    assert strip(p1) + strip(p2) == strip(big)


def test_search_results_phrase_snippet(pos_index, exported):
    store = DocStore(exported)
    prows = search_results(
        IndexReader(pos_index), store, '"spark join"', k=5, snippet_window=2
    )
    assert prows
    for r in prows:
        if r["snippet"] is not None:
            assert "spark join" in r["snippet"]


def test_search_results_boolean_excludes_must_not(
    built_index, exported, corpus_tokens
):
    reader = IndexReader(built_index[0])
    store = DocStore(exported)
    rows = search_results(
        reader, store, "spark -join +table", k=5, snippet_window=0
    )
    # window 0 → the snippet IS the highlighted token; must_not term never
    # chosen as the highlight
    for r in rows:
        if r["snippet"] is not None:
            assert r["snippet"] in ("spark", "table")


def test_search_results_missing_doc_keeps_rank(
    ray_session, built_index, sf_dir, tmp_path_factory
):
    import ray.data

    from wikirec_ray.pipelines.export import export_clean_corpus

    reader = IndexReader(built_index[0])
    hits = search(reader, "spark join", 5)
    assert hits
    drop = hits[0][0]  # export everything EXCEPT the top hit
    out = str(tmp_path_factory.mktemp("docstore_subset"))
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).filter(lambda r: r["doc_id"] != drop)
    export_clean_corpus(ds, out, range_size=64, resume=False)

    rows = search_results(
        IndexReader(built_index[0]), DocStore(out), "spark join", k=5
    )
    assert [(r["doc_id"], r["score"]) for r in rows] == hits
    assert rows[0]["snippet"] is None
    assert any(r["snippet"] is not None for r in rows[1:])


def test_cli_query_store(built_index, exported, capsys):
    import json

    from wikirec_ray.__main__ import main

    rc = main([
        "query", "--index", built_index[0], "spark join", "-k", "3",
        "--store", exported, "--snippet-window", "2",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    lib = search_results(
        IndexReader(built_index[0]), DocStore(exported), "spark join", 3,
        snippet_window=2,
    )
    assert out["hits"] == [
        {"rank": r["rank"], "doc_id": r["doc_id"], "score": r["score"],
         "snippet": r["snippet"]} for r in lib
    ]

    # --significant-text rides the store: == the library call
    from wikirec_ray.pipelines.query import significant_text

    rc = main([
        "query", "--index", built_index[0], "spark join", "-k", "5",
        "--store", exported, "--significant-text", "20",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want = significant_text(
        IndexReader(built_index[0]), ["spark", "join"], DocStore(exported),
        k=5, sample=20,
    )
    assert out["significant_text"] == want and want
    # without --store it is a named error
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["query", "--index", built_index[0], "spark join",
              "--significant-text", "20"])


def test_search_results_expand_highlights_expansions(
    built_index, exported
):
    reader = IndexReader(built_index[0])
    store = DocStore(exported)
    rows = search_results(reader, store, "spar*", k=5, snippet_window=0)
    assert rows
    for r in rows:
        if r["snippet"] is not None:
            assert r["snippet"].startswith("spar")


def test_search_results_negative_window_clamps(built_index, exported):
    # a user-facing knob must not crash on bad input — clamps to window 0
    reader = IndexReader(built_index[0])
    store = DocStore(exported)
    rows = search_results(
        reader, store, "spark join", k=3, snippet_window=-2
    )
    zero = search_results(
        reader, store, "spark join", k=3, snippet_window=0
    )
    assert rows == zero
