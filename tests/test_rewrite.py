"""explain() score breakdowns, synonym rewriting, and the engine-agnostic
rewrite helpers (MLT / PRF / term selection) served == local.

Oracle strategy: explain totals are pinned against the already-oracle-
checked topk scores (exact equality — same kernel, same addend order);
synonym rewriting at weight 1.0 must equal plain multiset retrieval;
every engine-agnostic helper must return identical results on the local
reader and the range-sharded coordinator.
"""
import pytest

from wikirec_ray.pipelines.query import (
    IndexReader,
    mlt_topk,
    prf_expand,
    prf_topk,
    select_query_terms_for,
    synonym_expand,
)

MLT_TEXT = (
    "spark join vector window hash spark join order sort merge "
    "group stream key value big"
)


# ---------------------------------------------------------------------------
# explain
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("terms,weights", [
    (["spark", "join"], None),
    (["spark", "join", "vector"], [2.5, 1.0, 0.25]),
    (["the", "spark", "spark"], None),          # duplicate occurrences
    (["spark", "absentterm"], None),            # OOV reported, zero contrib
])
def test_explain_total_equals_topk_score(built_index, terms, weights):
    reader = IndexReader(built_index[0])
    hits = reader.topk(terms, 10, weights=weights)
    assert hits
    for doc, score in hits:
        ex = reader.explain(terms, doc, weights=weights)
        assert ex["score"] == score, (doc, ex)
        assert not ex["deleted"]
        # components recompose: every positive contribution has tf > 0,
        # absent/OOV terms report exactly 0.0
        for t in ex["terms"]:
            assert (t["contribution"] > 0) == (t["tf"] > 0 and t["idf"] > 0)
        if weights is None:
            assert all(
                t["weight"] == float(terms.count(t["term"]))
                for t in ex["terms"]
            )


def test_explain_non_matching_and_oov(built_index):
    reader = IndexReader(built_index[0])
    ex = reader.explain(["absentterm"], 0)
    assert ex["score"] == 0.0
    assert ex["terms"][0]["df"] == 0 and ex["terms"][0]["idf"] == 0.0
    assert ex["terms"][0]["contribution"] == 0.0
    with pytest.raises(ValueError, match="doc range"):
        reader.explain(["spark"], 10**9)


# ---------------------------------------------------------------------------
# synonyms
# ---------------------------------------------------------------------------


def test_synonym_expand_pure():
    t, w = synonym_expand(
        ["car", "fast"], {"car": ["auto", "automobile"]}, syn_weight=0.5
    )
    assert t == ["car", "auto", "automobile", "fast"]
    assert w == [1.0, 0.5, 0.5, 1.0]
    # input weights compose multiplicatively; unknown terms untouched
    t, w = synonym_expand(["car"], {"car": ["auto"]}, syn_weight=0.5,
                          weights=[2.0])
    assert t == ["car", "auto"] and w == [2.0, 1.0]
    with pytest.raises(ValueError):
        synonym_expand(["car"], {}, syn_weight=0.0)


def test_synonym_weight_one_equals_plain_multiset(built_index):
    reader = IndexReader(built_index[0])
    t, w = synonym_expand(["spark"], {"spark": ["join"]}, syn_weight=1.0)
    assert reader.topk(t, 10, weights=w) == reader.topk(["spark", "join"], 10)
    # discounted synonym == explicit boost weights
    t, w = synonym_expand(["spark"], {"spark": ["join"]}, syn_weight=0.5)
    assert reader.topk(t, 10, weights=w) == reader.topk(
        ["spark", "join"], 10, weights=[1.0, 0.5]
    )


# ---------------------------------------------------------------------------
# engine-agnostic rewrite helpers: served == local
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def range_engine(built_index, ray_session):
    from wikirec_ray.state.server import RangeShardedQueryEngine

    eng = RangeShardedQueryEngine(built_index[0], pool_size=2)
    yield eng
    eng.shutdown()


def test_idfs_served_equals_local(built_index, range_engine):
    reader = IndexReader(built_index[0])
    terms = ["spark", "join", "absentterm", "the"]
    assert range_engine.idfs(terms) == reader.idfs(terms)


def test_select_and_mlt_served_equals_local(built_index, range_engine):
    reader = IndexReader(built_index[0])
    assert select_query_terms_for(range_engine, MLT_TEXT, 8) == \
        reader.select_query_terms(MLT_TEXT, 8)
    local = reader.more_like_this(MLT_TEXT, k=10, max_query_terms=8)
    assert local
    assert mlt_topk(range_engine, MLT_TEXT, k=10, max_query_terms=8) == local
    # rank-exact exclusion holds served too
    excl = local[0][0]
    assert mlt_topk(range_engine, MLT_TEXT, k=10, max_query_terms=8,
                    exclude=excl) == \
        reader.more_like_this(MLT_TEXT, k=10, max_query_terms=8,
                              exclude=excl)


def test_prf_served_equals_local(built_index, range_engine, ray_session,
                                 sf_dir, tmp_path_factory):
    import os

    import ray.data

    from wikirec_ray.pipelines.export import export_clean_corpus
    from wikirec_ray.state.docstore import DocStore

    out = str(tmp_path_factory.mktemp("prf_served"))
    export_clean_corpus(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        ),
        out, range_size=64, resume=False,
    )
    store = DocStore(out)
    reader = IndexReader(built_index[0])
    terms = ["spark", "join"]
    local = prf_expand(reader, terms, store, fb_docs=5, fb_terms=8)
    served = prf_expand(range_engine, terms, store, fb_docs=5, fb_terms=8)
    assert served == local and len(local[0]) > len(terms)
    assert prf_topk(range_engine, terms, store, k=10,
                    fb_docs=5, fb_terms=8) == \
        prf_topk(reader, terms, store, k=10, fb_docs=5, fb_terms=8)


def test_explain_tombstoned_doc(ray_session, sf_dir, tmp_path_factory):
    """A deleted doc explains with its would-be components but score 0.0
    and deleted=True (the dense path zeroes tombstones, so no ranking
    ever emits it) — pinning the documented tombstone contract."""
    import os

    import ray.data

    from wikirec_ray.stages.index_build import build_index
    from wikirec_ray.stages.lifecycle import delete_docs

    idx = str(tmp_path_factory.mktemp("explain_del") / "idx")
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(ds, idx, resume=False)
    victim = IndexReader(idx).topk(["spark", "join"], 1)[0][0]
    delete_docs(idx, [victim])
    reader = IndexReader(idx)  # tombstones load at construction
    ex = reader.explain(["spark", "join"], victim)
    assert ex["deleted"] is True and ex["score"] == 0.0
    # components still show what the doc WOULD have scored
    assert any(t["contribution"] > 0 for t in ex["terms"])
    assert all(d != victim for d, _ in reader.topk(["spark", "join"], 50))
