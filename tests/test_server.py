"""Distributed (actor-pool) query serving == single-process IndexReader."""

import pytest


@pytest.fixture(scope="module")
def engine(built_index, ray_session):
    from wikirec_ray.state.server import DistributedQueryEngine

    index_dir, _ = built_index
    eng = DistributedQueryEngine(index_dir, pool_size=3)
    yield eng
    eng.shutdown()


QUERIES = [
    ["spark", "join"],
    ["vector", "window", "hash"],
    ["the"],
    ["absentterm"],
    ["order", "sort", "merge", "part", "scan"],
    ["spark", "absentterm"],
]


@pytest.mark.parametrize("k", [1, 10, 50])
def test_distributed_equals_local(engine, built_index, k):
    from wikirec_ray.pipelines.query import IndexReader

    index_dir, _ = built_index
    reader = IndexReader(index_dir)
    for q in QUERIES:
        assert engine.topk(q, k) == reader.topk(q, k), (q, k)


def test_terms_route_to_owners_only(engine):
    # a single-term query touches exactly one server (term-sharded routing)
    import zlib

    from wikirec_ray.schema import N_TERM_PARTITIONS

    tpart = zlib.crc32(b"spark") % N_TERM_PARTITIONS
    assert engine.owner_of[tpart] in range(len(engine.servers))
    assert engine.topk(["spark"], 5)  # and it actually answers


@pytest.fixture(scope="module")
def spread_index(ray_session, tmp_path_factory):
    """Index whose doc ids span several 8192-wide doc ranges (doc_id*37), so
    range sharding actually splits the corpus."""
    import os

    import pyarrow as pa
    import ray.data

    from wikirec_ray.stages.index_build import build_index

    sf = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = str(tmp_path_factory.mktemp("spread_idx"))
    ds = ray.data.read_parquet(
        os.path.join(sf, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(
        lambda b: pa.table(
            {"doc_id": pa.compute.multiply(b["doc_id"], 37), "text": b["text"]}
        ),
        batch_format="pyarrow",
    )
    build_index(ds, d, resume=False)
    return d


def test_range_sharded_equals_local(spread_index, ray_session):
    from wikirec_ray.pipelines.query import IndexReader
    from wikirec_ray.state.server import RangeShardedQueryEngine

    eng = RangeShardedQueryEngine(spread_index, pool_size=3)
    try:
        assert eng.n_ranges >= 2, "corpus must span >= 2 doc ranges"
        assert len(eng.servers) == 3
        reader = IndexReader(spread_index)
        for q in QUERIES:
            for k in (1, 10, 50):
                assert eng.topk(q, k) == reader.topk(q, k), (q, k)
    finally:
        eng.shutdown()


@pytest.fixture(scope="module")
def spread_pos_index(ray_session, tmp_path_factory):
    """Positional sibling of spread_index (same multi-range corpus,
    store_positions=True) for distributed phrase serving."""
    import os

    import pyarrow as pa
    import ray.data

    from wikirec_ray.stages.index_build import build_index

    sf = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = str(tmp_path_factory.mktemp("spread_pos_idx"))
    ds = ray.data.read_parquet(
        os.path.join(sf, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(
        lambda b: pa.table(
            {"doc_id": pa.compute.multiply(b["doc_id"], 37), "text": b["text"]}
        ),
        batch_format="pyarrow",
    )
    build_index(ds, d, resume=False, store_positions=True)
    return d


PHRASES = [
    ["table", "hash"],
    ["the", "customer"],
    ["merge"],
    ["key", "key"],
    ["slow", "key", "value"],
    ["absentterm", "table"],
]


def test_range_sharded_phrase_equals_local(spread_pos_index, ray_session):
    """Distributed exact-phrase == IndexReader.phrase_topk: adjacency is
    per-doc, every doc lives in one range shard, so per-shard
    phrase_match_docs + k-way merge is exact."""
    from wikirec_ray.pipelines.query import IndexReader
    from wikirec_ray.state.server import RangeShardedQueryEngine

    eng = RangeShardedQueryEngine(spread_pos_index, pool_size=3)
    try:
        assert eng.n_ranges >= 2
        reader = IndexReader(spread_pos_index)
        n_nonempty = 0
        for q in PHRASES:
            for k in (1, 10, 50):
                got = eng.phrase_topk(q, k)
                assert got == reader.phrase_topk(q, k), (q, k)
                n_nonempty += bool(got)
        assert n_nonempty > 0, "phrase set must hit the corpus"
        assert eng.phrase_topk([], 10) == []
    finally:
        eng.shutdown()


def test_range_sharded_phrase_requires_positions(spread_index, ray_session):
    """A non-positional index refuses distributed phrase queries loudly
    (the shard's positions_select raises through ray.get)."""
    import ray as _ray

    from wikirec_ray.state.server import RangeShardedQueryEngine

    eng = RangeShardedQueryEngine(spread_index, pool_size=2)
    try:
        with pytest.raises((_ray.exceptions.RayTaskError, ValueError),
                           match="store_positions"):
            eng.phrase_topk(["table", "hash"], 10)
    finally:
        eng.shutdown()


def test_range_sharded_near_equals_local(spread_pos_index, ray_session):
    """Distributed NEAR == IndexReader.near_topk: the coordinator fixes the
    anchor from global dfs (max idf == min df, ties lexicographic), each
    range shard matches proximity locally with the shared kernel.  Covers
    2/3-term queries, duplicate terms, window=0, a huge window (degrades to
    AND == plain conjunctive filter), and an absent term."""
    from wikirec_ray.pipelines.query import IndexReader
    from wikirec_ray.state.server import RangeShardedQueryEngine

    eng = RangeShardedQueryEngine(spread_pos_index, pool_size=3)
    try:
        reader = IndexReader(spread_pos_index)
        n_nonempty = 0
        near_qs = [q for q in PHRASES if q] + [
            ["table", "hash", "join"],
            ["table", "table", "hash"],
        ]
        for q in near_qs:
            for w in (0, 3, 8, 10_000):
                got = eng.near_topk(q, 10, window=w)
                assert got == reader.near_topk(q, 10, window=w), (q, w)
                n_nonempty += bool(got)
        assert n_nonempty > 0, "NEAR set must hit the corpus"
        assert eng.near_topk([], 10) == []
        assert eng.near_topk(["zzzabsent", "table"], 10) == []
        with pytest.raises(ValueError, match="2\\^31"):
            eng.near_topk(["table", "hash"], 10, window=1 << 31)
    finally:
        eng.shutdown()


def test_range_sharded_sloppy_equals_local(spread_pos_index, ray_session):
    """Distributed sloppy phrase == IndexReader.sloppy_phrase_topk: the
    in-order span predicate is per-doc, so each range shard matches
    locally with the shared kernel.  Covers slop=0 (the exact-phrase /
    precompute route), small and huge slops, duplicate terms, an absent
    term, and the search() '"..."~n' surface."""
    from wikirec_ray.pipelines.query import IndexReader, search
    from wikirec_ray.state.server import RangeShardedQueryEngine

    eng = RangeShardedQueryEngine(spread_pos_index, pool_size=3)
    try:
        reader = IndexReader(spread_pos_index)
        n_nonempty = 0
        qs = [q for q in PHRASES if q] + [["table", "table", "hash"]]
        for q in qs:
            for slop in (0, 1, 3, 10_000):
                got = eng.sloppy_phrase_topk(q, 10, slop=slop)
                assert got == reader.sloppy_phrase_topk(q, 10, slop=slop), \
                    (q, slop)
                n_nonempty += bool(got)
        assert n_nonempty > 0, "sloppy set must hit the corpus"
        assert eng.sloppy_phrase_topk([], 10, slop=2) == []
        assert eng.sloppy_phrase_topk(["table", "hash"], 10, slop=-1) == []
        with pytest.raises(ValueError, match="2\\^31"):
            eng.sloppy_phrase_topk(["table", "hash"], 10, slop=1 << 31)
        assert search(eng, '"the customer"~2', 5) == \
            search(reader, '"the customer"~2', 5)
    finally:
        eng.shutdown()


def test_range_sharded_duplicate_query_terms(spread_pos_index, ray_session):
    """A repeated query term contributes once per occurrence in EVERY
    engine (review r5: the range-sharded coordinator deduped terms and
    silently halved duplicate-term scores)."""
    from wikirec_ray.pipelines.query import IndexReader
    from wikirec_ray.state.server import (
        DistributedQueryEngine,
        RangeShardedQueryEngine,
    )

    reader = IndexReader(spread_pos_index)
    qs = [["table", "table"], ["table", "table", "hash"],
          ["hash", "table", "hash", "hash"]]
    eng = RangeShardedQueryEngine(spread_pos_index, pool_size=3)
    eng2 = DistributedQueryEngine(spread_pos_index, pool_size=2)
    try:
        for q in qs:
            want = reader.topk(q, 10)
            assert want, q
            assert eng.topk(q, 10) == want, q
            assert eng2.topk(q, 10) == want, q
            # the WAND route must double-count too (review r5: unscaled
            # cursor dedupe single-counted duplicates on this path only)
            assert reader.topk_wand(q, 10, force_wand=True) == want, q
    finally:
        eng.shutdown()
        eng2.shutdown()


def test_replicated_coordinators_share_one_pool(spread_pos_index, ray_session):
    """ReplicatedSearchTier: N coordinator actors attached to ONE shard +
    resolver pool return exactly the local reader's results on every route
    (BM25 / phrase / NEAR via the search() surface), regardless of which
    replica serves the query; an attached coordinator's shutdown leaves the
    shared pool alive."""
    from wikirec_ray.pipelines.query import IndexReader, search
    from wikirec_ray.state.server import (
        RangeShardedQueryEngine,
        ReplicatedSearchTier,
    )

    reader = IndexReader(spread_pos_index)
    tier = ReplicatedSearchTier(spread_pos_index, n_coordinators=3,
                                pool_size=3, n_pools=2)
    try:
        # n_pools clamps to the coordinator count (an unreachable pool
        # would only burn actors + segment memory)
        assert len(tier.pools) == 2 and len(tier.coordinators) == 3
        from wikirec_ray.state.server import ReplicatedSearchTier as _T
        t2 = _T(spread_pos_index, n_coordinators=1, pool_size=2, n_pools=5)
        assert len(t2.pools) == 1
        t2.shutdown()
        # duplicate terms appear on the BM25 and NEAR routes too (CLAUDE.md:
        # every retrieval route needs duplicate-terms parity)
        qstrings = ['table hash', '"table hash"', 'NEAR/6(table hash)',
                    'the customer', '"key key"', 'absentterm',
                    'table table hash', 'NEAR/6(table table hash)']
        n_nonempty = 0
        for q in qstrings:
            want = search(reader, q, 10)
            for cid in range(3):  # every replica answers identically
                assert tier.search(q, 10, client_id=cid) == want, (q, cid)
            n_nonempty += bool(want)
        assert n_nonempty >= 4, "query set must hit the corpus"

        # an ATTACHED coordinator's shutdown must not kill the shared pool
        attached = RangeShardedQueryEngine(
            spread_pos_index, handles=tier.base.handles())
        assert attached.topk(["table", "hash"], 5) == \
            reader.topk(["table", "hash"], 5)
        attached.shutdown()
        assert tier.search("table hash", 5) == reader.topk(["table", "hash"], 5)
    finally:
        tier.shutdown()


def test_range_sharded_suggest_and_fuzzy_equal_local(spread_index, ray_session):
    """The served lexicon (tpart-sharded DfResolvers, concatenation merge)
    must equal the local IndexReader on every surface: suggest, expand,
    fuzzy_topk (incl. duplicate-occurrence parity), and the search() ~
    route."""
    from wikirec_ray.pipelines.query import IndexReader, search
    from wikirec_ray.state.server import RangeShardedQueryEngine

    eng = RangeShardedQueryEngine(
        spread_index, pool_size=3, resolver_pool_size=2
    )
    try:
        assert len(eng.resolvers) == 2  # the merge is actually distributed
        reader = IndexReader(spread_index)
        for prefix in ["", "s", "sp", "spar", "c", "zz"]:
            for k in (1, 3, 100):
                assert eng.suggest(prefix, k) == reader.suggest(prefix, k)
        assert eng.suggest("s", 0) == []
        for sfx in ["", "e", "n", "k", "ing", "zz", "E"]:
            for k in (1, 3, 100):
                assert eng.suggest_suffix(sfx, k) == \
                    reader.suggest_suffix(sfx, k), sfx
        assert eng.suggest_suffix("e", 0) == []
        for q in ["spark", "merg", "tabl", "ag", "zzzzz", "", "MERG"]:
            assert eng.fuzzy_expand(q) == reader.fuzzy_expand(q), q
        assert eng.suggest("SP", 3) == reader.suggest("sp", 3)
        assert eng.fuzzy_expand_many(["merg", "tabl", "zz"]) == \
            reader.fuzzy_expand_many(["merg", "tabl", "zz"])
        for terms in (["merg", "tabl"], ["ag"], ["merg", "merg"], ["zzz"]):
            for k in (1, 10):
                assert eng.fuzzy_topk(terms, k) == reader.fuzzy_topk(terms, k)
        # distance-2 route: expansion, mixed-pair batches, topk, search()
        for q in ["spark", "merg", "tabl", "ag", "zzzzz", "MERG"]:
            assert eng.fuzzy_expand(q, 2) == reader.fuzzy_expand(q, 2), q
            got2 = set(t for t, _ in eng.fuzzy_expand(q, 2))
            assert set(t for t, _ in eng.fuzzy_expand(q, 1)) <= got2
        assert eng.fuzzy_expand_many([("merg", 2), "tabl", ("zz", 1)]) == \
            reader.fuzzy_expand_many([("merg", 2), "tabl", ("zz", 1)])
        for terms in (["merg", "tabl"], ["merg", "merg"]):
            assert eng.fuzzy_topk(terms, 10, d=2) == \
                reader.fuzzy_topk(terms, 10, d=2)
        for q in ("merg~ join", "sp* join", "merg~ c* join",
                  "merg~2 join", "merg~1 tabl~2 c* join"):
            assert search(eng, q, k=5) == search(reader, q, k=5), q
        # regex route: shard-disjoint concat merge must equal local, and
        # invalid patterns surface as ValueError (Ray subclasses it)
        for pat in ["s.*", "(sp|c).*k?", "zzz+", ".*e"]:
            for k in (1, 3, 100):
                assert eng.regex_terms(pat, k) == \
                    reader.regex_terms(pat, k), pat
        assert eng.regex_terms("s.*", 0) == []
        assert search(eng, "/s.*/ join", k=5) == \
            search(reader, "/s.*/ join", k=5)
        with pytest.raises(ValueError):
            eng.regex_terms("(unclosed", 5)
    finally:
        eng.shutdown()
