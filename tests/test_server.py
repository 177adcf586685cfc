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
