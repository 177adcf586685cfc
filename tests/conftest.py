"""Session-scoped Ray fixture — ONE ray.init per pytest session.

Mirrors the reference's conftest pattern of building shared fixtures once
(``/root/reference/tests/conftest.py:22-78`` does a mini end-to-end corpus
build at session setup); here the expensive shared fixture is the Ray
runtime plus a built index over sf0.001.
"""

from __future__ import annotations

import os
import shutil

import pytest

SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def built_index(ray_session, sf_dir, tmp_path_factory):
    """An index built once over sf0.001 documents; shared by query tests."""
    import ray.data

    from wikirec_ray.stages.index_build import build_index

    index_dir = str(tmp_path_factory.mktemp("index"))
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    manifest = build_index(ds, index_dir, resume=False)
    return index_dir, manifest


@pytest.fixture(scope="session")
def corpus_tokens(sf_dir):
    """Single-process oracle tokenization of the documents table."""
    import re

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    return {
        int(d): [w for w in re.split(r"[^a-z0-9]+", (x or "").lower()) if w]
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }
