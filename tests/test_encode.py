"""Text-encoder stage (SURVEY T3 slot): deterministic fake kernel drives
the embed → ANN flow end-to-end; real kernel gated on sentence-transformers."""

import numpy as np
import pyarrow as pa
import pytest


def _docs(ray_session, rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_encode_deterministic_and_similarity(ray_session):
    from wikirec_ray.pipelines.encode import encode_corpus

    rows = [
        (0, "spark join window hash merge sort"),
        (1, "spark join window hash merge sort"),       # identical text
        (2, "spark join window hash merge filter"),     # near-identical
        (3, "customer order line part value vector"),   # disjoint
    ]
    ds = _docs(ray_session, rows)
    e1 = {r["doc_id"]: np.asarray(r["embedding"], np.float64)
          for r in encode_corpus(ds, dim=64).take_all()}
    e2 = {r["doc_id"]: np.asarray(r["embedding"], np.float64)
          for r in encode_corpus(ds, dim=64).take_all()}
    # deterministic across runs; identical text -> identical vector
    assert all(np.array_equal(e1[k], e2[k]) for k in e1)
    assert np.array_equal(e1[0], e1[1])
    # unit norm; near-dup closer than disjoint
    assert abs(np.linalg.norm(e1[0]) - 1.0) < 1e-9
    assert e1[0] @ e1[2] > e1[0] @ e1[3] + 0.3


def test_encode_feeds_ann(ray_session):
    """The reference's embed → similar-items flow: encode the corpus, run
    brute-force cosine top-k over the produced embedding column."""
    from wikirec_ray.pipelines.ann import brute_force_topk
    from wikirec_ray.pipelines.encode import encode_corpus

    rows = [(i, ("spark join window " if i < 5 else "customer order line ") * 4
             + f"tok{i}") for i in range(10)]
    emb = encode_corpus(_docs(ray_session, rows), dim=64).materialize()
    q = {r["doc_id"]: np.asarray(r["embedding"]) for r in emb.take_all()}
    out = brute_force_topk(
        emb, [0], np.asarray([q[0]]), k=4, id_col="doc_id", vec_col="embedding"
    ).take_all()
    neighbors = {r["neighbor_id"] for r in out}
    assert neighbors == {1, 2, 3, 4}  # same-group docs win


def test_encode_kernel_gate():
    from wikirec_ray.pipelines.encode import (
        TextEncoderStage, _try_sentence_transformers,
    )

    have = _try_sentence_transformers() is not None
    if not have:
        # auto resolves to fake without touching the network; the real
        # constructor (which would download a model) is only asserted to
        # raise when the package is absent
        st = TextEncoderStage(kernel="auto")
        assert st.kernel == "fake"
        with pytest.raises(NotImplementedError):
            TextEncoderStage(kernel="real")
    with pytest.raises(ValueError):
        TextEncoderStage(kernel="fake", dim=0)
    with pytest.raises(ValueError):
        TextEncoderStage(kernel="quantum")


def test_encode_real_st_parity():
    """Output-contract parity when sentence-transformers exists (skips in
    this container): the real kernel must emit the same schema/shape/
    determinism contract as the fake one the rest of the suite pins."""
    pytest.importorskip("sentence_transformers")
    import os

    import pyarrow as pa

    from wikirec_ray.pipelines.encode import TextEncoderStage

    try:
        st = TextEncoderStage(kernel="real")
    except Exception as e:  # model download blocked / not cached
        pytest.skip(f"sentence-transformers model unavailable: {e}")
    batch = pa.table(
        {"doc_id": pa.array([1, 2, 3], pa.int64()),
         "text": ["spark join query", "", None]}
    )
    out = st(batch)
    # contract shared with the fake kernel (test_encode_deterministic...):
    # (id passthrough, fixed_size_list<double> of stage dim, row-count
    # preserved, null/empty text crash-free, bitwise-deterministic re-run)
    assert out.column_names == ["doc_id", "embedding"]
    assert out.num_rows == 3
    emb = out["embedding"].combine_chunks()
    assert pa.types.is_fixed_size_list(emb.type)
    assert emb.type.list_size == st.dim
    assert pa.types.is_float64(emb.type.value_type)
    again = st(batch)
    assert emb.equals(again["embedding"].combine_chunks())
