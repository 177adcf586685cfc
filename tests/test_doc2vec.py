"""Distributed PV-DBOW trainer (SURVEY T4): planted-structure recovery,
determinism, loss improvement."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def grouped_corpus(ray_session):
    import ray.data

    rng = np.random.default_rng(17)
    wa = "spark join window hash merge sort".split()
    wb = "customer order line part value vector".split()
    rows = []
    for i in range(60):
        src = wa if i % 2 == 0 else wb
        words = [src[int(x)] for x in rng.integers(0, len(src), 30)]
        rows.append((i, " ".join(words)))
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _vecs(model):
    out = {}
    for r in model["docvecs"].take_all():
        v = np.asarray(r["vec"], np.float64)
        out[r["doc_id"]] = v / np.linalg.norm(v)
    return out


def test_doc2vec_groups_and_loss(grouped_corpus):
    from wikirec_ray.pipelines.doc2vec import train_doc2vec

    m = train_doc2vec(grouped_corpus, dim=16, epochs=25, lr=1.0, negatives=2, seed=29)
    assert m["losses"][-1] < m["losses"][0]  # training reduces the loss
    vecs = _vecs(m)
    # same-group docs end up closer than cross-group docs on average
    even = [vecs[i] for i in range(0, 60, 2)]
    odd = [vecs[i] for i in range(1, 60, 2)]
    within = np.mean([even[0] @ v for v in even[1:]] + [odd[0] @ v for v in odd[1:]])
    across = np.mean([even[0] @ v for v in odd] + [odd[0] @ v for v in even])
    assert within > across + 0.2, (within, across)


def test_doc2vec_deterministic(grouped_corpus):
    from wikirec_ray.pipelines.doc2vec import train_doc2vec

    m1 = train_doc2vec(grouped_corpus, dim=8, epochs=2, seed=7)
    m2 = train_doc2vec(grouped_corpus, dim=8, epochs=2, seed=7)
    assert np.array_equal(m1["word_vectors"], m2["word_vectors"])
    v1, v2 = _vecs(m1), _vecs(m2)
    assert all(np.array_equal(v1[k], v2[k]) for k in v1)
    assert m1["losses"] == m2["losses"]


def test_doc2vec_validation(grouped_corpus):
    from wikirec_ray.pipelines.doc2vec import train_doc2vec

    with pytest.raises(ValueError):
        train_doc2vec(grouped_corpus, dim=0)
    with pytest.raises(ValueError):
        train_doc2vec(grouped_corpus, epochs=0)
