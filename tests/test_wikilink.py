"""WikilinkNN-style entity embeddings (SURVEY T7): planted bipartite
clusters must separate; training deterministic; loss decreases."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def bipartite_pairs(ray_session):
    """Articles 0-9 link into links 0-4; articles 10-19 into links 5-9."""
    import ray.data

    rows = []
    for a in range(10):
        for l in range(5):
            rows.append((a, l))
    for a in range(10, 20):
        for l in range(5, 10):
            rows.append((a, l))
    return ray.data.from_arrow(
        pa.table(
            {
                "article_id": pa.array([r[0] for r in rows], pa.int64()),
                "link_id": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )


def _vecs(model):
    out = {}
    for r in model["articles"].take_all():
        v = np.asarray(r["vec"], np.float64)
        out[r["article_id"]] = v / np.linalg.norm(v)
    return out


def test_wikilink_clusters(bipartite_pairs):
    from wikirec_ray.pipelines.wikilink import train_wikilink_nn

    m = train_wikilink_nn(
        bipartite_pairs, n_articles=20, n_links=10, dim=8, epochs=25, seed=31
    )
    assert m["losses"][-1] < m["losses"][0]
    vecs = _vecs(m)
    g1 = [vecs[a] for a in range(10)]
    g2 = [vecs[a] for a in range(10, 20)]
    within = np.mean([g1[0] @ v for v in g1[1:]] + [g2[0] @ v for v in g2[1:]])
    across = np.mean([g1[0] @ v for v in g2] + [g2[0] @ v for v in g1])
    assert within > across + 0.2, (within, across)


def test_wikilink_deterministic(bipartite_pairs):
    from wikirec_ray.pipelines.wikilink import train_wikilink_nn

    m1 = train_wikilink_nn(bipartite_pairs, 20, 10, dim=4, epochs=2, seed=3)
    m2 = train_wikilink_nn(bipartite_pairs, 20, 10, dim=4, epochs=2, seed=3)
    # reproducible up to float accumulation order (observed <= 1 ULP)
    assert np.allclose(m1["link_vectors"], m2["link_vectors"], rtol=0, atol=1e-12)
    assert np.allclose(m1["losses"], m2["losses"], rtol=1e-12)
    v1, v2 = _vecs(m1), _vecs(m2)
    assert all(np.allclose(v1[k], v2[k], rtol=0, atol=1e-12) for k in v1)


def test_wikilink_validation(bipartite_pairs):
    from wikirec_ray.pipelines.wikilink import train_wikilink_nn

    with pytest.raises(ValueError):
        train_wikilink_nn(bipartite_pairs, 20, 10, dim=0)
