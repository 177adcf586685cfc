"""Training-data prep operators (SURVEY K5 / A7): negative sampling and
topic coherence, each checked against an independent reimplementation."""

import numpy as np
import pyarrow as pa
import pytest


def _pairs_ds(ray_session, pairs):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "article_id": pa.array([a for a, _ in pairs], pa.int64()),
                "link_id": pa.array([l for _, l in pairs], pa.int64()),
            }
        )
    )


def _oracle_negatives(pairs, n_articles, n_links, ratio, seed, max_attempts):
    """Independent per-row reimplementation of the documented spec."""
    from wikirec_ray.functions.hashing import fmix64

    GOLD = np.uint64(0x9E3779B97F4A7C15)
    SALT = np.uint64(0xA0761D6478BD642F)
    pos = set(pairs)
    out = set()
    with np.errstate(over="ignore"):
        for a, l in pairs:
            for j in range(ratio):
                for att in range(max_attempts):
                    k = np.uint64(a) * GOLD
                    k = (k ^ np.uint64(l)) * GOLD
                    k = (k ^ np.uint64(j)) * GOLD
                    k = (k ^ np.uint64(att)) + np.uint64(seed)
                    k = fmix64(k)
                    na = int(k % np.uint64(n_articles))
                    nl = int(fmix64(k ^ SALT) % np.uint64(n_links))
                    if (na, nl) not in pos:
                        out.add((a, l, j, na, nl))
                        break
    return out


def test_negative_samples_match_oracle(ray_session):
    from wikirec_ray.pipelines.training import negative_samples

    rng = np.random.default_rng(5)
    pairs = sorted({(int(a), int(l)) for a, l in
                    zip(rng.integers(0, 50, 120), rng.integers(0, 80, 120))})
    ds = _pairs_ds(ray_session, pairs)
    got_rows = negative_samples(ds, n_articles=50, n_links=80, ratio=2, seed=13).take_all()
    got = {
        (r["article_id"], r["link_id"], r["neg_idx"], r["neg_article"], r["neg_link"])
        for r in got_rows
    }
    want = _oracle_negatives(pairs, 50, 80, 2, 13, 8)
    assert got == want
    assert len(got_rows) == len(got)  # no duplicate slot rows
    # every slot produced a negative (collision probability tiny here)
    assert len(got) == len(pairs) * 2
    pos = set(pairs)
    assert all((na, nl) not in pos for _, _, _, na, nl in got)


def test_negative_samples_dense_positive_space(ray_session):
    """Stress the rejection path: most of the (article, link) space is
    positive, so early attempts collide and some slots exhaust — the
    pipeline must still equal the independent oracle exactly."""
    from wikirec_ray.pipelines.training import negative_samples

    pairs = [(a, l) for a in range(3) for l in range(3)][:7]  # 7 of 9 positive
    ds = _pairs_ds(ray_session, pairs)
    got = {
        (r["article_id"], r["link_id"], r["neg_idx"], r["neg_article"], r["neg_link"])
        for r in negative_samples(
            ds, n_articles=3, n_links=3, ratio=3, seed=2, max_attempts=4
        ).take_all()
    }
    want = _oracle_negatives(pairs, 3, 3, 3, 2, 4)
    assert got == want
    pos = set(pairs)
    assert all((na, nl) not in pos for _, _, _, na, nl in got)


def test_topic_coherence_umass(ray_session):
    import math

    import ray.data

    from wikirec_ray.pipelines.training import topic_coherence

    docs = [
        "spark join window",
        "spark join merge",
        "spark sort",
        "window merge sort",
        "join window spark",
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(docs))),
                  "text": pa.array(docs, pa.string())})
    )
    topics = [["spark", "join", "window"], ["sort", "merge"]]
    out = topic_coherence(ds, topics).set_index("topic_id")["coherence"].to_dict()

    # brute-force oracle
    toksets = [set(d.split()) for d in docs]

    def D(*ws):
        return sum(1 for t in toksets if all(w in t for w in ws))

    for ti, topic in enumerate(topics):
        terms = []
        for i in range(1, len(topic)):
            for j in range(i):
                terms.append(
                    math.log((D(topic[i], topic[j]) + 1.0) / max(D(topic[j]), 1.0))
                )
        assert abs(out[ti] - round(sum(terms) / len(terms), 6)) < 1e-6

    with pytest.raises(ValueError):
        topic_coherence(ds, [[]])

    # out-of-corpus words must not score as neutral: D(wj)=0 pairs are
    # skipped and surfaced in n_oov; an all-OOV topic is NaN (ADVICE r03)
    oov = topic_coherence(
        ds, [["spark", "join", "zzzmissing"], ["qqq", "rrr"]]
    ).set_index("topic_id")
    # topic 0: pairs (join|spark) kept; (zzz|spark), (zzz|join) kept (their
    # D(wj)>0, numerator 0+eps); no pair conditions on the OOV word since it
    # is LAST in the sequence — coherence equals the same mean as the oracle
    assert oov.loc[0, "n_oov"] == 1
    t0 = [
        math.log((D("join", "spark") + 1.0) / D("spark")),
        math.log((0 + 1.0) / D("spark")),
        math.log((0 + 1.0) / D("join")),
    ]
    assert abs(oov.loc[0, "coherence"] - round(sum(t0) / len(t0), 6)) < 1e-6
    assert oov.loc[1, "n_oov"] == 2
    assert math.isnan(oov.loc[1, "coherence"])


def test_training_validation_and_case(ray_session):
    from wikirec_ray.pipelines.training import negative_samples, topic_coherence
    import ray.data

    ds = _pairs_ds(ray_session, [(0, 1)])
    with pytest.raises(ValueError):
        negative_samples(ds, n_articles=0, n_links=5)
    with pytest.raises(ValueError):
        negative_samples(ds, n_articles=5, n_links=5, ratio=0)

    docs = ray.data.from_arrow(
        pa.table({"doc_id": [0, 1], "text": ["spark join", "spark sort"]})
    )
    lo = topic_coherence(docs, [["spark", "join"]])
    hi = topic_coherence(docs, [["Spark", "JOIN"]])  # normalized identically
    assert lo.equals(hi)
