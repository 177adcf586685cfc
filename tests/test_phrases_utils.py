"""Phrase detection (T2 semantics incl. insert-at-0), truncate+join (M13),
fuzzy suggestions (M16), language registry (§2.10)."""

import pyarrow as pa
import pytest


def _ds(ray_session, rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_train_phrases_scores(ray_session):
    from wikirec_ray.stages.phrases import train_phrases

    # "new york" appears 6x adjacent; "san francisco" 5x; fillers once each
    rows = [(i, f"new york trip f{i} san francisco") for i in range(5)]
    rows.append((5, "new york"))
    ds = _ds(ray_session, rows)
    table = train_phrases(ds, min_count=5, threshold=0.1)
    assert ("new", "york") in table
    # oracle score: (6-5)*|vocab| / (6*6); vocab = {new,york,trip,f0..f4,san,francisco}
    vocab_len = 10
    assert table[("new", "york")] == pytest.approx((6 - 5) * vocab_len / 36)
    assert ("san", "francisco") not in table  # count 5 -> score 0, below thr
    assert ("trip", "f0") not in table


def test_apply_phrases_insert_at_zero(ray_session):
    from wikirec_ray.stages.phrases import apply_phrases

    ds = _ds(ray_session, [(0, "go to new york now"), (1, "no phrases here")])
    table = {("new", "york"): 9.9}
    out = {r["doc_id"]: r["tokens"] for r in apply_phrases(ds, table).take_all()}
    # phrase token prepended at position 0 (data_utils.py:857,862), original
    # tokens preserved
    assert out[0] == ["new_york", "go", "to", "new", "york", "now"]
    assert out[1] == ["no", "phrases", "here"]


def test_truncate_and_join(ray_session):
    from wikirec_ray.stages.analyze import truncate_and_join

    b = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b c d e", "x-y", ""], pa.string()),
        }
    )
    out = truncate_and_join(b, 3)
    assert out["text_sub"].to_pylist() == ["a b c", "x y", ""]


def test_suggest_terms():
    from wikirec_ray.functions.utils import suggest_terms, validate_terms

    vocab = ["spark", "sharp", "spare", "join", "merge"]
    got = suggest_terms("spak", vocab, n=3)
    assert got[0][0] == "spark"  # closest by difflib ratio (utils.py:24-57)
    assert len(got) == 3
    assert got[0][1] > got[2][1] or got[0][1] == got[2][1]

    v = validate_terms(["spark", "mergee"], vocab)
    assert "spark" not in v and "mergee" in v
    assert v["mergee"][0][0] == "merge"


def test_language_registry():
    from wikirec_ray.functions.languages import register, spec_for, supported

    assert spec_for("en").capability == "lemmatize"
    assert spec_for("fi").capability == "stem"
    assert spec_for("zh").capability == "tokenize"
    # unknown codes degrade instead of raising (vs data_utils.py:750-754)
    assert spec_for("xx").capability == "tokenize"
    register("tlh", "klingon", "stopwords")
    assert supported()["tlh"].capability == "stopwords"
    with pytest.raises(ValueError):
        register("bad", "bad", "quantum")


def test_frequent_terms_and_sample(ray_session):
    from wikirec_ray.stages.stats import deterministic_sample, frequent_terms

    ds = _ds(ray_session, [(i, "alpha beta " + ("gamma " * (i % 2))) for i in range(10)])
    out = {r["term"]: r["total_tf"] for r in frequent_terms(ds, min_total=6).take_all()}
    assert out == {"alpha": 10, "beta": 10}  # gamma appears 5x -> cut

    sampled = deterministic_sample(ds, modulus=3, residue=1).take_all()
    assert sorted(r["doc_id"] for r in sampled) == [1, 4, 7]
