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


def test_apply_stream_greedy_consumption():
    from wikirec_ray.stages.phrases import apply_stream

    table = {("a", "b"): 1.0, ("b", "c"): 1.0}
    # greedy: (a b) joins and consumes b, so (b c) cannot fire
    assert apply_stream(["a", "b", "c"], table) == ["a_b", "c"]
    assert apply_stream(["x", "b", "c"], table) == ["x", "b_c"]
    # runs of hits join at even offsets only
    assert apply_stream(["a", "b", "a", "b"], {("a", "b"): 1.0, ("b", "a"): 1.0}) == [
        "a_b", "a_b"
    ]


def test_apply_stream_connector_words():
    from wikirec_ray.stages.phrases import apply_stream

    conn = frozenset({"of"})
    table = {("bank", "of", "america"): 1.0}
    assert apply_stream(["bank", "of", "america"], table, conn) == ["bank_of_america"]
    # connector with no start, and trailing connectors, pass through
    assert apply_stream(["of", "bank", "of"], table, conn) == ["of", "bank", "of"]
    # unmatched connector gap flushes start + connectors in order
    assert apply_stream(["bank", "of", "england"], table, conn) == [
        "bank", "of", "england"
    ]


def test_apply_phrases_trigram_insert_order(ray_session):
    """Reference insertion loop (data_utils.py:855-862): bigrams inserted at
    position 0 first (reversing found order), then trigrams on top."""
    from wikirec_ray.stages.phrases import apply_phrases

    ds = _ds(ray_session, [(0, "aa bb cc dd ee")])
    bi = {("aa", "bb"): 9.0, ("dd", "ee"): 9.0}
    tri = {("aa_bb", "cc"): 9.0}
    out = {r["doc_id"]: r["tokens"] for r in apply_phrases(ds, bi, tri).take_all()}
    # bi_stream = [aa_bb, cc, dd_ee]; tri_stream = [aa_bb_cc, dd_ee]
    # found_bi = [aa_bb, dd_ee] -> inserted -> [dd_ee, aa_bb, ...]
    # found_tri = [aa_bb_cc]    -> inserted on top
    assert out[0] == ["aa_bb_cc", "dd_ee", "aa_bb", "aa", "bb", "cc", "dd", "ee"]


def test_connector_bigram_inserted_by_trigram_loop(ray_session):
    """A connector bigram ('bank_of_america') has two underscores, so the
    reference's trigram loop inserts it, not the bigram loop."""
    from wikirec_ray.stages.phrases import apply_phrases

    ds = _ds(ray_session, [(0, "the bank of america branch")])
    bi = {("bank", "of", "america"): 9.0}
    out = {
        r["doc_id"]: r["tokens"]
        for r in apply_phrases(
            ds, bi, {}, connector_words=frozenset({"of", "the"})
        ).take_all()
    }
    assert out[0] == [
        "bank_of_america", "the", "bank", "of", "america", "branch"
    ]


def test_train_trigram_phrases(ray_session):
    from wikirec_ray.stages.phrases import train_phrase_models

    # "new york city" 6x: bigram (new, york) forms; over the bigrammed
    # stream, ("new_york", "city") forms as a trigram.
    rows = [(i, f"new york city f{i} g{i}") for i in range(6)]
    ds = _ds(ray_session, rows)
    bi, tri = train_phrase_models(ds, min_count=5, threshold=0.01)
    assert ("new", "york") in bi
    assert ("new_york", "city") in tri
    # bigram-consumed pair (york, city) must NOT be a trigram candidate
    assert all(k[0] != "york" for k in tri)


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
    # full reference tiers (languages.py:31-47,63-68,84-126): zh is in the
    # spaCy-lemmatizable table; ru is stopword-only; full names resolve too
    assert spec_for("zh").capability == "lemmatize"
    assert spec_for("ru").capability == "stopwords"
    assert spec_for("swedish").capability == "stem"
    assert spec_for("persian").code == "fa"
    assert len(supported()) >= 59
    # unknown codes degrade instead of raising (vs data_utils.py:750-754)
    assert spec_for("xx").capability == "tokenize"
    register("tlh", "klingon", "stopwords")
    assert supported()["tlh"].capability == "stopwords"
    with pytest.raises(ValueError):
        register("bad", "bad", "quantum")

    from wikirec_ray.functions.languages import stopwords_for

    assert "der" in stopwords_for("de") and "der" in stopwords_for("german")
    assert "the" in stopwords_for("en")
    assert stopwords_for("xx") == frozenset()


def test_frequent_terms_and_sample(ray_session):
    from wikirec_ray.stages.stats import deterministic_sample, frequent_terms

    ds = _ds(ray_session, [(i, "alpha beta " + ("gamma " * (i % 2))) for i in range(10)])
    out = {r["term"]: r["total_tf"] for r in frequent_terms(ds, min_total=6).take_all()}
    assert out == {"alpha": 10, "beta": 10}  # gamma appears 5x -> cut

    sampled = deterministic_sample(ds, modulus=3, residue=1).take_all()
    assert sorted(r["doc_id"] for r in sampled) == [1, 4, 7]


def test_hash_sample_fmix64_exact(ray_session):
    """hash_sample keeps a row iff fmix64(id*GOLD + seed) % 10000 <
    rate_bp — pinned against an INDEPENDENT pure-int fmix64 (the public
    MurmurHash3 finalizer), so the vectorized uint64 pipeline stays
    SQL-replayable bit for bit (this was the retired `random_sample`
    driver slot's oracle, kept here as a pytest)."""
    from wikirec_ray.stages.stats import hash_sample

    M = 1 << 64

    def fmix64_int(h: int) -> int:  # scalar reference, no numpy
        h ^= h >> 33
        h = (h * 0xFF51AFD7ED558CCD) % M
        h ^= h >> 33
        h = (h * 0xC4CEB9FE1A85EC53) % M
        h ^= h >> 33
        return h

    ids = list(range(0, 4000, 7))
    ds = _ds(ray_session, [(i, "x") for i in ids])
    for rate_bp, seed in ((2000, 42), (500, 7), (0, 1), (10000, 3)):
        got = sorted(
            r["doc_id"]
            for r in hash_sample(ds, rate_bp=rate_bp, seed=seed).take_all()
        )
        want = [
            i for i in ids
            if fmix64_int((i * 0x9E3779B97F4A7C15 + seed) % M) % 10000
            < rate_bp
        ]
        assert got == want, (rate_bp, seed)
    assert got == ids  # rate 10000 keeps everything
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hash_sample(ds, rate_bp=10001)


def test_topic_aliases():
    from wikirec_ray.functions.utils import convert_topic, topic_alias_dict

    assert convert_topic("books") == "Infobox book"
    assert convert_topic("films") == convert_topic("movies") == "Infobox film"
    assert convert_topic("unknown_topic") == "unknown_topic"
    assert convert_topic("books", language="xx") == "books"
    assert set(topic_alias_dict()) == {"en"}
