"""Tokenizer/normalizer unit tests with exact golden outputs, modeled on the
reference's operator unit tests (/root/reference/tests/test_data_utils.py:16-63)."""

import pyarrow as pa

from wikirec_ray.stages.analyze import (
    WikirecCleaner,
    add_token_list,
    clean_text_single,
    doc_lengths,
    doc_term_freqs,
    wikirec_tokenize_single,
)


def _tbl(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})


def test_doc_term_freqs_basic():
    out = doc_term_freqs(_tbl(["a b a", "B c"]))
    rows = {(r["doc_id"], r["term"]): r["tf"] for r in out.to_pylist()}
    assert rows == {(0, "a"): 2, (0, "b"): 1, (1, "b"): 1, (1, "c"): 1}


def test_doc_term_freqs_punct_and_empty():
    out = doc_term_freqs(_tbl(["x-y:z/x", "", "  ", "42 ref"]))
    rows = {(r["doc_id"], r["term"]): r["tf"] for r in out.to_pylist()}
    assert rows == {
        (0, "x"): 2, (0, "y"): 1, (0, "z"): 1,
        (3, "42"): 1, (3, "ref"): 1,
    }


def test_doc_lengths():
    out = doc_lengths(_tbl(["a b a", "", "one"]))
    assert out["doc_len"].to_pylist() == [3, 0, 1]


def test_add_token_list():
    out = add_token_list(_tbl(["Big-Data rocks", ""]))
    assert out["tokens"].to_pylist() == [["big", "data", "rocks"], []]


# --- wikirec-faithful chain (clean(), data_utils.py:670-1008 semantics) ----


def test_clean_whitespace_collapse():
    assert clean_text_single("a" + " " * 25 + "b") == "a b"


def test_clean_url_strip():
    # words starting "http" are dropped (data_utils.py:771-778)
    assert clean_text_single("see http://x.com now") == "see now"
    assert clean_text_single("httpfoo bar") == "bar"


def test_clean_references_truncate():
    # without Category: text is truncated at ==References== (data_utils.py:788-790)
    assert clean_text_single("body text ==References== refs here") == "body text "


def test_clean_references_with_category():
    # with Category: the refs section up to " Category" is replaced (:783-787)
    s = clean_text_single("body ==References== junk Category:Books end")
    assert "junk" not in s and "body" in s and "Category" in s


def test_clean_punct_and_headers():
    assert clean_text_single("a/b-c:d") == "a b c d"
    assert clean_text_single("x ==Header== y") == "x  y"
    assert clean_text_single("don’t stop–now!") == "dont stopnow"


def test_wikirec_tokenize():
    toks = wikirec_tokenize_single(
        "The the Quick http://url 42 ref brown-fox ab jumped", min_token_len=3
    )
    # Reference semantics (data_utils.py:589-597): membership is tested on
    # the ORIGINAL-case token, lowering happens on output — so "The" survives
    # a lowercase stop list and is emitted as "the", while "the" is dropped.
    # url dropped, 42 numeric, ref dropped, ab too short.
    assert toks == ["the", "quick", "brown", "fox", "jumped"]


def test_wikirec_tokenize_case_sensitive_filters():
    # "Ref" survives the case-sensitive "ref" check and lowers to "ref";
    # "IgnoreMe" must be given in original case to words_to_ignore.
    toks = wikirec_tokenize_single(
        "Ref ref IgnoreMe ignoreme keep",
        words_to_ignore=frozenset({"IgnoreMe"}),
        min_token_len=3,
    )
    assert toks == ["ref", "ignoreme", "keep"]


def test_wikirec_tokenize_remove_names():
    # names removed case-sensitively BEFORE lowering (data_utils.py:577-587):
    # "John" is in the names set, "john" is not.
    toks = wikirec_tokenize_single(
        "John john Visited Paris", remove_names=True,
        names=frozenset({"John", "Paris"}), min_token_len=3,
    )
    assert toks == ["john", "visited"]
    # names path off: both survive
    toks2 = wikirec_tokenize_single(
        "John john", remove_names=False, names=frozenset({"John"}),
        min_token_len=3,
    )
    assert toks2 == ["john", "john"]


def test_wikirec_cleaner_batch_matches_single():
    texts = ["The Quick brown-fox", "see ==References== gone", "don’t 42 stop"]
    out = WikirecCleaner()(_tbl(texts))
    assert out["tokens"].to_pylist() == [wikirec_tokenize_single(t) for t in texts]


def test_wikirec_cleaner_cyrillic_stopwords():
    """Non-Latin-script analyzer path (was the driver's clean_ru slot,
    retired r5 for facet/filtered search): Cyrillic content words survive
    tokenize + min-len, embedded ru stopwords are removed, and the batch
    chain equals the per-row reference path."""
    from wikirec_ray.functions.languages import stopwords_for

    sw = stopwords_for("ru")
    assert {"и", "в", "на", "не", "как", "все"} <= set(sw)
    texts = [
        "Искра и поток — данные в таблице",
        "не так как все: агрегат дубликат",
        "Хеш соединение на колонка",
    ]
    out = WikirecCleaner(stopwords=sw)(_tbl(texts))
    got = out["tokens"].to_pylist()
    assert got == [
        wikirec_tokenize_single(t, stopwords=sw) for t in texts
    ]
    flat = [w for doc in got for w in doc]
    assert "искра" in flat and "данные" in flat and "колонка" in flat
    assert not set(flat) & set(sw)


def test_wikirec_cleaner_property_equivalence():
    """Hypothesis: the vectorized Arrow chain is token-for-token equal to
    the per-row reference-faithful path on adversarial inputs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frags = st.sampled_from(
        ["the", "The", "http://x", "httpx", "xhttp", "42", "ref", "Ref",
         "==References==", "Category:", "==H==", "< !--", "-- >", "a/b-c:d",
         "don’t", "–", "  ", " ", "\n", "\t", "word", "Wort", "4²", "John",
         "...", "a", "ab", "abc", "ABC", "Ähm"]
    )
    texts = st.lists(frags, min_size=0, max_size=25).map(" ".join)

    @settings(max_examples=150, deadline=None)
    @given(st.lists(texts, min_size=1, max_size=5))
    def check(docs):
        names = frozenset({"John"})
        batch = _tbl(docs)
        for rn in (False, True):
            out = WikirecCleaner(remove_names=rn, names=names)(batch)
            want = [
                wikirec_tokenize_single(
                    t or "", remove_names=rn, names=names
                )
                for t in docs
            ]
            assert out["tokens"].to_pylist() == want, (docs, rn)

    check()


def test_fold_accents_option():
    """fold_accents=True folds the token stream AND the word sets before
    matching (scalar == vectorized kernel pinned), so accented stopwords
    match accent-stripped corpora and vice versa; default off keeps the
    reference's exact-form matching."""
    import pyarrow as pa

    from wikirec_ray.stages.analyze import (
        WikirecCleaner,
        fold_accents_array,
        fold_accents_word,
    )

    words = ["für", "über", "Mädchen", "fur", "déjà", "straße", "plain"]
    assert [fold_accents_word(w) for w in words] == \
        fold_accents_array(pa.array(words)).to_pylist()

    sw = frozenset({"für", "über"})
    batch_stripped = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["fur uber haus"]),
    })
    batch_accented = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["für über Mädchen haus"]),
    })
    # folded: stripped corpus matches the accented list; output is folded
    folded = WikirecCleaner(stopwords=sw, fold_accents=True)
    assert folded(batch_stripped)["tokens"].to_pylist() == [["haus"]]
    assert folded(batch_accented)["tokens"].to_pylist() == [["madchen", "haus"]]
    # unfolded (default): stripped forms do NOT match the accented list,
    # native forms do, and output keeps its accents
    plain = WikirecCleaner(stopwords=sw)
    assert plain(batch_stripped)["tokens"].to_pylist() == [["fur", "uber", "haus"]]
    assert plain(batch_accented)["tokens"].to_pylist() == [["mädchen", "haus"]]
