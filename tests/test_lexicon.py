"""Vocabulary lexicon: prefix suggest (autocomplete) + fuzzy expansion.

Oracles: DuckDB ``levenshtein`` / ``LIKE`` over the same (term, df)
vocabulary — the exact predicates the module's docstring promises
(``pipelines/lexicon.py``); plus multiset-expansion parity against the
plain BM25 scorer (the engine-wide duplicate-occurrence contract).
"""

import json

import duckdb
import numpy as np
import pytest

from wikirec_ray.pipelines.lexicon import (
    FuzzyIndex,
    PrefixIndex,
    SuffixIndex,
    edit_distance_le1,
)
from wikirec_ray.pipelines.query import IndexReader, parse_query, search

VOCAB = {
    "spark": 10, "spars": 3, "sparse": 7, "stark": 5, "shark": 5,
    "join": 9, "joins": 2, "joint": 2, "coin": 4, "jon": 1,
    "a": 6, "ab": 6, "ba": 6, "b": 2, "table": 8, "tale": 3,
    "0x9": 1, "sp": 2, "spa": 2,
}


def _vocab_rel(con):
    con.execute("CREATE OR REPLACE TABLE vocab(term VARCHAR, df BIGINT)")
    con.executemany("INSERT INTO vocab VALUES (?, ?)", list(VOCAB.items()))


def test_edit_distance_le1_matches_duckdb():
    con = duckdb.connect()
    words = sorted(VOCAB) + ["", "x", "sparkly", "tabel", "jion", "abba"]
    for a in words:
        for b in words:
            sql = con.execute(
                "SELECT levenshtein(?, ?) <= 1", [a, b]
            ).fetchone()[0]
            assert edit_distance_le1(a, b) == bool(sql), (a, b)


@pytest.mark.parametrize("prefix", ["", "s", "sp", "spar", "spark", "j", "zz", "0", "ta"])
@pytest.mark.parametrize("k", [1, 3, 100])
def test_prefix_suggest_matches_sql(prefix, k):
    con = duckdb.connect()
    _vocab_rel(con)
    want = con.execute(
        "SELECT term, df FROM vocab WHERE starts_with(term, ?) "
        "ORDER BY df DESC, term LIMIT ?",
        [prefix, k],
    ).fetchall()
    assert PrefixIndex(VOCAB).suggest(prefix, k) == want


def test_prefix_suggest_k_nonpositive():
    assert PrefixIndex(VOCAB).suggest("s", 0) == []
    assert PrefixIndex(VOCAB).suggest("s", -1) == []


@pytest.mark.parametrize(
    "suffix", ["", "k", "rk", "ark", "spark", "s", "n", "e", "a", "zz", "9"]
)
@pytest.mark.parametrize("k", [1, 3, 100])
def test_suffix_suggest_matches_sql(suffix, k):
    con = duckdb.connect()
    _vocab_rel(con)
    want = con.execute(
        "SELECT term, df FROM vocab WHERE ends_with(term, ?) "
        "ORDER BY df DESC, term LIMIT ?",
        [suffix, k],
    ).fetchall()
    assert SuffixIndex(VOCAB).suggest(suffix, k) == want


def test_suffix_suggest_tie_cut_is_term_order():
    # the kth-df tie cut must follow TERM order, not reversed-term order:
    # suffix "x" matches ax..zx (flat df) — the top 3 are the term-asc
    # smallest, even though reversed-term order would agree here; pin a
    # case where the two orders DISAGREE: {"ba","ca","ab"} all end in
    # nothing-shared... use suffix "" (whole vocab): reversed order of
    # {"ab","ba"} is {"ba","ab"}, term order is {"ab","ba"}
    flat = {"ab": 1, "ba": 1, "ca": 1, "ac": 1}
    got = SuffixIndex(flat).suggest("", 2)
    assert got == [("ab", 1), ("ac", 1)]  # term-asc, NOT reversed-asc
    assert SuffixIndex(flat).suggest("a", 2) == [("ba", 1), ("ca", 1)]
    assert SuffixIndex(VOCAB).suggest("k", 0) == []
    assert SuffixIndex(VOCAB).suggest("zzz", 5) == []


@pytest.mark.parametrize("d", [1, 2])
@pytest.mark.parametrize(
    "q", sorted(VOCAB) + ["tabel", "jion", "sparkk", "park", "", "zz", "abba"]
)
def test_fuzzy_expand_equals_levenshtein(q, d):
    con = duckdb.connect()
    _vocab_rel(con)
    want = con.execute(
        f"SELECT term, df FROM vocab WHERE levenshtein(?, term) <= {d} "
        "ORDER BY df DESC, term",
        [q],
    ).fetchall()
    assert FuzzyIndex(VOCAB, max_d=d).expand(q) == want


def test_edit_distance_le_matches_duckdb():
    from wikirec_ray.pipelines.lexicon import edit_distance_le

    con = duckdb.connect()
    words = sorted(VOCAB) + ["", "x", "tabel", "abba", "sparkly", "prak"]
    for maxd in (0, 2, 3):
        for a in words:
            for b in words:
                sql = con.execute(
                    f"SELECT levenshtein(?, ?) <= {maxd}", [a, b]
                ).fetchone()[0]
                assert edit_distance_le(a, b, maxd) == bool(sql), (a, b, maxd)


def test_fuzzy_index_rejects_bad_distance():
    with pytest.raises(ValueError):
        FuzzyIndex(VOCAB, max_d=0)
    with pytest.raises(ValueError):
        FuzzyIndex(VOCAB, max_d=3)


def test_reader_suggest_and_fuzzy_against_df(built_index):
    index_dir, _ = built_index
    rd = IndexReader(index_dir)
    uni = {t: n for t, n in rd.df.items() if " " not in t}

    got = rd.suggest("s", 5)
    want = sorted(
        ((t, n) for t, n in uni.items() if t.startswith("s")),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    assert got == want
    # empty prefix = whole-vocabulary ranking, the degenerate case
    assert rd.suggest("", 3) == sorted(
        uni.items(), key=lambda kv: (-kv[1], kv[0])
    )[:3]

    q = next(iter(want))[0]
    exp = rd.fuzzy_expand(q)
    brute = sorted(
        ((t, n) for t, n in uni.items() if edit_distance_le1(q, t)),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert exp == brute and (q, uni[q]) in exp

    # leading-wildcard surface against the same df ground truth
    got_sfx = rd.suggest_suffix("e", 5)
    want_sfx = sorted(
        ((t, n) for t, n in uni.items() if t.endswith("e")),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    assert got_sfx == want_sfx and got_sfx
    assert rd.suggest_suffix("", 3) == rd.suggest("", 3)  # both = whole vocab


def test_reader_fuzzy_topk_is_expanded_multiset(built_index):
    index_dir, _ = built_index
    rd = IndexReader(index_dir)
    terms = ["spark", "jion"]  # one indexed, one typo
    expanded = [v for t in terms for v, _ in rd.fuzzy_expand(t)]
    assert rd.fuzzy_topk(terms, 10) == rd.topk(expanded, 10)
    # duplicate-occurrence contract: a repeated fuzzy term expands TWICE
    twice = rd.fuzzy_topk(["spark", "spark"], 10)
    assert twice == rd.topk(
        [v for _ in range(2) for v, _ in rd.fuzzy_expand("spark")], 10
    )
    assert rd.fuzzy_topk(["qqqqqqqq"], 10) == []


def test_lexicon_normalizes_case_and_builds_lazily():
    from wikirec_ray.pipelines.lexicon import Lexicon

    lex = Lexicon(VOCAB)
    assert lex.suggest("SP", 3) == lex.suggest("sp", 3) != []
    assert lex._fuzzy == {}  # suggest-only caller never builds SymSpell
    assert lex.expand("MERG") == lex.expand("merg")
    assert list(lex._fuzzy) == [1]  # only the probed distance is built
    assert lex.expand_many(["Tabl", ("jion", 2)]) == [
        lex.expand("tabl"), lex.expand("jion", 2)
    ]
    assert sorted(lex._fuzzy) == [1, 2]


def test_fuzzy_retrieval_caps_expansion():
    # Lucene maxExpansions: retrieval truncates each occurrence's
    # df-ordered neighborhood at FUZZY_EXPANSION_MAX; fuzzy_expand (the
    # introspection/oracle surface) stays uncapped.  A vocabulary of all
    # two-letter strings puts EVERY term within distance 2 of "aa".
    import itertools
    import string

    from wikirec_ray.pipelines.lexicon import Lexicon
    from wikirec_ray.pipelines.query import expand_query_terms
    from wikirec_ray.schema import FUZZY_EXPANSION_MAX

    vocab = {
        a + b: 1 + (ord(a) * 31 + ord(b)) % 97
        for a, b in itertools.product(string.ascii_lowercase, repeat=2)
    }
    lex = Lexicon(vocab)
    full = lex.expand("aa", 2)
    assert len(full) == len(vocab) > FUZZY_EXPANSION_MAX

    class FakeEngine:
        def fuzzy_expand_many(self, items, cap=None):
            return lex.expand_many(items, cap)

        def suggest(self, prefix, k):
            return []

    got = expand_query_terms(FakeEngine(), ["x"], [("aa", 2)], [])
    assert got == ["x"] + [t for t, _ in full[:FUZZY_EXPANSION_MAX]]


def test_lexicon_deep_index_answers_shallow_queries():
    # a d=2-first workload builds ONE deletion dict; later d=1 probes run
    # against it (shallower probe depth + verify) and must equal a pure
    # d=1 index exactly
    from wikirec_ray.pipelines.lexicon import Lexicon

    lex = Lexicon(VOCAB)
    lex.expand("merg", 2)
    assert list(lex._fuzzy) == [2]
    pure = Lexicon(VOCAB)
    for q in sorted(VOCAB) + ["tabel", "jion", "", "zz", "abba"]:
        assert lex.expand(q, 1) == pure.expand(q, 1), q
    assert list(lex._fuzzy) == [2]  # no second dict appeared


def test_prefix_suggest_flat_df_tie_cut():
    # a long flat-df tail: ties at the kth df must cut term-ascending
    # (the lexicographic array order), matching the SQL ORDER BY
    flat = {f"w{i:03d}": 1 for i in range(50)}
    flat["w025"] = 9
    got = PrefixIndex(flat).suggest("w", 5)
    assert got == [("w025", 9), ("w000", 1), ("w001", 1), ("w002", 1), ("w003", 1)]


def test_reader_fuzzy_expand_many(built_index):
    index_dir, _ = built_index
    rd = IndexReader(index_dir)
    terms = ["spark", "jion", "QQQQ"]
    assert rd.fuzzy_expand_many(terms) == [rd.fuzzy_expand(t) for t in terms]


def test_parse_query_expand_mode():
    assert parse_query("tabel~ join") == \
        ("expand", (["join"], [("tabel", 1)], [], [], []), None)
    assert parse_query("a~ b~") == \
        ("expand", ([], [("a", 1), ("b", 1)], [], [], []), None)
    # explicit Lucene distances: ~1 / ~2; unsupported ~3 stays literal
    assert parse_query("tabel~2 join") == \
        ("expand", (["join"], [("tabel", 2)], [], [], []), None)
    assert parse_query("a~1 b~2") == \
        ("expand", ([], [("a", 1), ("b", 2)], [], [], []), None)
    assert parse_query("x~3") == ("bm25", ["x", "3"], None)
    # wildcard: the chunk's LAST token is the prefix, earlier ones exact
    assert parse_query("spar* join") == \
        ("expand", (["join"], [], ["spar"], [], []), None)
    assert parse_query("new-york*") == \
        ("expand", (["new"], [], ["york"], [], []), None)
    # both operators in one query compose
    assert parse_query("tabl~ spar* the") == \
        ("expand", (["the"], [("tabl", 1)], ["spar"], [], []), None)
    # boolean / phrase / NEAR outrank expansion; inner ~/* fall to the
    # tokenizer
    assert parse_query("+must tabel~")[0] == "boolean"
    assert parse_query('"tabel~ x"')[0] == "phrase"
    assert parse_query("NEAR/3(tabel* x)")[0] == "near"
    # a bare or mid-chunk ~/* is not an operator
    assert parse_query("~") == ("bm25", [], None)
    assert parse_query("*") == ("bm25", [], None)
    assert parse_query("ta~bel") == ("bm25", ["ta", "bel"], None)
    assert parse_query("a*b") == ("bm25", ["a", "b"], None)
    # hyphenated chunk: the whole chunk's tokens go fuzzy
    assert parse_query("new-york~") == \
        ("expand", ([], [("new", 1), ("york", 1)], [], [], []), None)
    # leading wildcard: the chunk's FIRST token is the suffix to complete
    assert parse_query("*ion join") == \
        ("expand", (["join"], [], [], ["ion"], []), None)
    assert parse_query("*new-york") == \
        ("expand", (["york"], [], [], ["new"], []), None)
    # leading + trailing wildcards compose across chunks
    assert parse_query("spar* *ion") == \
        ("expand", ([], [], ["spar"], ["ion"], []), None)
    # a both-ended chunk is plain text (no contains-match)
    assert parse_query("*ab*") == ("bm25", ["ab"], None)
    assert parse_query("*") == ("bm25", [], None)
    assert parse_query("**") == ("bm25", [], None)


def test_search_expand_routes_and_guards(built_index):
    from wikirec_ray.schema import PREFIX_EXPANSION_MAX

    index_dir, _ = built_index
    rd = IndexReader(index_dir)
    expanded = [v for v, _ in rd.fuzzy_expand("spark")]
    assert search(rd, "spark~ join", k=5) == rd.topk(expanded + ["join"], 5)
    # wildcard: prefix rewrites to its df-capped completions
    comp = [v for v, _ in rd.suggest("s", PREFIX_EXPANSION_MAX)]
    assert comp and search(rd, "s* join", k=5) == rd.topk(["join"] + comp, 5)
    # fuzzy + wildcard compose in one query
    both = [v for v, _ in rd.fuzzy_expand("merg")] + comp
    assert search(rd, "merg~ s*", k=5) == rd.topk(both, 5)
    # leading wildcard: suffix rewrites to its df-capped completions
    sfx = [v for v, _ in rd.suggest_suffix("e", PREFIX_EXPANSION_MAX)]
    assert sfx and search(rd, "*e join", k=5) == rd.topk(["join"] + sfx, 5)

    class NoLex:
        def topk(self, terms, k, attrs=None):  # pragma: no cover
            return []

    with pytest.raises(ValueError, match="fuzzy"):
        search(NoLex(), "spark~")
    with pytest.raises(ValueError, match="wildcard"):
        search(NoLex(), "spark*")
    # all-absent expansion -> empty, not an error
    assert search(rd, "qqqqqqqq~") == []
    assert search(rd, "qqqqqqqq*") == []


def test_lexicon_excludes_precomputed_bigrams(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from wikirec_ray.stages.index_build import build_index

    rows = [
        {"doc_id": i, "text": "alpha beta gamma alpha beta"} for i in range(8)
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = str(tmp_path / "bg")
    build_index(ds, out, resume=False, precompute_bigrams=4)
    rd = IndexReader(out)
    assert rd.bigrams  # composite "w1 w2" terms exist in df...
    sugg = rd.suggest("", 100)
    assert sugg and all(" " not in t for t, _ in sugg)  # ...but never surface
    assert all(" " not in t for t, _ in rd.fuzzy_expand("alpha"))


def test_cli_suggest(built_index, capsys):
    from wikirec_ray.__main__ import main

    index_dir, _ = built_index
    rc = main(["suggest", "--index", index_dir, "sp", "-k", "3"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rd = IndexReader(index_dir)
    assert out == {
        "prefix": "sp",
        "suggestions": [
            {"term": t, "df": n} for t, n in rd.suggest("sp", 3)
        ],
    }
    # leading * flips to suffix completion
    rc = main(["suggest", "--index", index_dir, "*e", "-k", "3"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {
        "prefix": "*e",
        "suggestions": [
            {"term": t, "df": n} for t, n in rd.suggest_suffix("e", 3)
        ],
    }
    # a trailing * is the explicit prefix form (same result as bare)
    rc = main(["suggest", "--index", index_dir, "sp*", "-k", "3"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["suggestions"] == [
        {"term": t, "df": n} for t, n in rd.suggest("sp", 3)
    ]
    # patterns the query language doesn't offer are rejected loudly
    for bad in ("*", "*e*"):
        rc = main(["suggest", "--index", index_dir, bad])
        assert rc == 2
        err = capsys.readouterr().err
        assert "unsupported pattern" in err
    # slash-delimited whole-term regex mirrors the /re/ query operator
    rc = main(["suggest", "--index", index_dir, "/s.*/", "-k", "3"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["suggestions"] == [
        {"term": t, "df": n} for t, n in rd.regex_terms("s.*", 3)
    ]
    # invalid regex exits loudly, not with a traceback
    rc = main(["suggest", "--index", index_dir, "/(unclosed/"])
    assert rc == 2
    assert "invalid regex" in capsys.readouterr().err


@pytest.mark.parametrize(
    "pat",
    ["sp.*", "s...k", "(jo|co)in", "a|ba", ".*n", "zz+", "spark",
     "0x[0-9]", "[st].rk", ""],
)
@pytest.mark.parametrize("k", [2, 100])
def test_regex_terms_matches_sql(pat, k):
    # oracle: DuckDB regexp_full_match — both sides are RE2, so whole-term
    # anchoring and pattern semantics agree exactly
    from wikirec_ray.pipelines.lexicon import Lexicon

    con = duckdb.connect()
    _vocab_rel(con)
    want = con.execute(
        "SELECT term, df FROM vocab WHERE regexp_full_match(term, ?) "
        "ORDER BY df DESC, term LIMIT ?",
        [pat, k],
    ).fetchall()
    assert Lexicon(VOCAB).regex_terms(pat, k) == want


def test_regex_terms_guards():
    from wikirec_ray.pipelines.lexicon import Lexicon

    lex = Lexicon(VOCAB)
    with pytest.raises(ValueError, match="invalid regex"):
        lex.regex_terms("(unclosed")
    assert lex.regex_terms("sp.*", 0) == []
    assert lex.regex_terms("zzz+", 10) == []
    # pattern is verbatim: vocabulary is lowercase, uppercase literal
    # matches nothing (no case folding that would mangle escapes)
    assert lex.regex_terms("SPARK", 5) == []
    # composite precomputed-bigram terms never surface
    assert Lexicon({"a b": 9, "ab": 1}).regex_terms(".*", 5) == [("ab", 1)]


def test_parse_query_regex_chunks():
    assert parse_query("/sp.rk/ join") == \
        ("expand", (["join"], [], [], [], ["sp.rk"]), None)
    # composes with the other expansion operators
    assert parse_query("/a|b/ tabl~ spar*") == \
        ("expand", ([], [("tabl", 1)], ["spar"], [], ["a|b"]), None)
    # boolean / phrase / NEAR outrank it; inner slashes fall to the
    # tokenizer like ~ and *
    assert parse_query("+x /ab/")[0] == "boolean"
    assert parse_query('"/ab/ x"')[0] == "phrase"
    # bare or too-short slashes are plain text
    assert parse_query("/") == ("bm25", [], None)
    assert parse_query("//") == ("bm25", [], None)
    assert parse_query("a/b") == ("bm25", ["a", "b"], None)


def test_search_regex_routes_and_guards(built_index):
    from wikirec_ray.schema import PREFIX_EXPANSION_MAX

    index_dir, _ = built_index
    rd = IndexReader(index_dir)
    comp = [v for v, _ in rd.regex_terms("s.*", PREFIX_EXPANSION_MAX)]
    assert comp == [v for v, _ in rd.suggest("s", PREFIX_EXPANSION_MAX)]
    assert search(rd, "/s.*/ join", k=5) == rd.topk(["join"] + comp, 5)
    # absent-match regex -> empty, not an error
    assert search(rd, "/zzz+/") == []

    class NoLex:
        def topk(self, terms, k, attrs=None):  # pragma: no cover
            return []

    with pytest.raises(ValueError, match="regex"):
        search(NoLex(), "/ab/")
