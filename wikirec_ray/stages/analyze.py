"""Normalization + tokenization stages (zero-copy Arrow ``map_batches`` kernels).

Two analyzers:

1. ``default`` — lowercase + split on non-alphanumeric runs.  Exactly
   SQL-expressible (see ``schema.TOKEN_SPLIT_REGEX``); this is the analyzer
   the index/BM25 engine and the DuckDB oracle both use.

2. ``wikirec_clean`` — a faithful re-implementation of the reference's
   normalization chain semantics (steps M4-M9 of SURVEY.md §2.2), i.e.
   ``clean()`` at ``/root/reference/src/wikirec/data_utils.py:670-1008``:
   whitespace collapse (:760-769), URL strip (:771-778), references-section
   strip (:783-790), punctuation/header strip (:795-809), whitespace
   tokenize (:812), lowercase + numeric/"ref"/stopword removal (:549-597).
   Implemented vectorized (compiled regex over pandas string arrays) rather
   than the reference's per-string Python loops; step ORDER is preserved
   because byte-identity of the intermediate text depends on it.

All per-batch functions are pure and stateless; corpus-global steps
(document frequency, min-DF vocabulary pruning — data_utils.py:945-969) live
in ``stages/stats.py`` as aggregation + broadcast.
"""

from __future__ import annotations

import re
import string

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from wikirec_ray.schema import TOKEN_SPLIT_REGEX

# ---------------------------------------------------------------------------
# default analyzer (engine + SQL-oracle tokenizer)
# ---------------------------------------------------------------------------


def tokenize_column(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """string column -> large_list<string> of lowercase tokens (may contain
    empty strings at text boundaries; callers filter them)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return pc.split_pattern_regex(pc.utf8_lower(texts), pattern=TOKEN_SPLIT_REGEX)


def _flat_tokens(texts: pa.Array) -> tuple[pa.Array, pa.Array]:
    """Return (parent_row_index, token) with empty tokens removed."""
    toks = tokenize_column(texts)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    return parents.filter(mask), flat.filter(mask)


def doc_term_freqs(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """(id, text) batch -> (id, term, tf) rows, pre-aggregated within the
    batch (one row per document covers its full text, so per-batch tf is the
    final tf — no cross-batch combine needed).

    This is the engine's posting-entry generator; its TF (term count per doc)
    deliberately differs from the reference's DF-style counting at
    data_utils.py:945-948, which counts *documents* per term — that lives in
    stats.document_frequencies.
    """
    parents, flat = _flat_tokens(batch[text_col].combine_chunks())
    pairs = pa.table({"_row": parents, "term": flat})
    grouped = pairs.group_by(["_row", "term"]).aggregate([("term", "count")])
    ids = batch[id_col].take(grouped["_row"])
    return pa.table(
        {
            id_col: ids,
            "term": grouped["term"],
            "tf": pc.cast(grouped["term_count"], pa.int64()),
        }
    )


def doc_lengths(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """(id, text) -> (id, doc_len) where doc_len = number of tokens."""
    parents, _ = _flat_tokens(batch[text_col].combine_chunks())
    counts = np.zeros(batch.num_rows, dtype=np.int64)
    np.add.at(counts, parents.to_numpy(zero_copy_only=False), 1)
    return pa.table({id_col: batch[id_col], "doc_len": pa.array(counts)})


def add_token_list(batch: pa.Table, text_col: str = "text", out_col: str = "tokens") -> pa.Table:
    """Append a large_list<string> tokens column (empty tokens removed)."""
    toks = tokenize_column(batch[text_col])
    # Rebuild the list array without empty strings, preserving row boundaries.
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    kept_parents = parents[mask]
    counts = np.zeros(batch.num_rows, dtype=np.int64)
    np.add.at(counts, kept_parents, 1)
    offsets = np.zeros(batch.num_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    clean = pa.LargeListArray.from_arrays(
        pa.array(offsets, type=pa.int64()), flat.filter(pc.not_equal(flat, ""))
    )
    return batch.append_column(out_col, clean)


def truncate_and_join(
    batch: pa.Table, max_token_index: int, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Per-doc token-list head + join back to a string — the reference's
    ``_subset_and_combine_tokens`` (data_utils.py:642-667, slice at :666) and
    ``_combine_tokens_to_str`` (:527-546) in one vectorized kernel
    (pc.list_slice + pc.binary_join; no Python token loop)."""
    toks = add_token_list(batch, text_col=text_col)["tokens"]
    sub = pc.list_slice(toks, 0, max_token_index)
    return pa.table({id_col: batch[id_col], "text_sub": pc.binary_join(sub, " ")})


# ---------------------------------------------------------------------------
# wikirec_clean analyzer (reference-faithful chain, M4-M9)
# ---------------------------------------------------------------------------

# Minimal English stopword set for the stopword-removal step when NLTK is
# unavailable (the reference pulls stopwords.words(language) at
# data_utils.py:715-728; this container has no NLTK corpora, so the set is a
# config parameter with this default).
DEFAULT_STOPWORDS = frozenset(
    """a an and are as at be by for from has he in is it its of on that the to
    was were will with this but they have had what when where who which why how
    all each she her his him or not no so if then than too very can could would
    should do does did been being we you your i me my our us their them""".split()
)

_PUNCT_TABLE = str.maketrans("", "", string.punctuation + "–" + "’")
_HEADER_RE = re.compile(r"==[^=]+==")
_COMMENT_RE = re.compile(r"< !--.*?-- >", re.DOTALL)
_REFS_WITH_CAT_RE = re.compile(r"==References==.*? Category", re.DOTALL)


def clean_text_single(text: str) -> str:
    """Reference normalization chain on ONE string; the per-row oracle.

    Step order matches data_utils.py:760-809 exactly (M4 -> M5 -> M6 -> M7):
    1. collapse runs of 2..25 spaces to one (the reference loops the
       replacement from 25 down to 2, data_utils.py:760-769 — equivalent to
       one regex pass for runs <= 25, which we apply for any run length);
    2. remove whitespace-delimited words starting with "http" (:771-778);
    3. strip the ==References== section — up to " Category" when a Category
       marker exists, else truncate at ==References== (:783-790);
    4. replace / - : with space, drop ==headers== and < !--..-- > comments,
       strip punctuation incl. – and ’ (:795-809).
    """
    t = re.sub(r" {2,}", " ", text)
    t = " ".join(w for w in t.split(" ") if w[:4] != "http")
    if "Category:" in t:
        t = _REFS_WITH_CAT_RE.sub(" Category", t)
    elif "==References==" in t:
        t = t.split("==References==")[0]
    t = t.replace("/", " ").replace("-", " ").replace(":", " ")
    t = _HEADER_RE.sub("", t)
    t = _COMMENT_RE.sub("", t)
    t = t.translate(_PUNCT_TABLE)
    return t


# Default capitalized-given-names set for the ``remove_names`` path.  The
# reference loads the NLTK ``names`` corpus (data_utils.py:30-36 ``all_names``
# = names.words()); this container has no NLTK corpora, so the set is a config
# parameter with a small common-names default.  Entries are CAPITALIZED —
# the reference's membership test is case-sensitive and runs before lowering.
DEFAULT_NAMES = frozenset(
    """Aaron Adam Alice Amy Andrew Anna Arthur Barbara Benjamin Betty Brian
    Carol Charles Chris Christopher Daniel David Deborah Donald Donna Dorothy
    Edward Elizabeth Emily Emma Eric Frank George Hannah Harry Helen Henry
    Jack James Jason Jennifer Jessica John Joseph Joshua Karen Katherine
    Kevin Laura Linda Lisa Margaret Maria Mark Mary Matthew Michael Michelle
    Nancy Oliver Patricia Paul Peter Richard Robert Ronald Ruth Samuel Sandra
    Sarah Scott Sophia Stephen Steven Susan Thomas Timothy William""".split()
)


def wikirec_tokenize_single(
    text: str,
    stopwords: frozenset[str] = DEFAULT_STOPWORDS,
    words_to_ignore: frozenset[str] = frozenset(),
    min_token_len: int = 3,
    remove_names: bool = False,
    names: frozenset[str] = DEFAULT_NAMES,
) -> list[str]:
    """clean -> whitespace tokenize (:812) -> drop names (optional), numerics,
    "ref", ignored words, stopwords, then lowercase (:549-597) -> min length
    filter (:962-966, DF part applied corpus-globally in stats).

    Fidelity: every membership/isnumeric test runs against the
    ORIGINAL-CASE token and lowering happens only on output, exactly as
    ``_lower_remove_unwanted`` (data_utils.py:575-597) — so "The" survives a
    lowercase stop list (and is emitted as "the"), "John" is removed by the
    names path while "john" is kept, and "Ref" survives the "ref" check.
    """
    out = []
    for tok in clean_text_single(text).split():
        if remove_names and tok in names:
            continue
        if tok.isnumeric():
            continue
        if tok in words_to_ignore or tok == "ref" or tok in stopwords:
            continue
        low = tok.lower()
        if len(low) < min_token_len:
            continue
        out.append(low)
    return out


_PUNCT_CLASS = "[" + re.escape(string.punctuation) + "–’]"


def clean_text_column(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized ``clean_text_single`` over a string column (Arrow RE2
    kernels).  Token-equivalent, not byte-identical: removing an "http…"
    word or branching the References strip can leave an extra space that
    ``" ".join`` would collapse — the whitespace tokenizer that always
    follows erases the difference (asserted against the per-row oracle in
    tests).  ``clean_text_single`` stays the byte-exact per-string API."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    s = texts.fill_null("")
    s = pc.replace_substring_regex(s, pattern=" {2,}", replacement=" ")
    s = pc.replace_substring_regex(s, pattern="(?:^| )http[^ ]*", replacement="")
    has_cat = pc.match_substring(s, "Category:")
    with_cat = pc.replace_substring_regex(
        s, pattern="(?s)==References==.*? Category", replacement=" Category"
    )
    without = pc.replace_substring_regex(
        s, pattern="(?s)==References==.*$", replacement=""
    )
    s = pc.if_else(has_cat, with_cat, without)
    s = pc.replace_substring(s, "/", " ")
    s = pc.replace_substring(s, "-", " ")
    s = pc.replace_substring(s, ":", " ")
    s = pc.replace_substring_regex(s, pattern="==[^=]+==", replacement="")
    s = pc.replace_substring_regex(s, pattern="(?s)< !--.*?-- >", replacement="")
    return pc.replace_substring_regex(s, pattern=_PUNCT_CLASS, replacement="")


def fold_accents_word(w: str) -> str:
    """NFKD-decompose and drop combining marks: 'für' -> 'fur'.  The scalar
    twin of ``fold_accents_array`` (pytest pins them equal)."""
    import unicodedata

    return "".join(
        c for c in unicodedata.normalize("NFKD", w) if not unicodedata.combining(c)
    )


def fold_accents_array(arr: pa.Array) -> pa.Array:
    """Vectorized accent folding (Arrow utf8_normalize NFKD + an RE2
    combining-mark strip) — the optional ``fold_accents`` step of the
    cleaning chain, so the natively-accented stopword lists
    (``functions/languages.py``) also match corpora that were
    accent-stripped upstream (ADVICE r03: never store stripped forms in the
    lists themselves; fold at match time instead)."""
    n = pc.utf8_normalize(arr, form="NFKD")
    return pc.replace_substring_regex(n, pattern=r"\p{Mn}", replacement="")


class WikirecCleaner:
    """Actor-pool stage: the reference cleaning chain, fully vectorized —
    Arrow RE2 kernels for the text chain, ``is_in``/``utf8_is_numeric``
    masks over the flat token stream for the filter step (original-case
    membership, lower on output, reference order).  Token-for-token equal
    to the per-row ``wikirec_tokenize_single`` (pytest-asserted, incl. a
    hypothesis property test).

    Stateful only in that the value-set arrays are built once per actor
    (__init__), mirroring how the reference builds its stopword set once and
    shares it via fork (data_utils.py:715-728).

    ``fold_accents=True`` NFKD-folds BOTH the token stream and the
    configured word sets before any matching (and in the output tokens), so
    the natively-accented stopword lists match accent-stripped corpora and
    vice versa; default off preserves the reference's exact-form matching.
    """

    def __init__(
        self,
        stopwords: frozenset[str] = DEFAULT_STOPWORDS,
        words_to_ignore: frozenset[str] = frozenset(),
        min_token_len: int = 3,
        remove_names: bool = False,
        names: frozenset[str] = DEFAULT_NAMES,
        text_col: str = "text",
        id_col: str = "doc_id",
        fold_accents: bool = False,
    ):
        self.stopwords = stopwords
        self.words_to_ignore = words_to_ignore
        self.min_token_len = min_token_len
        self.remove_names = remove_names
        self.names = names
        self.text_col = text_col
        self.id_col = id_col
        self.fold_accents = fold_accents
        fold = fold_accents_word if fold_accents else (lambda w: w)
        # drop set: words_to_ignore ∪ {"ref"} ∪ stopwords — all tested
        # against the ORIGINAL-case token (data_utils.py:589-597)
        self._drop = pa.array(
            sorted({fold(w) for w in set(words_to_ignore) | {"ref"} | set(stopwords)}),
            pa.string(),
        )
        self._names = pa.array(sorted({fold(w) for w in names}), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        cleaned = clean_text_column(batch[self.text_col])
        toks = pc.split_pattern_regex(cleaned, pattern=r"\s+")
        flat = pc.list_flatten(toks)
        if self.fold_accents:
            flat = fold_accents_array(flat)
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        if self.remove_names:
            keep = pc.and_(
                keep, pc.invert(pc.is_in(flat, value_set=self._names))
            )
        keep = pc.and_(keep, pc.invert(pc.utf8_is_numeric(flat)))
        keep = pc.and_(keep, pc.invert(pc.is_in(flat, value_set=self._drop)))
        lowered = pc.utf8_lower(flat)
        keep = pc.and_(
            keep, pc.greater_equal(pc.utf8_length(lowered), self.min_token_len)
        )
        mask = keep.to_numpy(zero_copy_only=False)
        kept_parents = parents.to_numpy(zero_copy_only=False)[mask]
        kept = lowered.filter(keep)
        counts = np.zeros(batch.num_rows, dtype=np.int64)
        np.add.at(counts, kept_parents, 1)
        offsets = np.zeros(batch.num_rows + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        out = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), kept)
        return pa.table({self.id_col: batch[self.id_col], "tokens": out})
