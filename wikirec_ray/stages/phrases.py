"""Distributed phrase (n-gram) detection: the engine's version of the
reference's corpus-global gensim ``Phrases`` state (SURVEY T2/A3;
``/root/reference/src/wikirec/data_utils.py:817-864``).

The reference trains ``Phrases`` bigram models on the WHOLE corpus
(min_count=``min_ngram_count``, threshold=5.0, connector_words=stop_words),
trains TRIGRAM models over the bigrammed corpus (data_utils.py:826-831), and
applies both per doc, inserting each detected n-gram **at position 0** of
the token list (``data_utils.py:855-862`` — bigram tokens with one "_"
first, then trigram tokens with two "_"; each ``insert(0, ...)`` reverses
the found order, a reference quirk preserved here).

Semantics follow gensim's ``Phrases`` (Mikolov et al., 2013, "Distributed
Representations of Words and Phrases..."):

- counting: every pair of consecutive NON-CONNECTOR tokens within a doc is
  a candidate; connector words (stopwords) between them become part of the
  phrase key ("bank_of_america") but are EXCLUDED from the unigram vocab
  (gensim's ``_learn_vocab`` increments vocab only on the non-connector
  branch); the score uses the unigram counts of the two content words:
      score(a, …, b) = (count(a…b) − min_count) · |vocab| / (count(a)·count(b))
  a candidate is a phrase when score > threshold.
- application (``apply_stream``): greedy left-to-right scan; a matched span
  is replaced by the joined token and both endpoints are consumed (the end
  word cannot start the next phrase) — gensim's ``analyze_sentence``.
- trigram pass: the same counting over the BIGRAMMED stream, so trained
  pairs look like ("new_york", "city").

Deviation from the reference, documented: the reference computes
``trigrams[bigrams[text]]`` on the text AFTER bigram tokens were already
inserted at position 0 (the loop mutates ``text`` while iterating,
data_utils.py:855-862), which can let a prepended token pair with the
document head.  We apply the trigram scan to the bigrammed ORIGINAL token
stream — identical except for those pathological cross-boundary matches.

Two-pass broadcast design per model (the corpus-wide barrier of SURVEY
§3.2): distributed partial pair/unigram counts → one small groupby-sum →
the scored phrase table is broadcast via ``ray.put`` and applied by an
actor pool (deserialized once per actor in ``__init__``).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from wikirec_ray.stages.analyze import _flat_tokens

DEFAULT_MIN_COUNT = 5  # reference default min_ngram_count (data_utils.py:683)
DEFAULT_THRESHOLD = 5.0  # data_utils.py:826,840

PARTIAL_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # 'u' unigram | 'b' candidate pair
        ("w1", pa.string()),    # start content word
        ("mid", pa.string()),   # "_"-joined connector run between them ('' if none)
        ("w2", pa.string()),    # end content word ('' for unigrams)
        ("n", pa.int64()),
    ]
)


def _partials_table(uni: pa.Table, pair_w1, pair_mid, pair_w2, pair_n) -> pa.Table:
    n_uni = uni.num_rows
    return pa.table(
        {
            "kind": pa.array(["u"] * n_uni + ["b"] * len(pair_w1), pa.string()),
            "w1": pa.concat_arrays(
                [uni["w1"].combine_chunks(), pa.array(pair_w1, pa.string())]
            ),
            "mid": pa.concat_arrays(
                [pa.array([""] * n_uni, pa.string()), pa.array(pair_mid, pa.string())]
            ),
            "w2": pa.concat_arrays(
                [pa.array([""] * n_uni, pa.string()), pa.array(pair_w2, pa.string())]
            ),
            "n": pa.concat_arrays(
                [pc.cast(uni["w1_count"], pa.int64()).combine_chunks(),
                 pa.array(pair_n, pa.int64())]
            ),
        },
        schema=PARTIAL_SCHEMA,
    )


def _pair_unigram_partials(
    batch: pa.Table, text_col: str, connector_words: frozenset[str] = frozenset()
) -> pa.Table:
    """Per-batch partial counts (PARTIAL_SCHEMA rows), fully vectorized.

    With connector words, candidate pairs are consecutive content tokens
    within a doc; the connector run between them is materialized as a
    list-array slice of the flat token stream and joined with
    ``pc.binary_join`` — no per-row Python loop."""
    parents, flat = _flat_tokens(batch[text_col].combine_chunks())
    par = parents.to_numpy(zero_copy_only=False)
    if connector_words:
        # gensim's _learn_vocab increments vocab only for NON-connector
        # tokens (connectors can never be phrase endpoints, and counting
        # them would inflate |vocab| and thus every score)
        conn_for_uni = pc.is_in(
            flat, value_set=pa.array(sorted(connector_words), pa.string())
        )
        uni_src = flat.filter(pc.invert(conn_for_uni))
    else:
        uni_src = flat
    uni = pa.table({"w1": uni_src}).group_by("w1").aggregate([("w1", "count")])

    if len(par) < 2:
        return _partials_table(uni, [], [], [], [])

    if not connector_words:
        same = par[1:] == par[:-1]
        w1 = flat.slice(0, len(flat) - 1).filter(pa.array(same))
        w2 = flat.slice(1).filter(pa.array(same))
        big = (
            pa.table({"w1": w1, "w2": w2})
            .group_by(["w1", "w2"])
            .aggregate([("w1", "count")])
        )
        return _partials_table(
            uni,
            big["w1"].combine_chunks(),
            pa.array([""] * big.num_rows, pa.string()),
            big["w2"].combine_chunks(),
            pc.cast(big["w1_count"], pa.int64()).combine_chunks(),
        )

    conn = pc.is_in(flat, value_set=pa.array(sorted(connector_words), pa.string()))
    mask = conn.to_numpy(zero_copy_only=False)
    cidx = np.flatnonzero(~mask)  # content-token positions in the flat stream
    if len(cidx) < 2:
        return _partials_table(uni, [], [], [], [])
    i1, i2 = cidx[:-1], cidx[1:]
    keep = par[i1] == par[i2]
    i1, i2 = i1[keep], i2[keep]
    gaps = (i2 - i1 - 1).astype(np.int64)
    # connector run per pair: flat[i1+1 : i2] as one list array, then join
    total = int(gaps.sum())
    if total:
        starts = i1 + 1
        cum = np.zeros(len(gaps), np.int64)
        np.cumsum(gaps[:-1], out=cum[1:])
        idx = np.repeat(starts, gaps) + np.arange(total) - np.repeat(cum, gaps)
        mid_vals = flat.take(pa.array(idx))
    else:
        mid_vals = pa.array([], pa.string())
    offsets = np.zeros(len(gaps) + 1, np.int64)
    np.cumsum(gaps, out=offsets[1:])
    mids = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), mid_vals), "_"
    )
    big = (
        pa.table({"w1": flat.take(pa.array(i1)), "mid": mids, "w2": flat.take(pa.array(i2))})
        .group_by(["w1", "mid", "w2"])
        .aggregate([("w1", "count")])
    )
    return _partials_table(
        uni,
        big["w1"].combine_chunks(),
        big["mid"].combine_chunks(),
        big["w2"].combine_chunks(),
        pc.cast(big["w1_count"], pa.int64()).combine_chunks(),
    )


def _collect_and_score(totals, min_count: int, threshold: float) -> dict[tuple[str, ...], float]:
    """Totals Dataset (PARTIAL_SCHEMA) -> {(w1, *connectors, w2): score},
    with the driver pull BOUNDED (VERDICT r02 item 2 — bigram vocabulary is
    much larger than unigram vocabulary, and the old ``take_all`` pulled all
    of it):

    - bigram rows below ``min_count`` are dropped inside the Dataset (the
      distributed analog of gensim Phrases' own vocab pruning);
    - |V| (the score formula's vocab term) comes from a distributed count;
    - only unigram rows for words that appear in a SURVIVING bigram are
      pulled — bounded by 2·|surviving bigrams|, not the vocabulary."""
    import pyarrow.compute as pc

    totals = totals.materialize()
    vocab_len = totals.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], "u")), batch_format="pyarrow"
    ).count()
    big_rows = totals.map_batches(
        lambda b: b.filter(
            pc.and_(pc.equal(b["kind"], "b"), pc.greater_equal(b["n"], min_count))
        ),
        batch_format="pyarrow",
    ).take_all()
    needed = sorted({r["w1"] for r in big_rows} | {r["w2"] for r in big_rows})
    need_arr = pa.array(needed, pa.string())
    uni_rows = totals.map_batches(
        lambda b: b.filter(
            pc.and_(pc.equal(b["kind"], "u"), pc.is_in(b["w1"], value_set=need_arr))
        ),
        batch_format="pyarrow",
    ).take_all() if needed else []
    uni = {r["w1"]: r["n"] for r in uni_rows}
    table: dict[tuple[str, ...], float] = {}
    for r in big_rows:
        a, b, nab = r["w1"], r["w2"], r["n"]
        score = (nab - min_count) * vocab_len / (uni[a] * uni[b])
        if score > threshold:
            key = (a, *(r["mid"].split("_") if r["mid"] else ()), b)
            table[key] = score
    return table


def train_phrases(
    ds: ray.data.Dataset,
    min_count: int = DEFAULT_MIN_COUNT,
    threshold: float = DEFAULT_THRESHOLD,
    text_col: str = "text",
    connector_words: frozenset[str] = frozenset(),
) -> dict[tuple[str, ...], float]:
    """Corpus-global bigram phrase table {(w1, [*connectors,] w2): score}.
    One small shuffle over per-batch partial counts; the driver holds only
    the vocabulary-sized totals, never the corpus."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        lambda b: _pair_unigram_partials(b, text_col, connector_words),
        batch_format="pyarrow",
    )
    totals = partials.groupby(["kind", "w1", "mid", "w2"]).aggregate(
        Sum("n", alias_name="n")
    )
    return _collect_and_score(totals, min_count, threshold)


# ---------------------------------------------------------------------------
# frequent-bigram selection (index-build precompute pass)
# ---------------------------------------------------------------------------


def _pair_df_partials(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch partial DOCUMENT frequencies of adjacent token pairs:
    one row per (w1, w2) with the number of distinct batch docs containing
    the pair (docs live wholly inside one batch, so partial DFs sum exactly
    to corpus DF).  Fully vectorized: one adjacency mask + one Arrow
    group_by over deduplicated (doc, w1, w2) triples."""
    parents, flat = _flat_tokens(batch[text_col].combine_chunks())
    par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    empty = pa.table(
        {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
         "n": pa.array([], pa.int64())}
    )
    if len(par) < 2:
        return empty
    same = par[1:] == par[:-1]
    idx = np.flatnonzero(same)
    if not len(idx):
        return empty
    dict_arr = flat.dictionary_encode()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_uniq = len(dict_arr.dictionary)
    # dedupe (doc, pair) occurrences -> one row per doc containing the pair
    key = (par[idx] * n_uniq + codes[idx]) * n_uniq + codes[idx + 1]
    uniq_keys = np.unique(key)
    pair_code = uniq_keys % (n_uniq * n_uniq)
    c1 = (pair_code // n_uniq).astype(np.int64)
    c2 = (pair_code % n_uniq).astype(np.int64)
    g = (
        pa.table(
            {
                "w1": dict_arr.dictionary.take(pa.array(c1)),
                "w2": dict_arr.dictionary.take(pa.array(c2)),
            }
        )
        .group_by(["w1", "w2"])
        .aggregate([("w1", "count")])
    )
    return pa.table(
        {"w1": g["w1"], "w2": g["w2"], "n": pc.cast(g["w1_count"], pa.int64())}
    )


def top_bigrams_by_df(
    ds: ray.data.Dataset, k: int, text_col: str = "text"
) -> list[tuple[str, str]]:
    """The ``k`` adjacent token pairs occurring in the most documents,
    deterministically ordered (df desc, w1 asc, w2 asc).  One streaming
    pass + one single-int-key hash-partitioned shuffle; the driver pulls at
    most n_parts × k candidate rows.  This is
    ``build_index(precompute_bigrams=k)``'s selection pass: the pairs whose
    posting lists get materialized as composite terms so stopword-pair
    phrase queries skip the position-stream decode."""
    if k <= 0:
        return []
    from wikirec_ray.functions.hashing import GOLD64, fmix64, token_hashes_arrow
    from wikirec_ray.functions.partitions import partitioned_map_groups

    partials = ds.map_batches(
        lambda b: _pair_df_partials(b, text_col), batch_format="pyarrow"
    )

    # aggregate inside hash partitions (the dedup._aggregate_pairs shape):
    # shuffling on ONE int column and running Arrow's C++ group_by inside
    # each partition is ~10× a Ray groupby over two string key columns at a
    # multi-million-pair vocabulary (the pair key is hashed only for
    # PLACEMENT — identity stays the exact strings).  Each partition also
    # pre-trims to its local top-k (>= k rows incl. ties), so the driver
    # pull is bounded by n_parts × k, never the pair vocabulary.
    def key_fn(b: pa.Table) -> np.ndarray:
        h1 = token_hashes_arrow(b["w1"].combine_chunks())
        h2 = token_hashes_arrow(b["w2"].combine_chunks())
        with np.errstate(over="ignore"):
            return fmix64(h1 * GOLD64 + h2)

    def agg_topk(part: pa.Table) -> pa.Table:
        g = (
            part.select(["w1", "w2", "n"])
            .group_by(["w1", "w2"])
            .aggregate([("n", "sum")])
        )
        n = g["n_sum"].to_numpy()
        if len(n) > k:
            thr = np.partition(n, len(n) - k)[len(n) - k]
            keep = n >= thr
            g = g.filter(pa.array(keep))
            n = n[keep]
        return pa.table(
            {"w1": g["w1"], "w2": g["w2"], "n": pa.array(n.astype(np.int64))}
        )

    cand = partitioned_map_groups(partials, key_fn, agg_topk).take_all()
    cand.sort(key=lambda r: (-r["n"], r["w1"], r["w2"]))
    return [(r["w1"], r["w2"]) for r in cand[:k]]


# ---------------------------------------------------------------------------
# gensim-style stream application (greedy, consuming)
# ---------------------------------------------------------------------------


def apply_stream(
    tokens: list[str],
    table: dict[tuple[str, ...], float],
    connector_words: frozenset[str] = frozenset(),
) -> list[str]:
    """gensim ``Phrases.analyze_sentence`` semantics: greedy left-to-right;
    a matched (start, *connectors, end) span becomes one joined token and is
    consumed (the end word cannot start the next phrase)."""
    out: list[str] = []
    start: str | None = None
    pending: list[str] = []
    for tok in tokens:
        if tok in connector_words:
            if start is None:
                out.append(tok)
            else:
                pending.append(tok)
            continue
        if start is None:
            start = tok
            continue
        key = (start, *pending, tok)
        if key in table:
            out.append("_".join(key))
            start, pending = None, []
        else:
            out.append(start)
            out.extend(pending)
            pending = []
            start = tok
    if start is not None:
        out.append(start)
        out.extend(pending)
    return out


def _stream_partial_rows(
    token_lists: list[list[str]], connector_words: frozenset[str]
) -> pa.Table:
    """PARTIAL_SCHEMA partial counts over already-materialized token streams
    (the trigram pass input — sequential per doc by construction)."""
    uni: Counter = Counter()
    pairs: Counter = Counter()
    for toks in token_lists:
        uni.update(t for t in toks if t not in connector_words)
        start: str | None = None
        pending: list[str] = []
        for tok in toks:
            if tok in connector_words:
                if start is not None:
                    pending.append(tok)
                continue
            if start is not None:
                pairs[(start, "_".join(pending), tok)] += 1
            start, pending = tok, []
    uni_tbl = pa.table(
        {
            "w1": pa.array(list(uni.keys()), pa.string()),
            "w1_count": pa.array(list(uni.values()), pa.int64()),
        }
    )
    keys = list(pairs.keys())
    return _partials_table(
        uni_tbl,
        [k[0] for k in keys],
        [k[1] for k in keys],
        [k[2] for k in keys],
        list(pairs.values()),
    )


class _BigramStreamCounter:
    """Actor-pool stage for the trigram pass: tokenize, apply the broadcast
    bigram table per doc (sequential greedy scan), emit partial counts of
    the bigrammed stream."""

    def __init__(self, bigram_ref, text_col: str, connector_words: frozenset[str]):
        self.table = ray.get(bigram_ref) if not isinstance(bigram_ref, dict) else bigram_ref
        self.text_col = text_col
        self.conn = connector_words

    def __call__(self, batch: pa.Table) -> pa.Table:
        parents, flat = _flat_tokens(batch[self.text_col].combine_chunks())
        par = parents.to_numpy(zero_copy_only=False)
        toks = flat.to_pylist()
        bounds = np.searchsorted(par, np.arange(batch.num_rows + 1))
        streams = [
            apply_stream(toks[bounds[r] : bounds[r + 1]], self.table, self.conn)
            for r in range(batch.num_rows)
        ]
        return _stream_partial_rows(streams, self.conn)


def train_trigram_phrases(
    ds: ray.data.Dataset,
    bigram_table: dict[tuple[str, ...], float],
    min_count: int = DEFAULT_MIN_COUNT,
    threshold: float = DEFAULT_THRESHOLD,
    text_col: str = "text",
    connector_words: frozenset[str] = frozenset(),
    concurrency: int | tuple = 2,
) -> dict[tuple[str, ...], float]:
    """Trigram table trained over the bigrammed corpus (data_utils.py:826-831:
    ``Phrases(sentences=bigrams[tokenized_texts], ...)``).  Keys look like
    ("new_york", "city"); applying them yields tokens with ≥2 underscores."""
    from ray.data.aggregate import Sum

    ref = ray.put(bigram_table)
    partials = ds.map_batches(
        _BigramStreamCounter,
        fn_constructor_kwargs={
            "bigram_ref": ref, "text_col": text_col, "connector_words": connector_words,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    totals = partials.groupby(["kind", "w1", "mid", "w2"]).aggregate(
        Sum("n", alias_name="n")
    )
    return _collect_and_score(totals, min_count, threshold)


def train_phrase_models(
    ds: ray.data.Dataset,
    min_count: int = DEFAULT_MIN_COUNT,
    threshold: float = DEFAULT_THRESHOLD,
    text_col: str = "text",
    connector_words: frozenset[str] = frozenset(),
    concurrency: int | tuple = 2,
) -> tuple[dict[tuple[str, ...], float], dict[tuple[str, ...], float]]:
    """Bigram + trigram tables, mirroring the reference's two Phrases fits."""
    bi = train_phrases(ds, min_count, threshold, text_col, connector_words)
    tri = train_trigram_phrases(
        ds, bi, min_count, threshold, text_col, connector_words, concurrency
    )
    return bi, tri


# ---------------------------------------------------------------------------
# application stage (reference insert-at-0 placement)
# ---------------------------------------------------------------------------


class PhraseApplier:
    """Actor-pool stage reproducing the reference's insertion loop
    (data_utils.py:855-862): every token of ``bigrams[text]`` with one "_"
    is inserted at position 0, then every token of ``trigrams[bigrams[text]]``
    with two "_" — each ``insert(0, ...)`` reverses the found order, so the
    output is reversed(found_trigrams) + reversed(found_bigrams) + original
    tokens.  Note a connector bigram like "bank_of_america" carries two
    underscores and is therefore inserted by the TRIGRAM loop — reference
    quirk preserved."""

    def __init__(
        self,
        phrase_table_ref,
        trigram_table_ref=None,
        connector_words: frozenset[str] = frozenset(),
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        def _resolve(ref):
            if ref is None:
                return {}
            return ray.get(ref) if not isinstance(ref, dict) else ref

        self.bi = _resolve(phrase_table_ref)
        self.tri = _resolve(trigram_table_ref)
        self.conn = connector_words
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        parents, flat = _flat_tokens(batch[self.text_col].combine_chunks())
        par = parents.to_numpy(zero_copy_only=False)
        toks = flat.to_pylist()
        bounds = np.searchsorted(par, np.arange(batch.num_rows + 1))
        out = []
        for row in range(batch.num_rows):
            sub = toks[bounds[row] : bounds[row + 1]]
            bi_stream = apply_stream(sub, self.bi, self.conn)
            found_bi = [t for t in bi_stream if t.count("_") == 1]
            if self.tri:
                tri_stream = apply_stream(bi_stream, self.tri, self.conn)
                found_tri = [t for t in tri_stream if t.count("_") == 2]
            else:
                found_tri = [t for t in bi_stream if t.count("_") == 2]
            out.append(found_tri[::-1] + found_bi[::-1] + sub)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "tokens": pa.array(out, type=pa.large_list(pa.string())),
            }
        )


def apply_phrases(
    ds: ray.data.Dataset,
    phrase_table: dict[tuple[str, ...], float],
    trigram_table: dict[tuple[str, ...], float] | None = None,
    connector_words: frozenset[str] = frozenset(),
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | tuple = 2,
) -> ray.data.Dataset:
    ref = ray.put(phrase_table)
    tri_ref = ray.put(trigram_table) if trigram_table is not None else None
    return ds.map_batches(
        PhraseApplier,
        fn_constructor_kwargs={
            "phrase_table_ref": ref,
            "trigram_table_ref": tri_ref,
            "connector_words": connector_words,
            "id_col": id_col,
            "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
