"""Text-analysis operators over the documents table: token counting, quality
signals, language ID, fingerprinting.

These extend the reference's per-token filters (``data_utils.py:549-597,
962-978`` — its notion of "quality" is stopword/numeric/length pruning) into
the standard large-scale training-data signals.  All per-doc computations are
single ``map_batches`` passes; no shuffles except the final small histogram
groupbys.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from wikirec_ray.stages.analyze import DEFAULT_STOPWORDS, _flat_tokens

# Tiny per-language stopword profiles for the heuristic language scorer.
# Real deployments plug in fastText/CLD3 via the same actor-pool stage; the
# heuristic keeps the container dependency-free and deterministic.
LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in a is that it for was on are as with".split()),
    "de": frozenset("der die das und ist von zu mit den im für auf ein eine".split()),
    "es": frozenset("el la de que y en los del se las por un para es una".split()),
    "fr": frozenset("le la de et les des en un une du est pour que dans il".split()),
    "it": frozenset("il la di che e per un una del con non sono della i".split()),
}


def token_counts(ds: ray.data.Dataset, id_col="doc_id", text_col="text") -> ray.data.Dataset:
    """(id, n_tokens) — whitespace/punct tokenization, matching the SQL
    oracle's string_split_regex."""
    from wikirec_ray.stages.analyze import doc_lengths

    return ds.map_batches(
        lambda b: doc_lengths(b, id_col=id_col, text_col=text_col).rename_columns(
            [id_col, "n_tokens"]
        ),
        batch_format="pyarrow",
    )


_STOPWORDS_ARR = pa.array(sorted(DEFAULT_STOPWORDS), pa.string())


def _quality_batch(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    texts = batch[text_col].combine_chunks()
    parents, flat = _flat_tokens(texts)
    par = parents.to_numpy(zero_copy_only=False)
    n = batch.num_rows
    n_tokens = np.zeros(n, np.int64)
    np.add.at(n_tokens, par, 1)
    stop_hits = np.zeros(n, np.int64)
    is_stop = pc.is_in(flat, value_set=_STOPWORDS_ARR).to_numpy(zero_copy_only=False)
    np.add.at(stop_hits, par[is_stop], 1)
    # distinct tokens per doc
    uniq = np.zeros(n, np.int64)
    if len(flat):
        pairs = pa.table({"p": pa.array(par), "t": flat})
        g = pairs.group_by(["p", "t"]).aggregate([])
        np.add.at(uniq, g["p"].to_numpy(), 1)
    denom = np.maximum(n_tokens, 1).astype(np.float64)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_chars": pc.cast(pc.utf8_length(texts), pa.int64()),
            "n_tokens": pa.array(n_tokens),
            "stop_ratio": pa.array(np.round(stop_hits / denom, 6)),
            "uniq_ratio": pa.array(np.round(uniq / denom, 6)),
        }
    )


def quality_scores(ds: ray.data.Dataset, id_col="doc_id", text_col="text") -> ray.data.Dataset:
    """(id, n_chars, n_tokens, stop_ratio, uniq_ratio) quality signals."""
    return ds.map_batches(
        lambda b: _quality_batch(b, id_col, text_col), batch_format="pyarrow"
    )


class LangId:
    """Actor-pool heuristic language identifier (stopword-profile argmax).

    Profiles are built once per actor (__init__) — the T1 stateful-stage
    pattern (SURVEY.md §2.3); ties and zero-evidence docs → 'und'."""

    def __init__(self, profiles: dict[str, frozenset[str]] | None = None,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.profiles = profiles or LANG_PROFILES
        self.langs = sorted(self.profiles)
        # broadcast value-sets built once per actor; per-batch membership is
        # pc.is_in over the UNIQUE vocab of the batch (dictionary_encode),
        # never a Python loop over the token stream
        self.prof_arrays = [
            pa.array(sorted(self.profiles[lang]), pa.string()) for lang in self.langs
        ]
        self.langs_np = np.array(self.langs + ["und"])
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        parents, flat = _flat_tokens(batch[self.text_col].combine_chunks())
        par = parents.to_numpy(zero_copy_only=False)
        n = batch.num_rows
        enc = flat.dictionary_encode()
        uniq = enc.dictionary
        tok_idx = enc.indices.to_numpy(zero_copy_only=False)
        scores = np.zeros((n, len(self.langs)), np.int64)
        for li, prof_arr in enumerate(self.prof_arrays):
            hit_uniq = pc.is_in(uniq, value_set=prof_arr).to_numpy(zero_copy_only=False)
            hit = hit_uniq[tok_idx] if len(tok_idx) else np.zeros(0, bool)
            np.add.at(scores[:, li], par[hit], 1)
        best = scores.argmax(axis=1)
        has_evidence = scores.max(axis=1) > 0
        # tie → und (ambiguous)
        sorted_scores = np.sort(scores, axis=1)
        tie = (scores.max(axis=1) == sorted_scores[:, -2]) & (scores.max(axis=1) > 0)
        pred = np.where(has_evidence & ~tie, self.langs_np[best], "und")
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "pred_lang": pa.array(pred.tolist(), pa.string()),
                "evidence": pa.array(scores.max(axis=1)),
            }
        )


def lang_histogram(ds: ray.data.Dataset, lang_col: str = "lang") -> ray.data.Dataset:
    """(lang, n_docs) from the declared-language column (small groupby)."""
    from ray.data.aggregate import Count

    return ds.groupby(lang_col).aggregate(Count(alias_name="n_docs"))


def _bigram_batch(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch partial adjacent-pair counts (the distributed analog of
    gensim.Phrases' pair statistics, data_utils.py:819-844 / SURVEY A3)."""
    parents, flat = _flat_tokens(batch[text_col].combine_chunks())
    par = parents.to_numpy(zero_copy_only=False)
    if len(par) < 2:
        return pa.table(
            {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
    same_doc = par[1:] == par[:-1]
    w1 = flat.slice(0, len(flat) - 1).filter(pa.array(same_doc))
    w2 = flat.slice(1).filter(pa.array(same_doc))
    g = pa.table({"w1": w1, "w2": w2}).group_by(["w1", "w2"]).aggregate([("w1", "count")])
    return pa.table(
        {"w1": g["w1"], "w2": g["w2"], "n": pc.cast(g["w1_count"], pa.int64())}
    )


def bigram_counts(
    ds: ray.data.Dataset, top_n: int = 30, text_col: str = "text"
) -> ray.data.Dataset:
    """Top-N adjacent token pairs: per-batch partial counts (vectorized via
    Arrow offsets — no Python token loop), small groupby-sum, global
    sort+limit with deterministic (n desc, w1, w2) tie order."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(lambda b: _bigram_batch(b, text_col), batch_format="pyarrow")
    totals = partials.groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))
    return totals.sort(["n", "w1", "w2"], descending=[True, False, False]).limit(top_n)


def _fingerprint_batch(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    # md5 is not splittable, so one digest call per row is unavoidable — but
    # hashing memoryview slices of the Arrow data buffer directly skips the
    # per-row str materialization + utf-8 re-encode that to_pylist() pays.
    arr = batch[text_col].combine_chunks().fill_null("")
    if arr.type == pa.large_string():
        arr = arr.cast(pa.string())
    off = arr.buffers()[1]
    starts = np.frombuffer(off, np.int32, count=len(arr) + 1, offset=arr.offset * 4)
    data = memoryview(arr.buffers()[2]) if arr.buffers()[2] is not None else memoryview(b"")
    md5 = hashlib.md5
    fps = [
        md5(data[starts[i]:starts[i + 1]]).hexdigest() for i in range(len(arr))
    ]
    return pa.table({id_col: batch[id_col], "fingerprint": pa.array(fps, pa.string())})


def fingerprints(ds: ray.data.Dataset, id_col="doc_id", text_col="text") -> ray.data.Dataset:
    """(id, md5(text)) content fingerprints — the exact-dedup key and the
    cross-engine-checkable analog of a rolling content hash."""
    return ds.map_batches(
        lambda b: _fingerprint_batch(b, id_col, text_col), batch_format="pyarrow"
    )


# BPE-style pre-tokenization count: letter runs, digit runs, and symbol runs
# with their leading space (the GPT-2 pre-tokenizer family, minus lookaheads
# so the SAME RE2 pattern runs in Arrow and DuckDB).
BPE_SPLIT_REGEX = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_token_counts(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """(id, n_bpe_tokens): vectorized match count of the BPE-ish pre-token
    pattern — the cheap LLM-token budget estimator (whitespace counting
    undercounts code/punctuation-heavy text)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            batch[text_col].combine_chunks().fill_null(""), pattern=BPE_SPLIT_REGEX
        )
        return pa.table(
            {id_col: batch[id_col], "n_bpe_tokens": pc.cast(n, pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def approx_distinct(
    ds: "ray.data.Dataset", col: str, p: int | None = None
) -> float:
    """Approximate distinct count of ``col`` via HyperLogLog: each batch
    emits ONE register-blob row (4 KB), the driver merges by elementwise
    max — sketch rows on the driver, never data rows.  Typical error
    1.04/√4096 ≈ 1.6% (asserted < 5% in tests)."""
    from wikirec_ray.functions.hashing import (
        HLL_P,
        hll_estimate,
        hll_merge,
        hll_partial,
    )

    p = HLL_P if p is None else p

    def partial(batch: pa.Table) -> pa.Table:
        # poly+fmix token hash of the value's string form — vectorized over
        # the Arrow buffer AND SQL-reproducible, which is what gives the
        # approx_distinct_users entry a real DuckDB oracle (HLL-in-SQL)
        from wikirec_ray.functions.hashing import token_hashes_arrow

        vals = batch[col].combine_chunks().cast(pa.string()).fill_null("")
        hs = token_hashes_arrow(vals)
        return pa.table({"regs": pa.array([hll_partial(hs, p).tobytes()], pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    regs = hll_merge([np.frombuffer(r["regs"], np.uint8) for r in rows])
    return hll_estimate(regs)


PROPS_K_REGEX = r'"k": (\d+)'


def props_k_histogram(ds: "ray.data.Dataset", props_col: str = "props") -> "ray.data.Dataset":
    """(k, n_events) histogram of the JSON props key — vectorized regex
    extraction (same RE2 pattern as the SQL oracle), combiner-pattern
    aggregation."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            batch[props_col].combine_chunks().fill_null(""),
            pattern=r'"k": (?P<k>\d+)',
        )
        ks = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        g = pa.table({"k": ks}).drop_null().group_by("k").aggregate([("k", "count")])
        return pa.table(
            {"k": g["k"], "n": pc.cast(g["k_count"], pa.int64())}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n_events"))
    )
    return out


def lm_quality_scores(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_vocab: int = 1 << 20,
) -> "ray.data.Dataset":
    """(id, n_tokens, avg_logprob): mean unigram log-probability of each doc
    under the corpus's own add-one-smoothed unigram LM — the classic
    perplexity-family quality signal (docs full of corpus-atypical tokens
    score low).

    Scale shape (VERDICT r02 item 2 — the old version pulled the WHOLE
    vocabulary to the driver):

    - totals aggregate distributed and stay a Dataset; total token count and
      |V| come from a streaming aggregate, never a driver list;
    - only the top-``max_vocab`` terms by tf (one distributed sort+limit)
      are broadcast; terms outside the head score as OOV — the add-one
      smoothing term already assigns unseen tokens ln(1)/ln(T+|V|), so the
      cap only coarsens scores for tail tokens (which are near the OOV
      probability anyway).  At 10^9-term crawls the broadcast stays ~tens
      of MB instead of the full vocabulary;
    - per-batch scoring is a vectorized ``index_in`` against the broadcast
      term array — no per-token Python.

    logp(t) = ln((tf_t + 1) / (T + |V|))."""
    import math

    import ray

    from wikirec_ray.stages.analyze import doc_term_freqs

    from ray.data.aggregate import Count, Sum

    partials = ds.map_batches(
        lambda b: doc_term_freqs(b, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )
    totals = partials.groupby("term").aggregate(Sum("tf", alias_name="tf")).materialize()
    stat = totals.aggregate(Sum("tf", alias_name="total"), Count(alias_name="v"))
    total_tokens = int(stat["total"] or 0)
    vocab = int(stat["v"])
    denom = math.log(total_tokens + vocab) if (total_tokens + vocab) else 1.0
    head = (
        totals.sort(["tf", "term"], descending=[True, False])
        .limit(max_vocab)
        .take_all()
    )
    terms_arr = pa.array([r["term"] for r in head], pa.string())
    logp_arr = np.array(
        [math.log(r["tf"] + 1) - denom for r in head], np.float64
    )
    ref = ray.put((terms_arr, logp_arr))

    def score(batch: pa.Table) -> pa.Table:
        terms, logp = ray.get(ref)
        parents, flat = _flat_tokens(batch[text_col].combine_chunks())
        par = parents.to_numpy(zero_copy_only=False)
        oov = -denom  # add-one smoothing: unseen token => ln(1) - ln(T+V)
        idx = pc.index_in(flat, value_set=terms)
        idx_np = idx.to_numpy(zero_copy_only=False).astype(np.float64)
        hit = ~np.isnan(idx_np)
        lp = np.full(len(flat), oov, np.float64)
        if hit.any():
            lp[hit] = logp[idx_np[hit].astype(np.int64)]
        sums = np.zeros(batch.num_rows, np.float64)
        counts = np.zeros(batch.num_rows, np.int64)
        np.add.at(sums, par, lp)
        np.add.at(counts, par, 1)
        avg = np.round(np.divide(sums, np.maximum(counts, 1)), 6)
        nz = np.flatnonzero(counts > 0)  # zero-token docs have no LM score
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(nz)),
                "n_tokens": pa.array(counts[nz]),
                "avg_logprob": pa.array(avg[nz]),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
