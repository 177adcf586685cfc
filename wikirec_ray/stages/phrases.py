"""Distributed phrase (n-gram) detection: the engine's version of the
reference's corpus-global gensim ``Phrases`` state (SURVEY T2/A3;
``/root/reference/src/wikirec/data_utils.py:817-864``).

The reference trains ``Phrases`` bigram+trigram models on the WHOLE corpus
(min_count=``min_ngram_count``, threshold=5.0) and then applies them per
doc, inserting each detected n-gram **at position 0** of the token list
(``data_utils.py:857,862`` — the insert-at-0 placement is a reference quirk
preserved here).

Two-pass broadcast design (the pattern SURVEY §3.2 calls the corpus-wide
barrier):

  pass 1  distributed counting — per-batch partial unigram + adjacent-pair
          counts (vectorized over Arrow offsets), small groupby-sum;
          scoring uses the same formula family as gensim's default
          ``original_scorer`` (Mikolov et al., 2013, "Distributed
          Representations of Words and Phrases..."):
              score(a,b) = (count(a,b) − min_count) · |vocab|
                           / (count(a) · count(b))
          a pair is a phrase when score > threshold.
  pass 2  the phrase table is broadcast via ``ray.put`` once and applied by
          an actor pool (table deserialized per actor in ``__init__``).

Connector-word handling (stopwords allowed inside phrases) is accepted as a
parameter for API parity but not implemented — detected pairs are strictly
adjacent; the reference's stopword-connector path is exercised only for
English with NLTK present.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from wikirec_ray.stages.analyze import _flat_tokens

DEFAULT_MIN_COUNT = 5  # reference default min_ngram_count (data_utils.py:683)
DEFAULT_THRESHOLD = 5.0  # data_utils.py:826,840


def _pair_unigram_partials(batch: pa.Table, text_col: str) -> pa.Table:
    """Rows (kind, w1, w2, n): kind 'u' = unigram (w2=''), 'b' = bigram."""
    parents, flat = _flat_tokens(batch[text_col].combine_chunks())
    par = parents.to_numpy(zero_copy_only=False)
    uni = pa.table({"w1": flat}).group_by("w1").aggregate([("w1", "count")])
    n_uni = uni.num_rows
    if len(par) >= 2:
        same = par[1:] == par[:-1]
        w1 = flat.slice(0, len(flat) - 1).filter(pa.array(same))
        w2 = flat.slice(1).filter(pa.array(same))
        big = pa.table({"w1": w1, "w2": w2}).group_by(["w1", "w2"]).aggregate([("w1", "count")])
    else:
        big = pa.table({"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
                        "w1_count": pa.array([], pa.int64())})
    return pa.table(
        {
            "kind": pa.array(["u"] * n_uni + ["b"] * big.num_rows, pa.string()),
            "w1": pa.concat_arrays([uni["w1"].combine_chunks(), big["w1"].combine_chunks()]),
            "w2": pa.concat_arrays(
                [pa.array([""] * n_uni, pa.string()), big["w2"].combine_chunks()]
            ),
            "n": pa.concat_arrays(
                [
                    pc.cast(uni["w1_count"], pa.int64()).combine_chunks(),
                    pc.cast(big["w1_count"], pa.int64()).combine_chunks(),
                ]
            ),
        }
    )


def train_phrases(
    ds: ray.data.Dataset,
    min_count: int = DEFAULT_MIN_COUNT,
    threshold: float = DEFAULT_THRESHOLD,
    text_col: str = "text",
    connector_words: frozenset[str] = frozenset(),
) -> dict[tuple[str, str], float]:
    """Corpus-global phrase table {(w1, w2): score}. One small shuffle over
    per-batch partial counts."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        lambda b: _pair_unigram_partials(b, text_col), batch_format="pyarrow"
    )
    totals = partials.groupby(["kind", "w1", "w2"]).aggregate(Sum("n", alias_name="n"))
    rows = totals.take_all()
    uni = {r["w1"]: r["n"] for r in rows if r["kind"] == "u"}
    vocab_len = len(uni)
    table: dict[tuple[str, str], float] = {}
    for r in rows:
        if r["kind"] != "b":
            continue
        a, b, nab = r["w1"], r["w2"], r["n"]
        if nab < min_count:
            continue
        score = (nab - min_count) * vocab_len / (uni[a] * uni[b])
        if score > threshold:
            table[(a, b)] = score
    return table


class PhraseApplier:
    """Actor-pool stage: prepend each detected phrase token "w1_w2" at
    position 0 of the doc's token list (reference placement,
    data_utils.py:857,862), original tokens preserved."""

    def __init__(self, phrase_table_ref, id_col: str = "doc_id", text_col: str = "text"):
        self.table = ray.get(phrase_table_ref) if not isinstance(phrase_table_ref, dict) else phrase_table_ref
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
            found = [
                f"{a}_{b}" for a, b in zip(sub, sub[1:]) if (a, b) in self.table
            ]
            # reference inserts at position 0 (most recently found first is
            # NOT specified; gensim order preserved = first-found first)
            out.append(found + sub)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "tokens": pa.array(out, type=pa.large_list(pa.string())),
            }
        )


def apply_phrases(
    ds: ray.data.Dataset,
    phrase_table: dict[tuple[str, str], float],
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | tuple = 2,
) -> ray.data.Dataset:
    ref = ray.put(phrase_table)
    return ds.map_batches(
        PhraseApplier,
        fn_constructor_kwargs={"phrase_table_ref": ref, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
