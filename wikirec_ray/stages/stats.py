"""Corpus-global statistics: document frequency, doc lengths, N, avgdl.

The reference computes document frequency with a driver-local
``defaultdict(int)`` — per doc, ``set(tokens)`` then +=1 per distinct token
(``/root/reference/src/wikirec/data_utils.py:945-948``; note it counts
*documents containing the term*, not term occurrences).  Here the same
semantics run distributed: each ``map_batches`` task emits per-batch partial
DF rows (one row per term per batch — already reduced by a within-batch Arrow
group-by), and a small ``groupby("term").sum`` finishes the job.  The partial
pre-aggregation is what keeps the shuffle input ~|vocab per batch| rather than
~|postings|.

BM25 additionally needs per-doc length and the corpus average (avgdl); the
reference's analog is the implicit doc length inside TfidfVectorizer
(``model.py:166-170``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from wikirec_ray.stages.analyze import _flat_tokens, doc_lengths


def _partial_df_batch(batch: pa.Table, text_col: str) -> pa.Table:
    """One (term, df) row per distinct term in the batch (df = number of the
    batch's docs containing it)."""
    parents, flat = _flat_tokens(batch[text_col].combine_chunks())
    pairs = pa.table({"_row": parents, "term": flat})
    # distinct (doc, term) then count docs per term — DF-not-TF semantics
    # (data_utils.py:945-948).
    distinct = pairs.group_by(["_row", "term"]).aggregate([])
    out = distinct.group_by("term").aggregate([("_row", "count")])
    return pa.table({"term": out["term"], "df": pc.cast(out["_row_count"], pa.int64())})


def document_frequencies(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Dataset(id, text, ...) -> Dataset(term, df). One small shuffle over
    per-batch partials."""
    partials = ds.map_batches(
        lambda b: _partial_df_batch(b, text_col), batch_format="pyarrow"
    )
    from ray.data.aggregate import Sum

    return partials.groupby("term").aggregate(Sum("df", alias_name="df"))


def doc_length_dataset(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Dataset(id, text, ...) -> Dataset(id, doc_len). Pure map, no shuffle."""
    return ds.map_batches(
        lambda b: doc_lengths(b, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )


def frequent_terms(
    ds: ray.data.Dataset,
    min_total: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """(term, total_tf) for terms whose corpus occurrence count >= min_total
    — the shape of the reference's wikilink frequency cut (Counter + keep
    count >= 4, model.py:437-443 / SURVEY A2), over terms."""
    import pyarrow.compute as pc2

    from ray.data.aggregate import Sum
    from wikirec_ray.stages.analyze import doc_term_freqs

    partials = ds.map_batches(
        lambda b: doc_term_freqs(b, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )
    totals = partials.groupby("term").aggregate(Sum("tf", alias_name="total_tf"))
    return totals.map_batches(
        lambda b: b.filter(pc2.greater_equal(b["total_tf"], min_total)),
        batch_format="pyarrow",
    )


def deterministic_sample(
    ds: ray.data.Dataset, modulus: int = 7, residue: int = 3, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Reproducible corpus subsample by id congruence — the cross-engine-
    checkable stand-in for the reference's np.random.choice subsampling
    (data_utils.py:996-1005); ``ds.random_sample(frac, seed)`` remains the
    statistical path when bitwise reproducibility across engines is not
    needed."""
    import numpy as np

    def fil(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        return batch.filter(pa.array(ids % modulus == residue))

    return ds.map_batches(fil, batch_format="pyarrow")


def vocabulary_prune(
    ds: ray.data.Dataset,
    min_df: int = 2,
    min_len: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-doc surviving-token counts after the reference's vocabulary
    pruning (keep tokens with len >= min_token_len and corpus DF >=
    min_token_freq — data_utils.py:962-969, SURVEY M14).

    Two-pass broadcast design: DF table aggregated once (small), shipped to
    every task via ``ray.put``, then a pure map filters tokens per batch.
    Returns (id, n_kept) for docs with >= 1 surviving token."""
    import ray

    df_rows = document_frequencies(ds, id_col=id_col, text_col=text_col).take_all()
    keep = frozenset(
        r["term"] for r in df_rows if r["df"] >= min_df and len(r["term"]) >= min_len
    )
    keep_ref = ray.put(keep)

    def count_kept(batch: pa.Table) -> pa.Table:
        import numpy as np

        kept = ray.get(keep_ref)
        parents, flat = _flat_tokens(batch[text_col].combine_chunks())
        par = parents.to_numpy(zero_copy_only=False)
        mask = np.fromiter((t in kept for t in flat.to_pylist()), bool, count=len(flat))
        counts = np.zeros(batch.num_rows, np.int64)
        np.add.at(counts, par[mask], 1)
        nz = np.flatnonzero(counts > 0)
        return pa.table(
            {id_col: batch[id_col].take(nz), "n_kept": pa.array(counts[nz])}
        )

    return ds.map_batches(count_kept, batch_format="pyarrow")


def corpus_stats(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> dict:
    """{'n_docs': N, 'avgdl': mean doc length, 'total_tokens': sum}.

    Computed as a streaming aggregate over doc lengths (ds.mean/count never
    materialize the corpus).
    """
    dl = doc_length_dataset(ds, id_col=id_col, text_col=text_col)
    from ray.data.aggregate import Count, Sum

    row = dl.aggregate(Count(alias_name="n_docs"), Sum("doc_len", alias_name="total_tokens"))
    n = int(row["n_docs"])
    tot = int(row["total_tokens"] or 0)
    return {"n_docs": n, "total_tokens": tot, "avgdl": (tot / n) if n else 0.0}
