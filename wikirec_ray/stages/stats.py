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

import numpy as np
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


from wikirec_ray.functions.hashing import GOLD64 as _GOLD64

_GOLD = int(_GOLD64)  # SQL oracle generation needs the int form


def hash_sample(
    ds: ray.data.Dataset, rate_bp: int = 2000, seed: int = 42, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Deterministic pseudo-random subsample: keep a row iff
    ``fmix64(id * GOLD + seed) % 10000 < rate_bp`` (rate in basis points,
    2000 = 20%).  Statistically uniform like ``ds.random_sample`` but
    engine-independent and exactly reproducible in SQL — this is the
    ``random_sample`` entry's cross-engine-checkable mechanism (the
    reference's analog is np.random.choice, data_utils.py:996-1005)."""
    from wikirec_ray.functions.hashing import fmix64

    if not 0 <= rate_bp <= 10000:
        raise ValueError("rate_bp must be in [0, 10000]")

    def fil(batch: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            ids = batch[id_col].to_numpy().astype(np.uint64)
            key = fmix64(ids * _GOLD64 + np.uint64(seed))
        return batch.filter(pa.array((key % np.uint64(10000)) < rate_bp))

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

    Two-pass broadcast design, scale-shaped (VERDICT r02 item 2): the
    ``df >= min_df AND len >= min_len`` filter runs INSIDE the DF Dataset,
    so only the SURVIVING vocabulary reaches the driver (after thresholding
    that set is orders of magnitude smaller than the raw vocabulary); it
    broadcasts once via ``ray.put`` as an Arrow array and each batch tests
    membership with one vectorized ``is_in``.  If a deployment's kept set
    is still too large to broadcast, the same semantics are available as a
    token-level ``pipelines.joins.hash_join`` against the DF Dataset.
    Returns (id, n_kept) for docs with >= 1 surviving token."""
    import ray

    surv = (
        document_frequencies(ds, id_col=id_col, text_col=text_col)
        .map_batches(
            lambda b: b.filter(
                pc.and_(
                    pc.greater_equal(b["df"], min_df),
                    pc.greater_equal(pc.utf8_length(b["term"]), min_len),
                )
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    keep_arr = pa.array([r["term"] for r in surv], pa.string())
    keep_ref = ray.put(keep_arr)

    def count_kept(batch: pa.Table) -> pa.Table:
        kept = ray.get(keep_ref)
        parents, flat = _flat_tokens(batch[text_col].combine_chunks())
        par = parents.to_numpy(zero_copy_only=False)
        mask = pc.is_in(flat, value_set=kept).to_numpy(zero_copy_only=False)
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


def grouped_topk(
    ds: "ray.data.Dataset",
    group_col: str,
    order_col: str,
    k: int = 5,
    tiebreak_col: str | None = None,
    descending: bool = True,
) -> "ray.data.Dataset":
    """Top-k rows per group by ``order_col`` — the generic form of the
    per-query merges the ANN/BM25 paths do ad hoc.

    Combiner pattern: each batch reduces to its per-group top-k (vectorized
    lexsort + boundary rank mask), so the shuffle moves O(groups × k) rows
    per batch; the merge re-applies the same reduction inside HASH
    partitions of the group key (``partitioned_map_groups``) — no per-group
    dispatch over millions of tiny natural-key groups.

    Determinism: ties on ``order_col`` break by ``tiebreak_col`` ascending;
    pass a tiebreak that uniquely identifies rows (an id) for a fully
    deterministic result — without one, rows tied on ``order_col`` at the
    k-boundary are chosen by block layout."""
    import zlib

    from wikirec_ray.functions.partitions import partitioned_map_groups

    tie = tiebreak_col or order_col

    def topk_within(b: pa.Table) -> pa.Table:
        if "ppart" in b.column_names:
            b = b.drop_columns(["ppart"])
        if b.num_rows == 0:
            return b
        grp = b[group_col].to_numpy(zero_copy_only=False)
        val = b[order_col].to_numpy(zero_copy_only=False)  # numeric order col
        tb = b[tie].to_numpy(zero_copy_only=False)
        # dense order codes make the descending key exact for ANY dtype —
        # negating unsigned/extreme ints wraps (uint 0 would rank first)
        _, vcodes = np.unique(val, return_inverse=True)
        sv = (vcodes.max() - vcodes) if descending else vcodes
        # numeric group keys sort directly; strings via codes
        if grp.dtype.kind in "OUS":
            _, gcodes = np.unique(grp, return_inverse=True)
        else:
            gcodes = grp
        order = np.lexsort((tb, sv, gcodes))
        g_sorted = gcodes[order] if grp.dtype.kind in "OUS" else grp[order]
        new_grp = np.ones(len(order), bool)
        new_grp[1:] = g_sorted[1:] != g_sorted[:-1]
        # rank within group = position - position of group start
        starts = np.flatnonzero(new_grp)
        rank = np.arange(len(order)) - np.repeat(starts, np.diff(np.concatenate([starts, [len(order)]])))
        keep_idx = order[rank < k]
        return b.take(pa.array(np.sort(keep_idx)))

    def group_key(b: pa.Table) -> np.ndarray:
        g = b[group_col].to_numpy(zero_copy_only=False)
        if g.dtype.kind in "OUS":
            uniq, inv = np.unique(g, return_inverse=True)
            hk = np.fromiter(
                (zlib.crc32(str(u).encode("utf-8")) for u in uniq),
                np.int64, len(uniq),
            )
            return hk[inv]
        return g.astype(np.int64)

    partials = ds.map_batches(topk_within, batch_format="pyarrow")
    return partitioned_map_groups(partials, group_key, topk_within)


def stratified_sample(
    ds: "ray.data.Dataset",
    strata_col: str,
    rates: dict[str, int],
    default_modulus: int = 1,
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Deterministic per-stratum subsample: keep a row iff
    ``id % rates[stratum] == 0`` (modulus 1 = keep all; the cross-engine-
    checkable stratified analog of ``deterministic_sample``)."""
    if default_modulus <= 0 or any(m <= 0 for m in rates.values()):
        raise ValueError("strata moduli must be positive (numpy %% 0 keeps all)")

    def fil(batch: pa.Table) -> pa.Table:
        # dict-encode the strata column: the rates lookup runs over the few
        # UNIQUE strata, then a vectorized gather maps it back to rows
        ids = batch[id_col].to_numpy()
        enc = batch[strata_col].combine_chunks().dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        mods_uniq = np.array(
            [rates.get(s, default_modulus) for s in uniq] + [default_modulus],
            np.int64,
        )
        idx = (
            enc.indices.fill_null(len(uniq))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        mods = mods_uniq[idx]
        return batch.filter(pa.array(ids % mods == 0))

    return ds.map_batches(fil, batch_format="pyarrow")


def exact_quantiles(
    ds: "ray.data.Dataset",
    col: str,
    qs: list[float],
    bins: int = 4096,
    max_pull: int = 1_000_000,
) -> list[tuple[float, float]]:
    """EXACT disc quantiles (smallest x with ≥ ⌈q·n⌉ values ≤ x) of a
    numeric column in two streaming passes + one bounded filtered pull:

      pass 1  per-batch (min, max, count) partials → driver combine
      pass 2  per-batch fixed-grid histogram partials (one bins-long int row
              per batch) → driver sum → locate each target rank's bin
      pull    filter only the located bins' rows (≤ ``max_pull`` asserted),
              exact selection driver-side.

    This is the classic distributed-quantile shape: the full column never
    reaches the driver — only histograms and the target bins."""
    import math

    def _valid(b: pa.Table) -> np.ndarray:
        # NULLs and NaNs are ignored, matching DuckDB quantile_disc
        v = b[col].drop_null().to_numpy(zero_copy_only=False)
        if v.dtype.kind == "f":
            v = v[~np.isnan(v)]
        return v

    def mm_partial(b: pa.Table) -> pa.Table:
        v = _valid(b)
        if len(v) == 0:
            return pa.table({"mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"mn": [float(v.min())], "mx": [float(v.max())],
                         "n": [int(len(v))]})

    rows = ds.map_batches(mm_partial, batch_format="pyarrow").take_all()
    if not rows:
        return [(q, float("nan")) for q in qs]
    mn = min(r["mn"] for r in rows)
    mx = max(r["mx"] for r in rows)
    n = sum(r["n"] for r in rows)
    width = (mx - mn) / bins or 1.0

    def hist_partial(b: pa.Table) -> pa.Table:
        v = _valid(b)
        idx = np.clip(((v - mn) / width).astype(np.int64), 0, bins - 1)
        h = np.zeros(bins, np.int64)
        np.add.at(h, idx, 1)
        return pa.table({"hist": pa.array([h.tobytes()], pa.binary())})

    hrows = ds.map_batches(hist_partial, batch_format="pyarrow").take_all()
    hist = np.zeros(bins, np.int64)
    for r in hrows:
        hist += np.frombuffer(r["hist"], np.int64)
    cum = np.cumsum(hist)

    targets = {q: max(1, math.ceil(q * n)) for q in qs}
    need_bins = sorted({int(np.searchsorted(cum, k)) for k in targets.values()})
    total_pull = int(hist[need_bins].sum())
    if total_pull > max_pull:  # pragma: no cover - pathological skew
        raise ValueError(
            f"quantile bins hold {total_pull} rows > max_pull; raise bins"
        )
    need_set = np.array(need_bins, np.int64)

    def pull(b: pa.Table) -> pa.Table:
        v = _valid(b)
        idx = np.clip(((v - mn) / width).astype(np.int64), 0, bins - 1)
        m = np.isin(idx, need_set)
        return pa.table({"bin": pa.array(idx[m]), col: pa.array(v[m])})

    pulled: dict[int, np.ndarray] = {bi: np.empty(0, np.float64) for bi in need_bins}
    chunks: dict[int, list] = {bi: [] for bi in need_bins}
    for r in ds.map_batches(pull, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        bv = r["bin"].to_numpy()
        vv = r[col].to_numpy(zero_copy_only=False)
        for bi in need_bins:
            chunks[bi].append(vv[bv == bi])
    for bi in need_bins:
        pulled[bi] = np.sort(np.concatenate(chunks[bi] or [np.empty(0, np.float64)]))

    out = []
    for q in qs:
        k = targets[q]
        bi = int(np.searchsorted(cum, k))
        before = int(cum[bi - 1]) if bi > 0 else 0
        out.append((q, float(pulled[bi][k - before - 1])))
    return out
