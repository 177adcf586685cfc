"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash,
embedding-cosine.

The reference has NO dedup (titles repeat silently — SURVEY.md §2.7 D4);
these are the operators a 100 TB training-data pipeline needs.  Shuffle
discipline:

- exact: content-hash per batch (vectorized md5) → hash-partitioned
  ``groupby(fingerprint)`` → keep min doc_id per group.  One shuffle whose
  key is uniformly distributed by construction.
- n-gram Jaccard: term-join pattern — explode distinct (doc, term),
  ``groupby(term)`` emits in-group pairs, ``groupby(pair).sum`` counts the
  intersection; union sizes come from broadcast per-doc distinct counts.
  Scales as Σ_term df², so it is applied AFTER candidate pruning (or on a
  bounded subset); MinHash-LSH is the scale path.
- MinHash-LSH: per-batch shingle→signature (vectorized), explode to
  (band, band_hash) bucket rows, ``groupby(bucket)`` emits candidate pairs,
  signature-agreement estimates Jaccard, union-find over surviving pairs
  labels groups.  Union-find runs driver-side over the candidate PAIRS only
  — |pairs| ≪ |docs| after banding; at larger scale the same pairs feed an
  iterative min-label-propagation groupby (documented partitioning
  assumption).
- SimHash: 64-bit weighted sign-sum per doc; 4×16-bit band blocking →
  exact-match buckets → Hamming-verify candidates (≤ ``max_hamming``).
- embedding near-dup: the small side (query/centroid matrix) is broadcast
  via ``ray.put`` once; each batch does one BLAS matmul.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from wikirec_ray.functions.hashing import (
    band_keys,
    minhash_params,
    minhash_signature,
    shingle_hashes,
    simhash64,
    token_hashes,
)
from wikirec_ray.stages.analyze import _flat_tokens

def _aggregate_pairs(
    pairs: ray.data.Dataset, val_col: str, agg: str, n_parts: int = 64,
    coalesce: int = 32,
) -> ray.data.Dataset:
    """Combine duplicate (id_a, id_b) rows with max/min/sum of ``val_col``.

    A direct ``groupby(["id_a","id_b"])`` sorts on a high-cardinality
    composite key and pays per-block overhead across the many tiny blocks
    ``map_groups`` emits (measured ~15 s for 1.8M pair rows).  Instead:
    coalesce blocks, hash the pair to one small int partition key, and run
    the exact aggregate vectorized (Arrow group_by) inside each partition —
    same result, one cheap single-key shuffle (~1-2 s on the same input)."""

    def add_ppart(b: pa.Table) -> pa.Table:
        pp = (
            (b["id_a"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            ^ b["id_b"].to_numpy().astype(np.uint64)
        ) % np.uint64(n_parts)
        return b.append_column("ppart", pa.array(pp.astype(np.int32)))

    def dedup_part(g: pa.Table) -> pa.Table:
        t = g.group_by(["id_a", "id_b"]).aggregate([(val_col, agg)])
        return t.rename_columns(["id_a", "id_b", val_col])

    return (
        pairs.repartition(coalesce)
        .map_batches(add_ppart, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(dedup_part, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds: ray.data.Dataset, id_col="doc_id", text_col="text") -> ray.data.Dataset:
    """One survivor (min id) per identical text. Returns (fingerprint,
    keep_id, n_dups)."""
    from wikirec_ray.pipelines.textstats import _fingerprint_batch

    fps = ds.map_batches(
        lambda b: _fingerprint_batch(b, id_col, text_col), batch_format="pyarrow"
    )
    from ray.data.aggregate import Count, Min

    return fps.groupby("fingerprint").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups")
    )


# ---------------------------------------------------------------------------
# n-gram (token-set) Jaccard via term join
# ---------------------------------------------------------------------------


def _distinct_doc_terms(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    parents, flat = _flat_tokens(batch[text_col].combine_chunks())
    pairs = pa.table({"_row": parents, "term": flat}).group_by(["_row", "term"]).aggregate([])
    return pa.table({id_col: batch[id_col].take(pairs["_row"]), "term": pairs["term"]})


def jaccard_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.0,
) -> ray.data.Dataset:
    """All-pairs token-set Jaccard via the sparse term join.  Emits
    (id_a, id_b, jaccard) with id_a < id_b and jaccard >= min_jaccard.

    Cost is Σ_term df² pair rows — bound the input (candidate subset) before
    calling; the LSH path prunes candidates at scale.
    """
    doc_terms = ds.map_batches(
        lambda b: _distinct_doc_terms(b, id_col, text_col), batch_format="pyarrow"
    )
    # broadcast per-doc distinct-term counts (small side: one int per doc)
    from ray.data.aggregate import Count

    sizes_rows = doc_terms.groupby(id_col).aggregate(Count(alias_name="n_terms")).take_all()
    sizes = {int(r[id_col]): int(r["n_terms"]) for r in sizes_rows}
    sizes_ref = ray.put(sizes)

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = np.sort(group[id_col].to_numpy())
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()), "pair_count": pa.array([], pa.int64())})
        a_idx, b_idx = np.triu_indices(len(ids), k=1)
        return pa.table(
            {
                "id_a": pa.array(ids[a_idx]),
                "id_b": pa.array(ids[b_idx]),
                "pair_count": pa.array(np.ones(len(a_idx), np.int64)),
            }
        )

    pair_counts = _aggregate_pairs(
        doc_terms.groupby("term").map_groups(emit_pairs, batch_format="pyarrow"),
        "pair_count",
        "sum",
    )

    def add_jaccard(batch: pa.Table) -> pa.Table:
        s = ray.get(sizes_ref)
        a = batch["id_a"].to_numpy()
        b = batch["id_b"].to_numpy()
        inter = batch["pair_count"].to_numpy().astype(np.float64)
        na = np.fromiter((s[int(x)] for x in a), np.float64, count=len(a))
        nb = np.fromiter((s[int(x)] for x in b), np.float64, count=len(b))
        jac = np.round(inter / (na + nb - inter), 6)
        out = pa.table(
            {"id_a": batch["id_a"], "id_b": batch["id_b"], "jaccard": pa.array(jac)}
        )
        if min_jaccard > 0:
            import pyarrow.compute as pc

            out = out.filter(pc.greater_equal(out["jaccard"], min_jaccard))
        return out

    return pair_counts.map_batches(add_jaccard, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHasher:
    """Actor-pool stage: doc -> MinHash signature + LSH band bucket rows.

    Permutation parameters are generated once per actor from a fixed seed
    (deterministic across the pool)."""

    def __init__(self, n_perm=128, n_bands=16, shingle_k=3, id_col="doc_id", text_col="text"):
        self.a, self.b = minhash_params(n_perm)
        self.n_bands = n_bands
        self.k = shingle_k
        self.id_col = id_col
        self.text_col = text_col
        self._cache: dict[str, int] = {}

    def signature(self, tokens: list[str]) -> np.ndarray:
        sh = shingle_hashes(token_hashes(tokens, self._cache), self.k)
        return minhash_signature(sh, self.a, self.b)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parents, flat = _flat_tokens(batch[self.text_col].combine_chunks())
        par = parents.to_numpy(zero_copy_only=False)
        toks = flat.to_pylist()
        ids_out, bands_out, keys_out, sigs_out = [], [], [], []
        bounds = np.searchsorted(par, np.arange(batch.num_rows + 1))
        ids = batch[self.id_col].to_pylist()
        for row in range(batch.num_rows):
            sig = self.signature(toks[bounds[row] : bounds[row + 1]])
            sig_bytes = sig.tobytes()
            for band, key in enumerate(band_keys(sig, self.n_bands)):
                ids_out.append(ids[row])
                bands_out.append(band)
                keys_out.append(key)
                sigs_out.append(sig_bytes)
        return pa.table(
            {
                self.id_col: pa.array(ids_out, pa.int64()),
                "band": pa.array(bands_out, pa.int32()),
                "bucket": pa.array(keys_out, pa.uint64()),
                "sig": pa.array(sigs_out, pa.binary()),
            }
        )


def minhash_candidates(
    ds: ray.data.Dataset,
    n_perm=128,
    n_bands=16,
    shingle_k=3,
    id_col="doc_id",
    text_col="text",
    concurrency: int | tuple = 2,
) -> ray.data.Dataset:
    """(id_a, id_b, est_jaccard) for pairs sharing >=1 LSH bucket; Jaccard
    estimated as signature agreement (unbiased MinHash estimator)."""
    bucket_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            n_perm=n_perm, n_bands=n_bands, shingle_k=shingle_k,
            id_col=id_col, text_col=text_col,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    # Shuffle groups are (band, bucket % B) PARTITIONS of buckets, not single
    # buckets: LSH produces millions of tiny buckets and per-group dispatch
    # overhead would dominate (measured ~0.25 ms × groups); one group holds
    # ~|docs|/B rows and the per-bucket pair generation runs vectorized
    # inside it.  B also salts any pathological giant bucket partition.
    n_bucket_parts = 64
    max_bucket = 4096  # cap pathological buckets (cost is O(g²)); logged

    def add_bpart(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bpart",
            pa.array((batch["bucket"].to_numpy() % n_bucket_parts).astype(np.int32)),
        )

    def emit(group: pa.Table) -> pa.Table:
        ids_all = group[id_col].to_numpy()
        buckets = group["bucket"].to_numpy()
        mat_all = np.frombuffer(b"".join(group["sig"].to_pylist()), np.uint64).reshape(
            len(ids_all), -1
        )
        order = np.lexsort((ids_all, buckets))
        ids_all, buckets, mat_all = ids_all[order], buckets[order], mat_all[order]
        bounds = np.concatenate(
            [[0], np.flatnonzero(np.diff(buckets)) + 1, [len(buckets)]]
        )
        out_a, out_b, out_j = [], [], []
        for gi in range(len(bounds) - 1):
            s, e = int(bounds[gi]), int(bounds[gi + 1])
            g = e - s
            if g < 2:
                continue
            if g > max_bucket:
                import logging

                logging.getLogger(__name__).warning(
                    "LSH bucket of %d docs capped to %d (pairs dropped)", g, max_bucket
                )
                e = s + max_bucket
                g = max_bucket
            iu, ju = np.triu_indices(g, k=1)
            eq = (mat_all[s + iu] == mat_all[s + ju]).mean(axis=1)
            out_a.append(ids_all[s + iu])
            out_b.append(ids_all[s + ju])
            out_j.append(np.round(eq, 6))
        if not out_a:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "est_jaccard": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
                "id_b": pa.array(np.concatenate(out_b).astype(np.int64)),
                "est_jaccard": pa.array(np.concatenate(out_j)),
            }
        )

    raw = (
        bucket_rows.map_batches(add_bpart, batch_format="pyarrow")
        .groupby(["band", "bpart"])
        .map_groups(emit, batch_format="pyarrow")
    )
    return _aggregate_pairs(raw, "est_jaccard", "max")


def minhash_dedup_groups(
    ds: ray.data.Dataset, threshold=0.8, id_col="doc_id", text_col="text", **kw
) -> ray.data.Dataset:
    """(doc_id, group_id) near-dup group labels; group_id = min doc_id of the
    connected component over candidate pairs with est_jaccard >= threshold.

    Union-find runs on the driver over candidate PAIRS only (post-LSH the
    pair set is tiny relative to the corpus); a label-propagation groupby
    loop replaces it when pairs no longer fit the driver."""
    import pyarrow.compute as pc

    cands = minhash_candidates(ds, id_col=id_col, text_col=text_col, **kw)
    pairs = cands.map_batches(
        lambda b: b.filter(pc.greater_equal(b["est_jaccard"], threshold)),
        batch_format="pyarrow",
    ).take_all()
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(int(r["id_a"])), find(int(r["id_b"]))
        if a != b:
            lo, hi = min(a, b), max(a, b)
            parent[hi] = lo

    def label(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        grp = np.fromiter((find(int(d)) for d in ids), np.int64, count=len(ids))
        return pa.table({id_col: batch[id_col], "group_id": pa.array(grp)})

    return ds.select_columns([id_col]).map_batches(label, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """Actor-pool stage: doc -> 64-bit SimHash + 4×16-bit band keys."""

    def __init__(self, id_col="doc_id", text_col="text"):
        self.id_col = id_col
        self.text_col = text_col
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        parents, flat = _flat_tokens(batch[self.text_col].combine_chunks())
        par = parents.to_numpy(zero_copy_only=False)
        toks = flat.to_pylist()
        bounds = np.searchsorted(par, np.arange(batch.num_rows + 1))
        out = []
        for row in range(batch.num_rows):
            sub = toks[bounds[row] : bounds[row + 1]]
            hs = token_hashes(sub, self._cache)
            uniq, counts = np.unique(hs, return_counts=True)
            out.append(simhash64(uniq, counts))
        sh = np.array(out, dtype=np.uint64)
        t = {self.id_col: batch[self.id_col], "simhash": pa.array(sh)}
        for band in range(4):
            t[f"band{band}"] = pa.array(
                ((sh >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(np.uint32)
            )
        return pa.table(t)


def simhash_fingerprints(ds: ray.data.Dataset, id_col="doc_id", text_col="text",
                         concurrency: int | tuple = 2) -> ray.data.Dataset:
    return ds.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def simhash_candidates(
    ds: ray.data.Dataset, max_hamming=3, id_col="doc_id", text_col="text"
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: docs sharing any 16-bit band bucket are
    candidates (any pair within Hamming distance 3 must agree on ≥1 of 4
    bands — pigeonhole); verified by exact Hamming distance.

    One shuffle: every doc emits 4 (band, bucket) rows into a single
    ``groupby(["band","bucket"])`` (same shape as the MinHash-LSH path —
    a union of 4 per-band shuffles would run 5 all-to-all ops in one DAG)."""
    fps = simhash_fingerprints(ds, id_col=id_col, text_col=text_col)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        sh = batch["simhash"].to_numpy()
        n = len(ids)
        bands = np.repeat(np.arange(4, dtype=np.int32), n)
        rep_ids = np.tile(ids, 4)
        rep_sh = np.tile(sh, 4)
        buckets = (rep_sh >> (bands.astype(np.uint64) * np.uint64(16))) & np.uint64(0xFFFF)
        return pa.table(
            {
                id_col: pa.array(rep_ids),
                "simhash": pa.array(rep_sh),
                "band": pa.array(bands),
                "bucket": pa.array(buckets.astype(np.uint32)),
            }
        )

    def emit(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy()
        sh = group["simhash"].to_numpy()
        order = np.argsort(ids)
        ids, sh = ids[order], sh[order]
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                h = bin(int(sh[i]) ^ int(sh[j])).count("1")
                if h <= max_hamming:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_h.append(h)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "hamming": pa.array(out_h, pa.int64()),
            }
        )

    pairs = (
        fps.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "bucket"])
        .map_groups(emit, batch_format="pyarrow")
    )
    out = _aggregate_pairs(pairs, "hamming", "min")
    return out.map_batches(
        lambda b: b.set_column(
            b.column_names.index("hamming"),
            "hamming", b["hamming"].cast(pa.int64()),
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(
    ds: ray.data.Dataset, threshold=0.95, id_col="vec_id", vec_col="embedding"
) -> ray.data.Dataset:
    """(id_a, id_b, cos_sim) for pairs with cosine >= threshold, id_a < id_b.

    The full (row-normalized) matrix is broadcast once via ``ray.put``; each
    batch performs one matmul against it.  O(N²/B) flops per batch — the
    brute-force baseline; IVF/LSH bucketing (pipelines/ann.py) is the scale
    path that replaces the broadcast with per-bucket joins."""
    rows = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in rows], np.int64)
    mat = np.stack([np.asarray(r[vec_col], np.float64) for r in rows])
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def fn(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bids = batch[id_col].to_numpy()
        bv = np.stack(
            [np.asarray(v, np.float64) for v in batch[vec_col].to_pylist()]
        )
        bv /= np.maximum(np.linalg.norm(bv, axis=1, keepdims=True), 1e-12)
        sims = bv @ all_mat.T
        out_a, out_b, out_s = [], [], []
        for i in range(len(bids)):
            hit = np.flatnonzero(sims[i] >= threshold)
            for j in hit:
                if all_ids[j] > bids[i]:  # emit each pair once, a < b
                    out_a.append(int(bids[i]))
                    out_b.append(int(all_ids[j]))
                    out_s.append(round(float(sims[i, j]), 6))
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
