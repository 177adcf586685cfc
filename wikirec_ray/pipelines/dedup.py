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
- MinHash-LSH: whole-batch vectorized shingle→signature→band keys (one
  reduceat pass per permutation), explode to (band, band_hash) bucket rows,
  ``groupby(bucket)`` emits candidate pairs, signature-agreement estimates
  Jaccard, and group labels come from DISTRIBUTED iterative min-label
  propagation (``connected_components``) — pairs never land on the driver.
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
    token_hashes_arrow,
)
from wikirec_ray.functions.partitions import partitioned_map_groups
from wikirec_ray.stages.analyze import _flat_tokens


def _pair_key(b: pa.Table) -> np.ndarray:
    return (
        (b["id_a"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        ^ b["id_b"].to_numpy().astype(np.uint64)
    )


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

    def dedup_part(g: pa.Table) -> pa.Table:
        t = g.group_by(["id_a", "id_b"]).aggregate([(val_col, agg)])
        return t.rename_columns(["id_a", "id_b", val_col])

    return partitioned_map_groups(
        pairs.repartition(coalesce), _pair_key, dedup_part, n_parts
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
    # per-doc distinct-term counts stay a DATASET (O(N) rows) and are joined
    # onto the pair stream by hash partition — no O(N) driver dict
    from ray.data.aggregate import Count

    sizes = doc_terms.groupby(id_col).aggregate(Count(alias_name="n_terms")).materialize()

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

    # Attach |A| then |B| with two hash-partitioned passes: each pass unions
    # the pair rows (keyed on one endpoint) with the size rows and resolves
    # the lookup vectorized inside the partition (sort + searchsorted).
    def _attach(pairs_ds, pair_cols, key_field, out_field, n_parts=64):
        def tag_pairs(b: pa.Table) -> pa.Table:
            cols = {
                "key": b[key_field],
                "is_size": pa.array(np.zeros(b.num_rows, np.int8)),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
            }
            cols.update({c: b[c] for c in pair_cols})
            return pa.table(cols)

        def tag_sizes(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            cols = {
                "key": pc.cast(b[id_col], pa.int64()),
                "is_size": pa.array(np.ones(b.num_rows, np.int8)),
                "n": pc.cast(b["n_terms"], pa.int64()),
            }
            cols.update(
                {c: pa.array(np.zeros(b.num_rows, np.int64)) for c in pair_cols}
            )
            return pa.table(cols)

        def resolve(g: pa.Table) -> pa.Table:
            is_size = g["is_size"].to_numpy().astype(bool)
            keys = g["key"].to_numpy()
            ns = g["n"].to_numpy()
            sk, sn = keys[is_size], ns[is_size]
            order = np.argsort(sk)
            sk, sn = sk[order], sn[order]
            rows = g.filter(pa.array(~is_size)).select(pair_cols)
            looked = sn[np.searchsorted(sk, rows[key_field].to_numpy())]
            return rows.append_column(out_field, pa.array(looked.astype(np.int64)))

        return partitioned_map_groups(
            pairs_ds.map_batches(tag_pairs, batch_format="pyarrow")
            .union(sizes.map_batches(tag_sizes, batch_format="pyarrow")),
            lambda b: b["key"].to_numpy(),
            resolve,
            n_parts,
        )

    with_na = _attach(pair_counts, ["id_a", "id_b", "pair_count"], "id_a", "n_a")
    with_nb = _attach(
        with_na, ["id_a", "id_b", "pair_count", "n_a"], "id_b", "n_b"
    )

    def add_jaccard(batch: pa.Table) -> pa.Table:
        inter = batch["pair_count"].to_numpy().astype(np.float64)
        na = batch["n_a"].to_numpy().astype(np.float64)
        nb = batch["n_b"].to_numpy().astype(np.float64)
        jac = np.round(inter / (na + nb - inter), 6)
        out = pa.table(
            {"id_a": batch["id_a"], "id_b": batch["id_b"], "jaccard": pa.array(jac)}
        )
        if min_jaccard > 0:
            import pyarrow.compute as pc

            out = out.filter(pc.greater_equal(out["jaccard"], min_jaccard))
        return out

    return with_nb.map_batches(add_jaccard, batch_format="pyarrow")


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

    def signature(self, tokens: list[str]) -> np.ndarray:
        sh = shingle_hashes(token_hashes(tokens), self.k)
        return minhash_signature(sh, self.a, self.b)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Whole-batch vectorized: shingles, signatures, and band keys are
        each ONE pass over the batch's flat token stream (reduceat at doc
        boundaries) instead of a per-doc Python loop — measured ~3× on the
        bench dedup stage.  ``signature`` above remains the per-doc oracle
        the equivalence test compares against."""
        from wikirec_ray.functions.hashing import (
            band_keys_matrix,
            minhash_signatures_flat,
            shingle_hashes_flat,
        )

        parents, flat = _flat_tokens(batch[self.text_col].combine_chunks())
        par = parents.to_numpy(zero_copy_only=False)
        th = token_hashes_arrow(flat)
        doc_bounds = np.searchsorted(par, np.arange(batch.num_rows + 1))
        sh_flat, sh_starts = shingle_hashes_flat(th, doc_bounds, self.k)
        sigs = minhash_signatures_flat(sh_flat, sh_starts, self.a, self.b)
        bands = band_keys_matrix(sigs, self.n_bands)
        ids = batch[self.id_col].to_numpy()
        n_docs, n_bands = bands.shape
        # Rows are BAND-MAJOR so the signature column is 16 chunks sharing
        # ONE buffer (each band segment lists every doc once, in order) —
        # no 16× expansion copy in the actor.  Signatures are carried as
        # 32-bit truncated mins: AGREEMENT of mins is what estimates
        # Jaccard, and a truncation collision is 2^-32 per permutation.
        sig32 = np.ascontiguousarray((sigs & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        cell = sigs.shape[1] * 4
        offs = (np.arange(n_docs + 1, dtype=np.int64) * cell).astype(np.int32)
        chunk = pa.Array.from_buffers(
            pa.binary(), n_docs,
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(sig32.tobytes())],
        )
        return pa.table(
            {
                self.id_col: pa.chunked_array(
                    [pa.array(ids.astype(np.int64))] * n_bands
                ),
                "band": pa.array(
                    np.repeat(np.arange(n_bands, dtype=np.int32), n_docs)
                ),
                "bucket": pa.array(np.ascontiguousarray(bands.T).reshape(-1)),
                "sig": pa.chunked_array([chunk] * n_bands),
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
        mat_all = np.frombuffer(b"".join(group["sig"].to_pylist()), np.uint32).reshape(
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


def _key_label_min(rows: ray.data.Dataset, n_parts: int = 64) -> ray.data.Dataset:
    """(key, label) rows -> one (key, min(label)) row per key.

    Hash-partitioned like ``_aggregate_pairs``: one cheap single-int-key
    shuffle, exact min computed vectorized (Arrow group_by) inside each
    partition — avoids per-key ``map_groups`` dispatch over millions of
    tiny groups."""

    def min_part(g: pa.Table) -> pa.Table:
        t = g.select(["key", "label"]).group_by("key").aggregate([("label", "min")])
        return t.rename_columns(["key", "label"])

    return partitioned_map_groups(
        rows, lambda b: b["key"].to_numpy(), min_part, n_parts
    )


# The shard class lives in the LEAF module ``functions/components.py``
# (numpy + pyarrow imports only): a fresh actor process pays the import
# graph of its class's defining module on the first method call, and
# defining it here made every shard cold-import ``ray.data`` (~2-4 s per
# process — the dominant cost of small component runs).  ``ray.remote`` is
# applied here, driver-side, so the worker deserializes the class by
# reference to the light module.
from wikirec_ray.functions.components import ComponentShard as _ComponentShardImpl

_ComponentShard = ray.remote(_ComponentShardImpl)

# Auto-sharding target for connected_components: one shard per this many
# edges (ceil), capped by cluster CPUs.  Below this, per-iteration numpy is
# microseconds and the P² message fan-out + actor bootstrap dominate.
_EDGES_PER_SHARD = 1 << 18


def connected_components(
    pairs: ray.data.Dataset,
    max_iters: int = 200,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """(node, label) connected components over an (id_a, id_b) edge Dataset;
    label = min node id of the component.  Fully distributed — the driver
    never sees an edge:

    - ONE routing pass pushes each symmetric edge from the reading task
      straight to its owner shard actor (``key % n_parts``) — no shuffle
      and no driver hop for the edge data.
    - Iterations then run entirely between the partition-pinned actors:
      each shard emits (dst, label[src]) messages bucketed per owner
      (``num_returns`` routing — a shard fetches only its bucket), applies
      incoming minima vectorized, and reports its label-sum decrease; the
      loop stops when the global decrease is zero.  Per-iteration cost is
      O(edges) numpy work + P² tiny object transfers — milliseconds, where
      the previous Dataset-loop formulation paid seconds of shuffle
      scheduling per round (measured 90 s → ~2 s on a 20k-doc near-dup
      corpus with long drift chains).

    This is the documented raw-actor escape hatch: iterative algorithms
    with shared mutable per-partition state are the one shape the Dataset
    API cannot express without re-shuffling every round.  Labels return as
    a Dataset assembled from the shards' Arrow tables.

    The automatic shard count scales with the EDGE COUNT, not the CPU
    count: P² messaging + per-actor bootstrap dominate below ~250k edges
    per shard, so a small candidate set (the common case after LSH
    filtering) runs on one or two shards while a billion-edge graph still
    fans out to the CPU-bounded maximum.  Sizing needs the edge count, so
    the auto path materializes ``pairs`` (edges are the SMALL derivative
    of a corpus; the blocks stay in the object store / spill — the driver
    still never sees one).  Pass ``n_parts`` explicitly to skip that
    materialization and pin the layout (e.g. on a multi-node cluster)."""
    if n_parts is None:
        pairs = pairs.materialize()
        n_edges = pairs.count()
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        cpu_cap = max(8, min(64, ncpu))
        n_parts = int(min(cpu_cap, max(1, -(-n_edges // _EDGES_PER_SHARD))))
    P = n_parts
    shards = [_ComponentShard.remote(p, P) for p in range(P)]

    def symmetric_route(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy().astype(np.int64)
        c = b["id_b"].to_numpy().astype(np.int64)
        t = pa.table(
            {
                "key": pa.array(np.concatenate([a, c])),
                "val": pa.array(np.concatenate([c, a])),
            }
        )
        pid = t["key"].to_numpy() % P
        pending = []
        for p in np.unique(pid):
            pending.append(shards[int(p)].add_edges.remote(t.filter(pa.array(pid == p))))
        ray.get(pending)  # backpressure: count 1 row only once delivered
        return pa.table({"n": pa.array([b.num_rows], pa.int64())})

    try:
        # NOTE on retries: if Ray re-executes a routing task after a failure,
        # a shard may receive duplicate edges — harmless, because min-label
        # propagation is idempotent over duplicate edges/messages and
        # ``finalize`` dedups nodes.  Shard STATE itself is not
        # lineage-reconstructable (raw actors); a lost shard fails the call
        # and the caller re-runs it.
        pairs.map_batches(symmetric_route, batch_format="pyarrow").count()
        n_nodes = sum(ray.get([s.finalize.remote() for s in shards]))
        if n_nodes == 0:
            return ray.data.from_arrow(
                pa.table(
                    {"key": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
                )
            )

        converged = False
        for _ in range(max_iters):
            if P > 1:
                outboxes = [s.emit.options(num_returns=P).remote() for s in shards]
                deltas = ray.get(
                    [
                        shards[j].apply.remote(*[outboxes[i][j] for i in range(P)])
                        for j in range(P)
                    ]
                )
            else:
                outbox = shards[0].emit.remote()
                deltas = ray.get([shards[0].apply.remote(outbox)])
            if sum(deltas) == 0:
                converged = True
                break
        if not converged:
            # propagation moves the min one hop per round; a component with
            # diameter > max_iters would still carry non-minimal labels —
            # never degrade silently
            import logging

            logging.getLogger(__name__).warning(
                "connected_components did not converge within %d iterations — "
                "labels of long-chain components may be non-minimal; raise "
                "max_iters", max_iters,
            )
        tables = ray.get([s.table.remote() for s in shards])
    finally:
        for s in shards:
            ray.kill(s)
    return ray.data.from_arrow([t for t in tables if t.num_rows] or [tables[0]])


def minhash_dedup_groups(
    ds: ray.data.Dataset, threshold=0.8, id_col="doc_id", text_col="text",
    max_iters: int = 200, **kw,
) -> ray.data.Dataset:
    """(doc_id, group_id) near-dup group labels; group_id = min doc_id of the
    connected component over candidate pairs with est_jaccard >= threshold.

    Components come from distributed min-label propagation
    (``connected_components``) — candidate pairs are never materialized on
    the driver (post-LSH pair sets on a near-dup-dense crawl are billions of
    rows at the 100 TB design point).  The final labeling is one more
    hash-partitioned min: docs without any near-dup partner keep their own
    id as ``group_id``."""
    import pyarrow.compute as pc

    cands = minhash_candidates(ds, id_col=id_col, text_col=text_col, **kw)
    pairs = cands.map_batches(
        lambda b: b.filter(pc.greater_equal(b["est_jaccard"], threshold)),
        batch_format="pyarrow",
    )
    labels = connected_components(pairs, max_iters=max_iters)

    def self_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        return pa.table({"key": pa.array(ids), "label": pa.array(ids)})

    combined = _key_label_min(
        ds.select_columns([id_col]).map_batches(self_rows, batch_format="pyarrow")
        .union(labels)
    )
    return combined.map_batches(
        lambda b: pa.table({id_col: b["key"], "group_id": b["label"]}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """Actor-pool stage: doc -> 64-bit SimHash + 4×16-bit band keys."""

    def __init__(self, id_col="doc_id", text_col="text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from wikirec_ray.functions.hashing import simhash64_flat

        parents, flat = _flat_tokens(batch[self.text_col].combine_chunks())
        par = parents.to_numpy(zero_copy_only=False)
        th = token_hashes_arrow(flat)
        bounds = np.searchsorted(par, np.arange(batch.num_rows + 1))
        sh = simhash64_flat(th, bounds)
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
    ds: ray.data.Dataset, max_hamming=3, id_col="doc_id", text_col="text",
    max_bucket: int = 4096,
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: docs sharing any 16-bit band bucket are
    candidates (any pair within Hamming distance 3 must agree on ≥1 of 4
    bands — pigeonhole); verified by exact Hamming distance.

    Shuffle shape mirrors the MinHash-LSH path: groups are (band,
    bucket % B) PARTITIONS, not single buckets (per-bucket dispatch over
    2^16 tiny groups would dominate), and pair emission is vectorized —
    ``np.triu_indices`` + one XOR/popcount pass per bucket; pathological
    buckets are capped at ``max_bucket`` with a warning."""
    fps = simhash_fingerprints(ds, id_col=id_col, text_col=text_col)
    n_bucket_parts = 64

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
                "bpart": pa.array((buckets % np.uint64(n_bucket_parts)).astype(np.int32)),
            }
        )

    def emit(group: pa.Table) -> pa.Table:
        from wikirec_ray.functions.hashing import popcount64

        ids = group[id_col].to_numpy()
        sh = group["simhash"].to_numpy()
        buckets = group["bucket"].to_numpy()
        order = np.lexsort((ids, buckets))
        ids, sh, buckets = ids[order], sh[order], buckets[order]
        bounds = np.concatenate(
            [[0], np.flatnonzero(np.diff(buckets)) + 1, [len(buckets)]]
        )
        out_a, out_b, out_h = [], [], []
        for gi in range(len(bounds) - 1):
            s, e = int(bounds[gi]), int(bounds[gi + 1])
            g = e - s
            if g < 2:
                continue
            if g > max_bucket:
                import logging

                logging.getLogger(__name__).warning(
                    "SimHash bucket of %d docs capped to %d (pairs dropped)",
                    g, max_bucket,
                )
                e = s + max_bucket
                g = max_bucket
            iu, ju = np.triu_indices(g, k=1)
            h = popcount64(sh[s + iu] ^ sh[s + ju])
            keep = (h <= max_hamming) & (ids[s + iu] != ids[s + ju])
            out_a.append(ids[s + iu][keep])
            out_b.append(ids[s + ju][keep])
            out_h.append(h[keep])
        if not out_a:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
                "id_b": pa.array(np.concatenate(out_b).astype(np.int64)),
                "hamming": pa.array(np.concatenate(out_h).astype(np.int64)),
            }
        )

    pairs = (
        fps.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "bpart"])
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
    ds: ray.data.Dataset, threshold=0.95, id_col="vec_id", vec_col="embedding",
    max_rows: int = 100_000,
) -> ray.data.Dataset:
    """(id_a, id_b, cos_sim) for pairs with cosine >= threshold, id_a < id_b.

    BRUTE-FORCE BASELINE, deliberately guarded: it materializes every
    vector on the driver (``take_all``) and broadcasts the full row-
    normalized matrix for an O(N²) matmul — correct as an oracle, wrong as
    a pipeline (VERDICT r04).  Inputs above ``max_rows`` raise, naming
    ``embedding_dup_pairs_bucketed`` (LSH-partitioned pairs, no driver
    materialization) as the scale path; raise the cap explicitly only for
    oracle runs that can afford the O(N²)."""
    ds = ds.materialize()  # count + take_all + map: ONE upstream execution
    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"embedding_dup_pairs is the brute-force O(N²) baseline and "
            f"materializes all vectors on the driver; got {n} rows > "
            f"max_rows={max_rows}.  Use embedding_dup_pairs_bucketed (the "
            f"scale path) or pass max_rows explicitly for an oracle run."
        )
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


def embedding_dup_pairs_bucketed(
    ds: ray.data.Dataset,
    threshold=0.95,
    n_bits: int = 4,
    id_col="vec_id",
    vec_col="embedding",
    max_bucket: int = 8192,
    seed: int = 11,
) -> ray.data.Dataset:
    """Bucketed (LSH-partitioned) near-dup pairs — the scale path that
    replaces ``embedding_dup_pairs``'s full-matrix broadcast with a shuffle
    by hyperplane bucket: each vector is assigned to its sign bucket plus
    all 1-bit multiprobe flips, same-bucket groups are scored with one
    g×g matmul, and duplicate pairs across probes collapse via the
    hash-partitioned max-aggregate.  Shuffle volume is (1+n_bits)·N vector
    rows; no driver-side materialization, no O(N·d) broadcast.

    Recall/cost knob: collision probability for angle θ is (1−θ/π)^n_bits
    per bit — raise ``n_bits`` for tight near-dup thresholds (smaller
    buckets, lower recall per probe), lower it for loose thresholds.
    Recall vs the brute-force baseline is asserted in pytest."""
    from wikirec_ray.pipelines.ann import HyperplaneLSH, _batch_matrix, _norm_rows

    n_bucket_parts = 64
    lsh_seed = seed

    def explode(batch: pa.Table) -> pa.Table:
        m = _norm_rows(_batch_matrix(batch, vec_col))
        lsh = HyperplaneLSH(m.shape[1], n_bits=n_bits, seed=lsh_seed)
        buckets = lsh.buckets(m, multiprobe=True)  # (B, 1+n_bits)
        n, probes = buckets.shape
        ids = batch[id_col].to_numpy()
        flat_b = buckets.reshape(-1).astype(np.uint64)
        rep_ids = np.repeat(ids, probes)
        rep_vecs = np.repeat(m, probes, axis=0)
        return pa.table(
            {
                id_col: pa.array(rep_ids.astype(np.int64)),
                "bucket": pa.array(flat_b),
                "bpart": pa.array((flat_b % np.uint64(n_bucket_parts)).astype(np.int32)),
                # float64 end-to-end: a float32 roundtrip here perturbs the
                # g×g matmul at ~1e-7, flipping 6-dp-rounded cos_sim digits vs
                # the float64 SQL oracle (round-3 driver hash mismatch).  The
                # 2× shuffle bytes are trivial at (1+n_bits)·N rows.
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(rep_vecs.reshape(-1).astype(np.float64)), m.shape[1]
                ),
            }
        )

    def emit(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy()
        buckets = group["bucket"].to_numpy()
        vecs = (
            group["vec"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .astype(np.float64).reshape(len(ids), -1)
        )
        order = np.lexsort((ids, buckets))
        ids, buckets, vecs = ids[order], buckets[order], vecs[order]
        bounds = np.concatenate(
            [[0], np.flatnonzero(np.diff(buckets)) + 1, [len(buckets)]]
        )
        out_a, out_b, out_s = [], [], []
        for gi in range(len(bounds) - 1):
            s, e = int(bounds[gi]), int(bounds[gi + 1])
            g = e - s
            if g < 2:
                continue
            if g > max_bucket:
                import logging

                logging.getLogger(__name__).warning(
                    "embedding bucket of %d vecs capped to %d (pairs dropped)",
                    g, max_bucket,
                )
                e = s + max_bucket
                g = max_bucket
            sims = vecs[s:e] @ vecs[s:e].T
            iu, ju = np.triu_indices(g, k=1)
            sv = sims[iu, ju]
            keep = (sv >= threshold) & (ids[s + iu] != ids[s + ju])
            a, b2 = ids[s + iu][keep], ids[s + ju][keep]
            lo, hi = np.minimum(a, b2), np.maximum(a, b2)
            out_a.append(lo)
            out_b.append(hi)
            out_s.append(np.round(sv[keep], 6))
        if not out_a:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "cos_sim": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
                "id_b": pa.array(np.concatenate(out_b).astype(np.int64)),
                "cos_sim": pa.array(np.concatenate(out_s)),
            }
        )

    raw = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bpart")
        .map_groups(emit, batch_format="pyarrow")
    )
    return _aggregate_pairs(raw, "cos_sim", "max")
