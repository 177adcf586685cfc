"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k is the exact baseline: the query matrix is tiny and
broadcast once via ``ray.put``; every corpus batch does one BLAS matmul
against it and emits per-batch partial top-k; a final small sort+limit per
query merges partials.  This is the vector analog of the reference's
``recommend`` (one sim-matrix row scan, ``model.py:340-383``) without ever
materializing the N×N matrix.

The scale path is LSH bucketing (random hyperplanes): corpus and queries
hash to buckets; only same-bucket (± multiprobe) pairs are scored.  Recall
is tested against the brute-force baseline in pytest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _norm_rows(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch[vec_col].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if pa.types.is_fixed_size_list(col.type):  # e.g. encode_corpus output
        dim = col.type.list_size
    else:
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
    return flat.reshape(len(col), dim)


# Metric registry — the engine analog of the reference's metric switch
# (model.py:246-290 builds cosine or euclidean matrices; model.py:372-379
# sorts DESCENDING for cosine and ASCENDING for euclidean).  Each entry:
# (score fn (Q,d)x(B,d)->(Q,B), normalize rows?, higher-is-better?, out col).
def _euclidean_scores(qmat: np.ndarray, m: np.ndarray) -> np.ndarray:
    qq = (qmat * qmat).sum(axis=1)[:, None]
    mm = (m * m).sum(axis=1)[None, :]
    return np.sqrt(np.maximum(qq + mm - 2.0 * (qmat @ m.T), 0.0))


VALID_METRICS = {
    "cosine": (lambda q, m: q @ m.T, True, True, "cos_sim"),
    "euclidean": (_euclidean_scores, False, False, "distance"),
}


def _metric_spec(metric: str):
    metric = metric.lower()
    if metric not in VALID_METRICS:
        # mirrors the reference's invalid-method guard (model.py:249-254)
        raise ValueError(
            "The value for the 'metric' argument is invalid. Please choose one of "
            + ", ".join(sorted(VALID_METRICS))
        )
    return VALID_METRICS[metric]


def brute_force_topk(
    corpus: ray.data.Dataset,
    query_ids: list[int],
    query_vecs: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    metric: str = "cosine",
) -> ray.data.Dataset:
    """(query_id, neighbor_id, <score>): exact top-k per query under the
    chosen metric — cosine descending (score col ``cos_sim``) or euclidean
    ascending (score col ``distance``), the reference's two orderings.

    Per-batch partial top-k (vectorized argpartition) keeps the shuffle input
    at O(n_batches · Q · k) rows, not O(N · Q)."""
    score_fn, normalize, higher_better, score_col = _metric_spec(metric)
    q = np.asarray(query_vecs, np.float64)
    qm = _norm_rows(q) if normalize else q
    qref = ray.put((np.asarray(query_ids, np.int64), qm))
    sign = 1.0 if higher_better else -1.0

    def partial(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(qref)
        ids = batch[id_col].to_numpy()
        m = _batch_matrix(batch, vec_col)
        if normalize:
            m = _norm_rows(m)
        sims = sign * score_fn(qmat, m)  # (Q, B), always higher-is-better
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            row = sims[qi]
            mask = ids != qids[qi] if exclude_self else np.ones(len(ids), bool)
            cand = np.flatnonzero(mask)
            if len(cand) > k:
                kth = -np.partition(-row[cand], k - 1)[k - 1]
                # margin: final ranking is on 6-dp-rounded scores, so keep
                # anything that could still tie at the boundary after rounding
                cand = cand[row[cand] >= kth - 1e-6]
            for j in cand:
                out_q.append(int(qids[qi]))
                out_n.append(int(ids[j]))
                out_s.append(round(float(sign * row[j]), 6))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                score_col: pa.array(out_s, pa.float64()),
            }
        )

    partials = corpus.map_batches(partial, batch_format="pyarrow")

    def final_topk(group: pa.Table) -> pa.Table:
        sims = sign * group[score_col].to_numpy()
        nids = group["neighbor_id"].to_numpy()
        order = sorted(range(len(sims)), key=lambda i: (-sims[i], nids[i]))[:k]
        return pa.table(
            {
                "query_id": group["query_id"].take(order),
                "neighbor_id": group["neighbor_id"].take(order),
                score_col: group[score_col].take(order),
            }
        )

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")


def head_query_vectors(
    ds: ray.data.Dataset,
    n_queries: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[int], np.ndarray]:
    """(ids, matrix) of the first ``n_queries`` vectors by id — the filter
    runs DISTRIBUTED (pc.less inside map_batches) so only the selected rows
    ever reach the driver."""
    import pyarrow.compute as pc

    qrows = ds.map_batches(
        lambda b: b.filter(pc.less(b[id_col], n_queries)), batch_format="pyarrow"
    ).take_all()
    qrows.sort(key=lambda r: r[id_col])
    qids = [int(r[id_col]) for r in qrows]
    qvecs = np.stack([np.asarray(r[vec_col], np.float64) for r in qrows])
    return qids, qvecs


def ann_topk_queries(
    ds: ray.data.Dataset,
    n_queries: int = 8,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> ray.data.Dataset:
    """Self-query convenience: the first ``n_queries`` vectors (by id) query
    the whole corpus; exact brute-force under the chosen metric."""
    qids, qvecs = head_query_vectors(ds, n_queries, id_col, vec_col)
    return brute_force_topk(
        ds, qids, qvecs, k=k, id_col=id_col, vec_col=vec_col, metric=metric
    )


# ---------------------------------------------------------------------------
# IVF variant (scale path #1: coarse quantizer + probed partitions)
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    ds: ray.data.Dataset,
    n_centroids: int = 64,
    sample_ids: int = 2048,
    iters: int = 10,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means coarse quantizer, trained driver-side on a
    deterministic sample (ids < sample_ids — the sample is the broadcast
    small side; at 10^12 vectors the sample is a capped random_sample and
    training stays a driver-side numpy loop over a few MB)."""
    import pyarrow.compute as pc

    rows = ds.map_batches(
        lambda b: b.filter(pc.less(b[id_col], sample_ids)), batch_format="pyarrow"
    ).take_all()
    mat = _norm_rows(
        np.stack([np.asarray(r[vec_col], np.float64) for r in rows])
    )
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(mat))
    centroids = mat[rng.choice(len(mat), size=k, replace=False)]
    for _ in range(iters):
        assign = (mat @ centroids.T).argmax(axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _norm_rows(centroids)
    return centroids


def ivf_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    query_vecs: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Approximate top-k: each corpus vector belongs to its nearest centroid
    (the inverted-file partition); a query scores only vectors in its
    ``nprobe`` closest partitions.  Centroids + query matrix broadcast once;
    per batch one assignment matmul + masked scoring.  Same output schema as
    ``brute_force_topk``; recall tested against it."""
    qm = _norm_rows(np.asarray(query_vecs, np.float64))
    q_probe = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    ref = ray.put((np.asarray(query_ids, np.int64), qm, centroids, q_probe))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qmat, cents, probes = ray.get(ref)
        ids = batch[id_col].to_numpy()
        m = _norm_rows(_batch_matrix(batch, vec_col))
        assign = (m @ cents.T).argmax(axis=1)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            mask = np.isin(assign, probes[qi]) & (ids != qids[qi])
            rows = np.flatnonzero(mask)
            if len(rows) == 0:
                continue
            sims = qmat[qi] @ m[rows].T
            if len(rows) > k:
                kth = -np.partition(-sims, k - 1)[k - 1]
                keep = sims >= kth - 1e-6
                rows, sims = rows[keep], sims[keep]
            for j, s in zip(rows, np.atleast_1d(sims)):
                out_q.append(int(qids[qi]))
                out_n.append(int(ids[j]))
                out_s.append(round(float(s), 6))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final_topk(group: pa.Table) -> pa.Table:
        sims = group["cos_sim"].to_numpy()
        nids = group["neighbor_id"].to_numpy()
        order = sorted(range(len(sims)), key=lambda i: (-sims[i], nids[i]))[:k]
        return group.take(order)

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")


def ivf_assign(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "ivf_part",
) -> ray.data.Dataset:
    """Append each vector's inverted-file partition id (nearest centroid) —
    the INGEST-time assignment ``ivf_topk`` recomputes per batch at query
    time.  Centroids are broadcast once via ``ray.put``."""
    ref = ray.put(np.asarray(centroids, np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(ref)
        m = _norm_rows(_batch_matrix(batch, vec_col))
        part = (m @ cents.T).argmax(axis=1).astype(np.int32)
        return batch.append_column(out_col, pa.array(part))

    return ds.map_batches(assign, batch_format="pyarrow")


def head_centroids(
    ds: ray.data.Dataset,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic non-trained quantizer: the first ``n_centroids``
    vectors by id, row-normalized.  Weaker partition balance than k-means
    but exactly reproducible by the SQL oracle (the ``ivf_ann`` entry uses
    it so the materialized-IVF path gets a real DuckDB check; k-means
    training stays the quality path and is pinned in pytest)."""
    ids, vecs = head_query_vectors(ds, n_centroids, id_col, vec_col)
    return _norm_rows(vecs)


def ivf_build(
    ds: ray.data.Dataset,
    out_dir: str,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    **train_kw,
) -> np.ndarray:
    """Materialize the IVF layout: train the coarse quantizer (or take
    ``centroids`` as given), assign every vector ONCE, and write Parquet
    partitioned by ``ivf_part`` so a query READS only its probed partitions
    (directory-level pruning — the scale behavior ``ivf_topk``'s per-batch
    reassignment only approximates).  Returns the centroids (also persisted
    to ``centroids.npy``).

    The output directory is cleared first: rebuilding into a previously
    used dir would otherwise leave stale uniquely-named parquet files
    inside ``ivf_part=*`` dirs that the query glob would serve as
    duplicate/stale vectors (ADVICE r02).  Clearing REFUSES unless the
    target is absent/empty or carries a prior IVF layout marker
    (``centroids.npy`` / ``ivf_part=*``) — a mistyped path must not
    silently delete an unrelated directory (ADVICE r03)."""
    import os
    import shutil

    if centroids is None:
        centroids = train_ivf_centroids(
            ds, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col, **train_kw
        )
    if os.path.isdir(out_dir):
        entries = os.listdir(out_dir)
        is_ivf = "centroids.npy" in entries or any(
            e.startswith("ivf_part=") for e in entries
        )
        if entries and not is_ivf:
            raise ValueError(
                f"refusing to clear {out_dir!r}: existing non-empty directory "
                "without an IVF layout marker (centroids.npy / ivf_part=*)"
            )
        shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    ivf_assign(ds, centroids, id_col, vec_col).write_parquet(
        out_dir, partition_cols=["ivf_part"]
    )
    np.save(os.path.join(out_dir, "centroids.npy"), centroids)
    return centroids


def ivf_topk_partitioned(
    out_dir: str,
    query_ids: list[int],
    query_vecs: np.ndarray,
    centroids: np.ndarray | None = None,
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Query the materialized IVF layout: only the probed partition
    DIRECTORIES are opened (column/row pruning at the read, per the
    prune-at-the-read rule), then the same masked scoring as ``ivf_topk``.
    Output identical to ``ivf_topk`` with the same centroids/nprobe."""
    import os

    if centroids is None:
        centroids = np.load(os.path.join(out_dir, "centroids.npy"))
    qm = _norm_rows(np.asarray(query_vecs, np.float64))
    q_probe = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]
    probed = sorted(set(int(p) for row in q_probe for p in row))
    paths = []
    part_of_path: dict[str, int] = {}
    for p in probed:
        d = os.path.join(out_dir, f"ivf_part={p}")
        if os.path.isdir(d):
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    fp = os.path.join(d, f)
                    paths.append(fp)
                    part_of_path[fp] = p
    ref = ray.put((np.asarray(query_ids, np.int64), qm, q_probe, centroids))
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "cos_sim": pa.array([], pa.float64()),
        }
    )
    if not paths:
        return ray.data.from_arrow(empty)
    corpus = ray.data.read_parquet(paths, columns=[id_col, vec_col])

    def partial(batch: pa.Table) -> pa.Table:
        qids, qmat, probes, cents = ray.get(ref)
        ids = batch[id_col].to_numpy()
        m = _norm_rows(_batch_matrix(batch, vec_col))
        # re-derive the partition id (same argmax that wrote the layout —
        # deterministic); the hive column lives in the dir name, and the
        # expensive part (reading unprobed partitions) is already pruned
        part = (m @ cents.T).argmax(axis=1)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            mask = np.isin(part, probes[qi]) & (ids != qids[qi])
            rows = np.flatnonzero(mask)
            if len(rows) == 0:
                continue
            sims = qmat[qi] @ m[rows].T
            if len(rows) > k:
                kth = -np.partition(-sims, k - 1)[k - 1]
                keep = sims >= kth - 1e-6
                rows, sims = rows[keep], sims[keep]
            for j, s in zip(rows, np.atleast_1d(sims)):
                out_q.append(int(qids[qi]))
                out_n.append(int(ids[j]))
                out_s.append(round(float(s), 6))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = corpus.map_batches(partial, batch_format="pyarrow")

    def final_topk(group: pa.Table) -> pa.Table:
        sims = group["cos_sim"].to_numpy()
        nids = group["neighbor_id"].to_numpy()
        order = sorted(range(len(sims)), key=lambda i: (-sims[i], nids[i]))[:k]
        return group.take(order)

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# LSH-bucketed variant (scale path #2)
# ---------------------------------------------------------------------------


class HyperplaneLSH:
    """Random-hyperplane signatures: vec -> n_bits sign bits (deterministic
    seed). Multiprobe: flip each single bit for 1+n_bits candidate buckets."""

    def __init__(self, dim: int, n_bits: int = 12, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_bits, dim))
        self.n_bits = n_bits

    def buckets(self, vecs: np.ndarray, multiprobe: bool = False) -> np.ndarray:
        bits = (vecs @ self.planes.T) > 0
        base = (bits.astype(np.uint64) << np.arange(self.n_bits, dtype=np.uint64)).sum(axis=1)
        if not multiprobe:
            return base[:, None]
        flips = base[:, None] ^ (np.uint64(1) << np.arange(self.n_bits, dtype=np.uint64))[None, :]
        return np.concatenate([base[:, None], flips], axis=1)


def lsh_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    query_vecs: np.ndarray,
    k: int = 10,
    n_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Approximate top-k: score only corpus vectors whose LSH bucket matches
    a query bucket (incl. 1-bit multiprobe).  Same output schema as
    brute_force_topk; recall measured in tests."""
    qm = _norm_rows(np.asarray(query_vecs, np.float64))
    lsh = HyperplaneLSH(qm.shape[1], n_bits=n_bits)
    q_buckets = lsh.buckets(qm, multiprobe=True)  # (Q, 1+n_bits)
    wanted: dict[int, list[int]] = {}
    for qi in range(len(query_ids)):
        for bkt in q_buckets[qi]:
            wanted.setdefault(int(bkt), []).append(qi)
    qref = ray.put((np.asarray(query_ids, np.int64), qm, wanted))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qmat, want = ray.get(qref)
        ids = batch[id_col].to_numpy()
        m = _norm_rows(_batch_matrix(batch, vec_col))
        b_buckets = lsh.buckets(m)[:, 0]
        out_q, out_n, out_s = [], [], []
        by_q: dict[int, list[int]] = {}
        for row, bkt in enumerate(b_buckets):
            for qi in want.get(int(bkt), ()):
                by_q.setdefault(qi, []).append(row)
        for qi, rows in by_q.items():
            rows = np.array(rows)
            keep = rows[ids[rows] != qids[qi]]
            if len(keep) == 0:
                continue
            sims = qmat[qi] @ m[keep].T
            for j, s in zip(keep, np.atleast_1d(sims)):
                out_q.append(int(qids[qi]))
                out_n.append(int(ids[j]))
                out_s.append(round(float(s), 6))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final_topk(group: pa.Table) -> pa.Table:
        sims = group["cos_sim"].to_numpy()
        nids = group["neighbor_id"].to_numpy()
        order = sorted(range(len(sims)), key=lambda i: (-sims[i], nids[i]))[:k]
        return group.take(order)

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")
