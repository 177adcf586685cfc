"""Worker-side combine level for trainer gradient partials (VERDICT r04
item 6: "the driver becomes the reduction bottleneck on a multi-node
cluster").

The SGD trainers (``pipelines/doc2vec.py``, ``pipelines/wikilink.py``) emit
one sparse gradient blob per block and ``pipelines/lda.py`` one dense
sufficient-statistics blob per batch; previously the DRIVER summed every
blob each epoch — O(n_blocks) driver traffic and float work.  These
kernels sum the blobs F-at-a-time inside a ``map_batches`` combine stage
first, so the driver reads ``n_blocks / F`` rows.  A deeper tree is this
stage applied again; one level moves the reduction off the driver for the
fan-ins here (F=16 → a 256-block epoch becomes 16 driver rows) while the
deterministic batching under ``preserve_order`` keeps every run bitwise
reproducible (the per-run reduction ORDER is fixed: rows combine in block
order, combined rows reach the driver in batch order).

Sparse blob layout (shared by doc2vec/wikilink):
``[k:int64][idx:k×int64][grad:k×dim f64][cnt:k f64]`` — only touched rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

REDUCE_FANOUT = 16  # carrier rows summed per combine task


def decode_sparse_grad(blob: bytes, dim: int):
    """blob -> (idx int64[k], grad f64[k, dim], cnt f64[k])."""
    k = int(np.frombuffer(blob, np.int64, count=1)[0])
    idx = np.frombuffer(blob, np.int64, count=k, offset=8)
    grad = np.frombuffer(
        blob, np.float64, count=k * dim, offset=8 + k * 8
    ).reshape(k, dim)
    cnt = np.frombuffer(
        blob, np.float64, count=k, offset=8 + k * 8 + k * dim * 8
    )
    return idx, grad, cnt


def encode_sparse_grad(idx: np.ndarray, grad: np.ndarray, cnt: np.ndarray) -> bytes:
    return (
        np.int64(len(idx)).tobytes()
        + np.ascontiguousarray(idx, np.int64).tobytes()
        + np.ascontiguousarray(grad, np.float64).tobytes()
        + np.ascontiguousarray(cnt, np.float64).tobytes()
    )


def combine_sparse_grads(batch: pa.Table, dim: int) -> pa.Table:
    """Sum up to ``REDUCE_FANOUT`` sparse (grad, loss) carrier rows into
    one.  Per-index accumulation is ``np.add.at`` over the concatenated
    streams in row order — deterministic for a given batching; output
    indices ascending (np.unique), matching the per-block encoders."""
    idxs, grads, cnts = [], [], []
    loss = 0.0
    garr = batch["grad"]
    larr = batch["loss"]
    for i in range(batch.num_rows):
        blob = garr[i].as_py()
        loss += larr[i].as_py()
        if blob:
            idx, g, c = decode_sparse_grad(blob, dim)
            idxs.append(idx)
            grads.append(g)
            cnts.append(c)
    if not idxs:
        out_blob = b""
    else:
        all_idx = np.concatenate(idxs)
        all_g = np.vstack(grads)
        all_c = np.concatenate(cnts)
        uniq, inv = np.unique(all_idx, return_inverse=True)
        G = np.zeros((len(uniq), dim), np.float64)
        np.add.at(G, inv, all_g)
        C = np.zeros(len(uniq), np.float64)
        np.add.at(C, inv, all_c)
        out_blob = encode_sparse_grad(uniq, G, C)
    return pa.table(
        {"grad": pa.array([out_blob], pa.binary()),
         "loss": pa.array([loss], pa.float64())}
    )


def combine_dense_stats(batch: pa.Table) -> pa.Table:
    """Sum up to ``REDUCE_FANOUT`` dense (stats blob, ll) rows into one —
    the LDA sufficient-statistics analog (blobs are flat f64 of equal
    length; summed in row order)."""
    acc = None
    ll = 0.0
    sarr = batch["stats"]
    larr = batch["ll"]
    for i in range(batch.num_rows):
        blob = sarr[i].as_py()
        ll += larr[i].as_py()
        if not blob:
            continue  # empty carrier (e.g. a chained second combine level)
        v = np.frombuffer(blob, np.float64)
        acc = v.copy() if acc is None else acc + v
    out = acc.tobytes() if acc is not None else b""
    return pa.table(
        {"stats": pa.array([out], pa.binary()),
         "ll": pa.array([ll], pa.float64())}
    )
