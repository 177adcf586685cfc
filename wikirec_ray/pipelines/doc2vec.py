"""Distributed Doc2Vec (PV-DBOW) training (SURVEY T4) — the second global
trainer the reference fits in-process with gensim (``model.py`` Doc2Vec
branch), re-expressed as synchronous data-parallel SGD:

  per epoch: broadcast the V×d word-vector matrix → one ``map_batches``
  pass where each doc runs its OWN vector's SGD locally (a doc's vector
  receives gradients only from its own (doc, word) pairs, so doc-parallel
  updates are exact) and emits (a) its updated doc vector as a column and
  (b) a SPARSE word-gradient partial (touched word ids + their gradient
  rows, not the dense V×d matrix) → driver scatter-adds the partials and
  applies ONE synchronous word-vector step → repeat.

This is PV-DBOW with negative sampling (Le & Mikolov 2014; Mikolov et al.
2013 for the unigram^0.75 negative distribution).  Deviation from gensim,
documented: gensim does asynchronous hogwild updates of the word matrix
within an epoch; here word vectors are frozen for the epoch and updated
once from the summed gradients (synchronous large-batch SGD) — the
determinism and distribution win, at the cost of a slightly different
optimization trajectory.  Negatives are drawn deterministically per
(doc, pair, epoch) with the engine's fmix64 hash, so training is bitwise
reproducible for a seed (pinned in tests).

Scale shape: the driver holds O(V·d) floats (vocabulary capped like
``lm_quality_scores``); doc vectors live IN the Dataset rows and stream;
each epoch is one pass with K×V-free partials (V×d, summed streaming
with ``preserve_order`` for determinism).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from wikirec_ray.functions.hashing import GOLD64 as _GOLD, fmix64


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30.0, 30.0)))


def _neg_table(counts: np.ndarray, power: float = 0.75) -> np.ndarray:
    """Cumulative unigram^power distribution for vectorized negative draws
    (searchsorted over a uniform hash)."""
    w = counts.astype(np.float64) ** power
    cum = np.cumsum(w)
    return cum / cum[-1]


def train_doc2vec(
    ds: ray.data.Dataset,
    dim: int = 32,
    epochs: int = 10,
    lr: float = 0.5,  # mean-gradient steps need a larger rate than
    #                     per-sample SGD's usual 0.025-0.05
    negatives: int = 5,
    max_vocab: int = 1 << 17,
    seed: int = 29,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Train PV-DBOW over a (doc_id, text) Dataset.  Returns
    {"docvecs": Dataset(doc_id, vec fixed_size_list<dim>),
     "word_vectors": (V, d), "vocab": [terms], "losses": [per-epoch]}.

    The learning rate decays linearly per epoch (gensim's schedule shape);
    every negative draw is a pure function of (doc, pair index, epoch,
    seed)."""
    from wikirec_ray.pipelines.lda import _bow_dataset
    from wikirec_ray.stages.stats import frequent_terms

    if dim < 1 or epochs < 1 or negatives < 0:
        raise ValueError("dim, epochs must be >= 1; negatives >= 0")

    # vocabulary + corpus term frequencies (for the unigram^0.75 table)
    freq_rows = (
        frequent_terms(ds, min_total=1, id_col=id_col, text_col=text_col)
        .sort(["total_tf", "term"], descending=[True, False])
        .limit(max_vocab)
        .take_all()
    )
    vocab = [r["term"] for r in freq_rows]
    if not vocab:
        raise ValueError("empty vocabulary")
    counts = np.array([r["total_tf"] for r in freq_rows], np.float64)
    V = len(vocab)
    cum = _neg_table(counts)

    # init doc vectors deterministically from doc_id (docs may arrive in
    # any order, so the init must be content-addressed, not positional)
    def init_vecs(batch: pa.Table) -> pa.Table:
        # counter-based normals: fmix64 over (doc key ⊕ dim counter) gives two
        # uniforms per cell, Box-Muller gives the normal — fully vectorized,
        # no per-doc rng construction (review r03)
        ids = batch[id_col].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            keys = fmix64(ids * _GOLD + np.uint64(seed))
            ctr = np.arange(dim, dtype=np.uint64) * _GOLD + np.uint64(1)
            k1 = fmix64(keys[:, None] ^ ctr[None, :])
            k2 = fmix64(k1 ^ _GOLD)
        u1 = (k1.astype(np.float64) + 0.5) / 2.0**64
        u2 = (k2.astype(np.float64) + 0.5) / 2.0**64
        vecs = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
        vecs /= np.sqrt(dim)
        return batch.append_column(
            "vec",
            pa.FixedSizeListArray.from_arrays(
                pa.array(np.ascontiguousarray(vecs).reshape(-1)), dim
            ),
        )

    rng = np.random.default_rng(seed)
    U = (rng.standard_normal((V, dim)) / np.sqrt(dim)).astype(np.float64)

    # preserve_order spans the WHOLE build: the bow/init block order feeds
    # the driver's float accumulation order (review r03); the try/finally
    # starts HERE so a failure inside any stage still restores the flag
    ctx = ray.data.DataContext.get_current()
    prev_preserve = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        bow = _bow_dataset(ds, pa.array(vocab, pa.string()), text_col)
        state = bow.map_batches(init_vecs, batch_format="pyarrow").materialize()
        losses: list[float] = []
        for epoch in range(epochs):
            cur_lr = lr * (1.0 - epoch / epochs)
            u_ref = ray.put(U)
            cum_ref = ray.put(cum)

            def sgd(batch: pa.Table, _u=u_ref, _cum=cum_ref, _lr=cur_lr,
                    _ep=epoch) -> pa.Table:
                # previous epoch's grad/loss carrier columns are dropped
                # here instead of a dedicated materialize pass (review r03)
                batch = batch.select([id_col, "w", "c", "vec"])
                Umat = ray.get(_u)
                cumw = ray.get(_cum)
                wcol = batch["w"].combine_chunks()
                pw = wcol.flatten().to_numpy(zero_copy_only=False)
                c = batch["c"].combine_chunks().flatten().to_numpy(
                    zero_copy_only=False
                )
                off = wcol.offsets.to_numpy(zero_copy_only=False)
                n_docs = batch.num_rows
                vcol = batch["vec"].combine_chunks()
                D = (
                    vcol.flatten().to_numpy(zero_copy_only=False)
                    .reshape(n_docs, dim).copy()
                )
                ids = batch[id_col].to_numpy().astype(np.uint64)
                grad_U = np.zeros_like(Umat)
                cnt_U = np.zeros(Umat.shape[0], np.float64)
                loss = 0.0
                # per-doc loop: a doc's SGD trajectory is inherently
                # sequential in itself; the per-doc work is vectorized over
                # its pairs, and docs parallelize across batches/actors
                for r in range(n_docs):
                    s, e = off[r], off[r + 1]
                    if s == e:
                        continue
                    words = pw[s:e]
                    cc = c[s:e]
                    n_pairs = e - s
                    dv = D[r]
                    # positives: maximize sigma(dv . u_w), count-weighted
                    zw = Umat[words] @ dv
                    gpos = (_sigmoid(zw) - 1.0) * cc  # d/dz of -log sigma
                    loss += float((-np.log(_sigmoid(zw) + 1e-12) * cc).sum())
                    gd = (gpos[:, None] * Umat[words]).sum(axis=0)
                    gd_weight = float(cc.sum())
                    np.add.at(grad_U, words, gpos[:, None] * dv)
                    np.add.at(cnt_U, words, cc)
                    if negatives > 0:
                        # negatives PROPORTIONAL to the pair counts, so the
                        # positive pull (count-weighted) and negative push
                        # stay at the documented `negatives` ratio for
                        # repeated words too (review r03)
                        n_neg = int(cc.sum()) * negatives
                        with np.errstate(over="ignore"):
                            keys = fmix64(
                                (ids[r] * _GOLD ^ np.arange(
                                    n_neg, dtype=np.uint64
                                )) + np.uint64(_ep * 1_000_003 + seed)
                            )
                        u = (keys.astype(np.float64) + 0.5) / 2.0**64
                        negs = np.searchsorted(cumw, u)
                        zn = Umat[negs] @ dv
                        gneg = _sigmoid(zn)
                        loss += float(-np.log(1.0 - _sigmoid(zn) + 1e-12).sum())
                        gd += (gneg[:, None] * Umat[negs]).sum(axis=0)
                        gd_weight += len(negs)
                        np.add.at(grad_U, negs, gneg[:, None] * dv)
                        np.add.at(cnt_U, negs, 1.0)
                    # mean gradient per contribution: step size independent
                    # of doc length (a summed step overshoots on long docs)
                    D[r] = dv - _lr * gd / max(gd_weight, 1.0)
                out = batch.set_column(
                    batch.column_names.index("vec"),
                    "vec",
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(np.ascontiguousarray(D).reshape(-1)), dim
                    ),
                )
                # ONE grad/loss carrier row per block (row 0); empty
                # carriers are filtered before the combine stage, so block
                # coalescing stays safe.  Sparse layout owned by
                # gradreduce.encode_sparse_grad — only words this block
                # touched (partial bytes drop ~|touched|/V).  Accumulation
                # is per-RUN deterministic (fixed batching under
                # preserve_order); the 16-way worker combine changes float
                # association vs summing raw blocks, so values are not
                # comparable bit-for-bit with pre-r5 runs.
                from wikirec_ray.functions.gradreduce import encode_sparse_grad

                touched = np.flatnonzero(cnt_U != 0.0).astype(np.int64)
                blob = encode_sparse_grad(
                    touched, grad_U[touched], cnt_U[touched]
                )
                gcol = pa.array(
                    [blob] + [b""] * (n_docs - 1),
                    pa.binary(),
                ) if n_docs else pa.array([], pa.binary())
                lcol = pa.array(
                    [loss] + [0.0] * (n_docs - 1), pa.float64()
                ) if n_docs else pa.array([], pa.float64())
                return out.append_column("grad", gcol).append_column("loss", lcol)

            nxt = state.map_batches(sgd, batch_format="pyarrow").materialize()
            # two-level reduction: non-empty carriers are summed
            # REDUCE_FANOUT-at-a-time in workers (combine_sparse_grads)
            # before the driver's final pass — the driver reads
            # n_blocks / FANOUT rows instead of n_blocks, so it is no
            # longer the epoch's reduction bottleneck at cluster scale
            from wikirec_ray.functions.gradreduce import (
                REDUCE_FANOUT,
                combine_sparse_grads,
                decode_sparse_grad,
            )

            gsrc = nxt.map_batches(
                lambda b: b.select(["grad", "loss"]).filter(
                    pc.not_equal(b["grad"], b"")
                ),
                batch_format="pyarrow",
            ).map_batches(
                lambda b: combine_sparse_grads(b, dim),
                batch_format="pyarrow",
                batch_size=REDUCE_FANOUT,
            )
            grad = np.zeros_like(U)
            cnt = np.zeros(V, np.float64)
            total_loss = 0.0
            for out in gsrc.iter_batches(batch_format="pyarrow", batch_size=None):
                garr = out["grad"]
                for i in range(out.num_rows):
                    blob = garr[i].as_py()
                    total_loss += out["loss"][i].as_py()
                    if blob:
                        idx, gblk, cblk = decode_sparse_grad(blob, dim)
                        grad[idx] += gblk  # idx unique per combined row
                        cnt[idx] += cblk
            # per-word MEAN gradient: with a capped vocabulary each word
            # accumulates thousands of contributions per epoch and the raw
            # sum diverges (observed on the synthetic corpus)
            U = U - cur_lr * grad / np.maximum(cnt, 1.0)[:, None]
            losses.append(total_loss)
            state = nxt  # already materialized; carriers dropped next epoch
    finally:
        ctx.execution_options.preserve_order = prev_preserve

    def finalize(batch: pa.Table) -> pa.Table:
        return batch.select([id_col, "vec"])

    return {
        "docvecs": state.map_batches(finalize, batch_format="pyarrow"),
        "word_vectors": U,
        "vocab": vocab,
        "losses": losses,
    }
