"""Distributed WikilinkNN-style entity embeddings (SURVEY T7) — the
reference's keras model (``/root/reference/src/wikirec/model.py:467-536``)
is two embedding tables (article, link) joined by a dot product and
trained with MSE against 1/0 labels on positive pairs plus uniform random
negatives.  Here the same model trains as synchronous data-parallel SGD,
the shape shared with ``pipelines/doc2vec``:

  group (article, link, label) rows per article (one hash-partitioned
  shuffle, done once) → per epoch: broadcast the n_links×d link matrix →
  each article updates ITS OWN vector exactly (its gradients come only
  from its own rows) and emits link-gradient partials → driver applies a
  per-link mean-gradient step → repeat.

Documented deviations from the reference: negatives are drawn ONCE with
the deterministic ``training.negative_samples`` (the reference redraws
uniform negatives per keras batch via ``random.SystemRandom`` —
irreproducible by construction; ours reproduce to within float
accumulation order — ULP-level — across runs), and the optimizer is
plain SGD with a linear decay rather than Adam.  The objective (MSE on the dot product,
label 1 for positives / 0 for negatives) is the reference's, not the
NCE-sigmoid used by doc2vec.

Scale: the article side streams (vectors live in Dataset rows); the link
side is assumed frequency-cut bounded (the reference applies the ≥4
wikilink cut first — SURVEY A2), so the driver holds O(n_links·d).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from wikirec_ray.functions.hashing import fmix64
from wikirec_ray.functions.partitions import partitioned_map_groups

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def train_wikilink_nn(
    pairs: ray.data.Dataset,
    n_articles: int,
    n_links: int,
    dim: int = 32,
    epochs: int = 10,
    lr: float = 0.5,
    negative_ratio: int = 2,
    seed: int = 31,
    article_col: str = "article_id",
    link_col: str = "link_id",
    n_parts: int = 64,
) -> dict:
    """Train article/link embeddings over a positive (article, link) pair
    Dataset.  Returns {"articles": Dataset(article_id, vec
    fixed_size_list<dim>), "link_vectors": (n_links, d), "losses": [...]}."""
    from wikirec_ray.pipelines.training import negative_samples

    if dim < 1 or epochs < 1 or negative_ratio < 0:
        raise ValueError("dim, epochs must be >= 1; negative_ratio >= 0")

    def pos_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": b[article_col].cast(pa.int64()),
                "l": b[link_col].cast(pa.int64()),
                "y": pa.array(np.ones(b.num_rows, np.float64)),
            }
        )

    labeled = pairs.map_batches(pos_rows, batch_format="pyarrow")
    if negative_ratio > 0:
        negs = negative_samples(
            pairs, n_articles, n_links, ratio=negative_ratio, seed=seed,
            article_col=article_col, link_col=link_col, n_parts=n_parts,
        )

        def neg_rows(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "a": b["neg_article"],
                    "l": b["neg_link"],
                    "y": pa.array(np.zeros(b.num_rows, np.float64)),
                }
            )

        labeled = labeled.union(negs.map_batches(neg_rows, batch_format="pyarrow"))

    def group_article(g: pa.Table) -> pa.Table:
        if "ppart" in g.column_names:
            g = g.drop_columns(["ppart"])
        a = g["a"].to_numpy()
        l = g["l"].to_numpy()
        y = g["y"].to_numpy()
        order = np.lexsort((l, a))
        a, l, y = a[order], l[order], y[order]
        new = np.ones(len(a), bool)
        new[1:] = a[1:] != a[:-1]
        starts = np.flatnonzero(new)
        offsets = np.concatenate([starts, [len(a)]]).astype(np.int64)
        return pa.table(
            {
                "article_id": pa.array(a[starts]),
                "links": pa.LargeListArray.from_arrays(
                    pa.array(offsets), pa.array(l)
                ),
                "labels": pa.LargeListArray.from_arrays(
                    pa.array(offsets), pa.array(y)
                ),
            }
        )

    def init_vecs(batch: pa.Table) -> pa.Table:
        # counter-based Box-Muller normals (no per-row rng) — same idiom as
        # doc2vec.init_vecs
        ids = batch["article_id"].to_numpy().astype(np.uint64)
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


    ctx = ray.data.DataContext.get_current()
    prev_preserve = ctx.execution_options.preserve_order
    # preserve_order covers the WHOLE build: the grouping shuffle's block
    # order must be reproducible too, or the driver's float gradient
    # accumulation order (and thus the model) differs run-to-run.  The
    # try/finally opens immediately so a failure anywhere restores the
    # session-global flag (review r03).
    ctx.execution_options.preserve_order = True
    rng = np.random.default_rng(seed)
    U = (rng.standard_normal((n_links, dim)) / np.sqrt(dim)).astype(np.float64)
    try:
        grouped = partitioned_map_groups(
            labeled, lambda b: b["a"].to_numpy(), group_article, n_parts
        )
        state = grouped.map_batches(init_vecs, batch_format="pyarrow").materialize()

        losses: list[float] = []
        for epoch in range(epochs):
            cur_lr = lr * (1.0 - epoch / epochs)
            u_ref = ray.put(U)

            def sgd(batch: pa.Table, _u=u_ref, _lr=cur_lr) -> pa.Table:
                # previous epoch's carrier columns dropped here instead of
                # a dedicated materialize pass
                batch = batch.select(["article_id", "links", "labels", "vec"])
                Umat = ray.get(_u)
                lcol = batch["links"].combine_chunks()
                flat_l = lcol.flatten().to_numpy(zero_copy_only=False)
                flat_y = batch["labels"].combine_chunks().flatten().to_numpy(
                    zero_copy_only=False
                )
                off = lcol.offsets.to_numpy(zero_copy_only=False)
                n = batch.num_rows
                A = (
                    batch["vec"].combine_chunks().flatten()
                    .to_numpy(zero_copy_only=False).reshape(n, dim).copy()
                )
                grad_U = np.zeros_like(Umat)
                cnt_U = np.zeros(Umat.shape[0], np.float64)
                loss = 0.0
                for r in range(n):
                    s, e = off[r], off[r + 1]
                    if s == e:
                        continue
                    links = flat_l[s:e]
                    y = flat_y[s:e]
                    av = A[r]
                    z = Umat[links] @ av
                    err = z - y  # d/dz of 0.5*(z-y)^2
                    loss += float(0.5 * (err * err).sum())
                    ga = (err[:, None] * Umat[links]).sum(axis=0) / len(links)
                    np.add.at(grad_U, links, err[:, None] * av)
                    np.add.at(cnt_U, links, 1.0)
                    A[r] = av - _lr * ga
                out = batch.set_column(
                    batch.column_names.index("vec"),
                    "vec",
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(np.ascontiguousarray(A).reshape(-1)), dim
                    ),
                )
                # sparse partial (layout owned by gradreduce.encode_sparse_
                # grad) — touched links only; per-run deterministic under
                # preserve_order, combined 16-at-a-time worker-side before
                # the driver pass (not bit-comparable with pre-r5 sums)
                from wikirec_ray.functions.gradreduce import encode_sparse_grad

                touched = np.flatnonzero(cnt_U != 0.0).astype(np.int64)
                blob = encode_sparse_grad(
                    touched, grad_U[touched], cnt_U[touched]
                )
                gcol = pa.array(
                    [blob] + [b""] * (n - 1),
                    pa.binary(),
                ) if n else pa.array([], pa.binary())
                lcol2 = pa.array(
                    [loss] + [0.0] * (n - 1), pa.float64()
                ) if n else pa.array([], pa.float64())
                return out.append_column("grad", gcol).append_column("loss", lcol2)

            nxt = state.map_batches(sgd, batch_format="pyarrow").materialize()
            # two-level reduction (see gradreduce.py): workers sum carriers
            # REDUCE_FANOUT-at-a-time; the driver's final pass reads
            # n_blocks / FANOUT rows — not the reduction bottleneck
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
            cnt = np.zeros(n_links, np.float64)
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
            U = U - cur_lr * grad / np.maximum(cnt, 1.0)[:, None]
            losses.append(total_loss)
            state = nxt  # already materialized; carriers dropped next epoch
    finally:
        ctx.execution_options.preserve_order = prev_preserve

    return {
        "articles": state.map_batches(
            lambda b: b.select(["article_id", "vec"]), batch_format="pyarrow"
        ),
        "link_vectors": U,
        "losses": losses,
    }
