"""Training-data preparation operators: negative sampling and topic
coherence — the dataflow analogs of the reference's two model-training
helpers that previously sat out of scope (SURVEY K5 / A7).

- ``negative_samples`` re-expresses the WikilinkNN batch generator's
  negative draw (``/root/reference/src/wikirec/model.py:495-529``: uniform
  random (article, link) pairs, rejected while they collide with a positive)
  as a DETERMINISTIC distributed operator: every negative is a pure function
  of (positive pair, slot, seed), collisions are rejected by a distributed
  anti-join (no driver-side positives set — the reference holds
  ``pairs_set`` in memory, which dies at crawl scale), and re-draws are
  bounded attempts so the result is exactly reproducible by an independent
  implementation (pinned in tests).

- ``topic_coherence`` is the corpus-statistics member of the topic-metric
  family the reference evaluates driver-side with gensim's c_v
  (``utils.py:185-191``): UMass coherence (Mimno et al., 2011) — per topic
  ``mean over ordered pairs of ln((D(wi, wj) + eps) / D(wj))`` — computed
  from one streaming pass of per-batch presence-matrix partials (the topic
  word union is tiny and broadcast; the corpus never leaves the cluster).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from wikirec_ray.functions.hashing import GOLD64 as _GOLD, fmix64
from wikirec_ray.functions.partitions import partitioned_map_groups
_LINK_SALT = np.uint64(0xA076_1D64_78BD_642F)  # xxh64 prime, any odd const


def _neg_keys(a: np.ndarray, l: np.ndarray, j: np.ndarray, att: np.ndarray,
              seed: int) -> np.ndarray:
    """Deterministic 64-bit key per (positive pair, slot, attempt)."""
    with np.errstate(over="ignore"):
        k = a.astype(np.uint64) * _GOLD
        k = (k ^ l.astype(np.uint64)) * _GOLD
        k = (k ^ j.astype(np.uint64)) * _GOLD
        k = (k ^ att.astype(np.uint64)) + np.uint64(seed)
    return fmix64(k)


def negative_samples(
    pairs: ray.data.Dataset,
    n_articles: int,
    n_links: int,
    ratio: int = 2,
    seed: int = 13,
    max_attempts: int = 8,
    article_col: str = "article_id",
    link_col: str = "link_id",
    n_parts: int = 64,
) -> ray.data.Dataset:
    """``ratio`` deterministic negative (article, link) draws per positive
    pair, excluding collisions with ANY positive (the reference's
    ``(random_article, random_link) not in pairs_set`` check).

    Shape: one map generates ``ratio × max_attempts`` candidate rows per
    positive; ONE hash-partitioned shuffle on the candidate (article, link)
    key anti-joins them against the positives; a second small
    hash-partitioned pass keeps the lowest surviving attempt per slot.
    Nothing is materialized on the driver.  A slot whose ``max_attempts``
    draws ALL collide is dropped (probability (|positives| / (n_articles ·
    n_links))^max_attempts — negligible for any real graph, and
    deterministic, so the independent oracle reproduces it).

    Returns (article_id src, link_id src, neg_idx, neg_article, neg_link).
    """
    if ratio < 1 or max_attempts < 1:
        raise ValueError("ratio and max_attempts must be >= 1")
    if n_articles < 1 or n_links < 1:
        # numpy uint64 % 0 silently yields 0 under a warning — fail loudly
        raise ValueError("n_articles and n_links must be >= 1")

    def gen(batch: pa.Table) -> pa.Table:
        a = batch[article_col].to_numpy().astype(np.uint64)
        l = batch[link_col].to_numpy().astype(np.uint64)
        n = len(a)
        m = ratio * max_attempts
        a_r = np.repeat(a, m)
        l_r = np.repeat(l, m)
        j = np.tile(np.repeat(np.arange(ratio, dtype=np.uint64), max_attempts), n)
        att = np.tile(np.arange(max_attempts, dtype=np.uint64), n * ratio)
        k = _neg_keys(a_r, l_r, j, att, seed)
        neg_a = (k % np.uint64(n_articles)).astype(np.int64)
        neg_l = (fmix64(k ^ _LINK_SALT) % np.uint64(n_links)).astype(np.int64)
        return pa.table(
            {
                "src_article": pa.array(a_r.astype(np.int64)),
                "src_link": pa.array(l_r.astype(np.int64)),
                "neg_idx": pa.array(j.astype(np.int64)),
                "attempt": pa.array(att.astype(np.int64)),
                "neg_article": pa.array(neg_a),
                "neg_link": pa.array(neg_l),
                "is_pos": pa.array(np.zeros(n * m, np.int8)),
            }
        )

    def tag_pos(batch: pa.Table) -> pa.Table:
        a = batch[article_col].to_numpy().astype(np.int64)
        l = batch[link_col].to_numpy().astype(np.int64)
        z = np.zeros(len(a), np.int64)
        return pa.table(
            {
                "src_article": pa.array(z),
                "src_link": pa.array(z),
                "neg_idx": pa.array(z),
                "attempt": pa.array(z),
                "neg_article": pa.array(a),
                "neg_link": pa.array(l),
                "is_pos": pa.array(np.ones(len(a), np.int8)),
            }
        )

    cands = pairs.map_batches(gen, batch_format="pyarrow")
    tagged = cands.union(pairs.map_batches(tag_pos, batch_format="pyarrow"))

    def anti(group: pa.Table) -> pa.Table:
        # within one hash partition of (neg_article, neg_link): drop
        # candidates whose EXACT pair appears among the positives (Arrow
        # left-anti join on the two key columns — a 64-bit combined-key
        # shortcut could collide two distinct pairs and silently drop a
        # valid negative; review r03)
        import pyarrow.compute as pc

        is_pos = pc.equal(group["is_pos"], 1)
        pos = (
            group.filter(is_pos)
            .select(["neg_article", "neg_link"])
            .group_by(["neg_article", "neg_link"])
            .aggregate([])
        )
        cand = group.filter(pc.invert(is_pos)).drop_columns(["is_pos"])
        if "ppart" in cand.column_names:
            cand = cand.drop_columns(["ppart"])
        return cand.join(pos, keys=["neg_article", "neg_link"], join_type="left anti")

    def pair_key(b: pa.Table) -> np.ndarray:
        with np.errstate(over="ignore"):
            return (
                b["neg_article"].to_numpy().astype(np.uint64) * _GOLD
                ^ b["neg_link"].to_numpy().astype(np.uint64)
            ).astype(np.int64)

    surviving = partitioned_map_groups(tagged, pair_key, anti, n_parts)

    def first_attempt(group: pa.Table) -> pa.Table:
        if "ppart" in group.column_names:
            group = group.drop_columns(["ppart"])
        sa = group["src_article"].to_numpy()
        sl = group["src_link"].to_numpy()
        ji = group["neg_idx"].to_numpy()
        at = group["attempt"].to_numpy()
        # lowest surviving attempt per (src pair, slot): lexsort + first-of-run
        order = np.lexsort((at, ji, sl, sa))
        sas, sls, jis = sa[order], sl[order], ji[order]
        new = np.ones(len(order), bool)
        new[1:] = (
            (sas[1:] != sas[:-1]) | (sls[1:] != sls[:-1]) | (jis[1:] != jis[:-1])
        )
        keep = np.sort(order[new])
        return group.take(pa.array(keep)).drop_columns(["attempt"]).rename_columns(
            ["article_id", "link_id", "neg_idx", "neg_article", "neg_link"]
        )

    def slot_key(b: pa.Table) -> np.ndarray:
        with np.errstate(over="ignore"):
            return (
                b["src_article"].to_numpy().astype(np.uint64) * _GOLD
                ^ b["src_link"].to_numpy().astype(np.uint64)
            ).astype(np.int64)

    return partitioned_map_groups(surviving, slot_key, first_attempt, n_parts)


def topic_coherence(
    ds: ray.data.Dataset,
    topics: list[list[str]],
    eps: float = 1.0,
    text_col: str = "text",
):
    """UMass coherence per topic over the corpus's document co-occurrence
    statistics: ``mean_{i<j} ln((D(w_i, w_j) + eps) / D(w_j))`` with words
    in the given (relevance-ordered) sequence, pairs (i earlier, j later)
    — D = document frequency over THIS dataset.

    One streaming pass: each batch reduces to a |W|×|W| co-document count
    matrix over the topic-word union W (vectorized presence matrix, one
    matmul); partials are ~KB and sum on the driver.  Returns a pandas
    DataFrame (topic_id, coherence rounded to 6dp, n_oov).

    Pairs whose conditioning word never occurs (D(w_j) = 0) are SKIPPED
    rather than scored: with the standard eps = 1 they would contribute
    ln(1/1) = 0 — a neutral value that silently inflates coherence for
    topics containing out-of-corpus words (ADVICE r03).  ``n_oov`` (count
    of topic words with D(w) = 0) surfaces the omission explicitly; a
    topic whose every pair is skipped gets coherence NaN, not 0."""
    import pandas as pd

    from wikirec_ray.stages.analyze import _flat_tokens

    # the default tokenizer lowercases the corpus — normalize topic words
    # the same way so capitalized inputs don't silently score D = 0
    topics = [[w.lower() for w in t] for t in topics]
    words = sorted({w for t in topics for w in t})
    if not words:
        raise ValueError("topics must contain at least one word")
    warr = pa.array(words, pa.string())
    widx = {w: i for i, w in enumerate(words)}

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parents, flat = _flat_tokens(batch[text_col].combine_chunks())
        par = parents.to_numpy(zero_copy_only=False)
        idx = pc.index_in(flat, value_set=warr).to_numpy(zero_copy_only=False)
        idxf = idx.astype(np.float64)
        hit = ~np.isnan(idxf)
        pres = np.zeros((batch.num_rows, len(words)), np.float64)
        if hit.any():
            pres[par[hit], idxf[hit].astype(np.int64)] = 1.0
        co = pres.T @ pres  # D(wi,wj) partial; diagonal = D(w)
        return pa.table({"co": pa.array([co.reshape(-1).tobytes()], pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    co = np.zeros((len(words), len(words)), np.float64)
    for r in rows:
        co += np.frombuffer(r["co"], np.float64).reshape(len(words), len(words))

    out = []
    for ti, topic in enumerate(topics):
        ids = [widx[w] for w in topic]
        n_oov = sum(1 for i in ids if co[i, i] == 0.0)
        terms = []
        for i in range(1, len(ids)):
            for j in range(i):
                # UMass: later word i against earlier word j; skip pairs
                # with no conditioning evidence (see docstring)
                d_wj = co[ids[j], ids[j]]
                if d_wj == 0.0:
                    continue
                terms.append(np.log((co[ids[i], ids[j]] + eps) / d_wj))
        coh = round(float(np.mean(terms)), 6) if terms else float("nan")
        out.append((ti, coh, n_oov))
    return pd.DataFrame({"topic_id": [t for t, _, _ in out],
                         "coherence": [c for _, c, _ in out],
                         "n_oov": [o for _, _, o in out]})
