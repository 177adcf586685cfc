"""Distributed LDA topic-model training (SURVEY T5) — the corpus-global
trainer the reference fits with gensim (``/root/reference/src/wikirec/
model.py`` LDA branch; evaluated in ``utils.py:185-191``), re-expressed as
the classic iterative dataflow:

  tokenize + vocab-index the corpus ONCE into a compact materialized
  bag-of-words Dataset → each EM iteration broadcasts the K×V topic-word
  matrix, one ``map_batches`` E-step pass emits per-batch K×V
  sufficient-statistic partials (per-doc variational state never leaves
  its batch), the driver STREAMS the partial sum and applies the
  closed-form M-step → repeat.  This is batch variational EM for LDA
  (Blei, Ng, Jordan 2003, §5) — the same update family gensim's LdaModel
  uses, minus its online decay schedule.

Iterative-loop note (CLAUDE.md footgun): per-round Dataset scheduling
costs seconds, which killed the many-tiny-rounds label-propagation loop
(that one lives in partition-pinned actors).  EM is the opposite shape —
few, heavy rounds over an already-materialized compact input — so the
per-round cost is amortized; the bow materialization removes the
re-tokenization the naive loop would pay every round.

Vocabulary is the corpus's top-``max_vocab`` terms by document frequency
(distributed sort+limit — same bounded-broadcast rule as
``lm_quality_scores``); out-of-vocabulary tokens are ignored, as every
practical LDA does.

``digamma`` is implemented from the standard recurrence + asymptotic
series (Abramowitz & Stegun 6.3.18) because scipy is not shipped here;
accuracy pinned against exact identities in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from wikirec_ray.stages.analyze import _flat_tokens


def digamma(x: np.ndarray) -> np.ndarray:
    """Vectorized digamma for x > 0: shift x up past 10 with
    psi(x) = psi(x+1) - 1/x, then the asymptotic expansion."""
    x = np.asarray(x, np.float64)
    out = np.zeros_like(x)
    xs = x.copy()
    for _ in range(10):  # shift everything to >= 10
        small = xs < 10
        if not small.any():
            break
        out[small] -= 1.0 / xs[small]
        xs[small] += 1.0
    inv = 1.0 / xs
    inv2 = inv * inv
    out += (
        np.log(xs) - 0.5 * inv
        - inv2 * (1.0 / 12.0
                  - inv2 * (1.0 / 120.0 - inv2 * (1.0 / 252.0 - inv2 / 240.0)))
    )
    return out


def _bow_dataset(
    ds: ray.data.Dataset, vocab_arr: pa.Array, text_col: str
) -> ray.data.Dataset:
    """(…, text) -> materialized (doc_id?, w: large_list<int64>,
    c: large_list<float64>) — unique in-vocab word ids + counts per doc.
    Tokenization and vocabulary lookup run ONCE; EM iterations re-read
    this compact table."""
    import pyarrow.compute as pc

    vocab_ref = ray.put(vocab_arr)
    V = len(vocab_arr)

    def fn(batch: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        parents, flat = _flat_tokens(batch[text_col].combine_chunks())
        par = parents.to_numpy(zero_copy_only=False)
        widx = pc.index_in(flat, value_set=vocab).to_numpy(zero_copy_only=False)
        widxf = widx.astype(np.float64)
        keep = ~np.isnan(widxf)
        par = par[keep]
        w = widxf[keep].astype(np.int64)
        key = par.astype(np.int64) * V + w
        uniq, counts = np.unique(key, return_counts=True)
        pd_ = uniq // V
        pw = uniq % V
        n_docs = batch.num_rows
        n_per_doc = np.zeros(n_docs, np.int64)
        np.add.at(n_per_doc, pd_, 1)
        offsets = np.zeros(n_docs + 1, np.int64)
        np.cumsum(n_per_doc, out=offsets[1:])
        cols = {}
        if "doc_id" in batch.column_names:
            cols["doc_id"] = batch["doc_id"]
        cols["w"] = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(pw, pa.int64())
        )
        cols["c"] = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()),
            pa.array(counts.astype(np.float64), pa.float64()),
        )
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow").materialize()


def _estep_bow(
    batch: pa.Table,
    beta_ref,
    alpha: float,
    inner_iters: int,
    want_gamma: bool,
) -> tuple[np.ndarray, float, pa.Table | None]:
    """One E-step over a bow batch: (K×V phi-count partial, log-likelihood
    proxy partial, per-doc gamma table when requested)."""
    log_beta = ray.get(beta_ref)  # (K, V) log word probabilities
    K = log_beta.shape[0]
    wcol = batch["w"].combine_chunks()
    pw = wcol.flatten().to_numpy(zero_copy_only=False)
    c = batch["c"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    off = wcol.offsets.to_numpy(zero_copy_only=False)
    n_docs = batch.num_rows
    pd_ = np.repeat(np.arange(n_docs), np.diff(off))
    doc_len = np.zeros(n_docs, np.float64)
    np.add.at(doc_len, pd_, c)

    gamma = np.full((n_docs, K), alpha, np.float64) + doc_len[:, None] / K
    lb_w = log_beta[:, pw].T  # (pairs, K)
    phi = np.full((len(pw), K), 1.0 / K, np.float64)
    for _ in range(inner_iters):
        elog = digamma(gamma) - digamma(gamma.sum(axis=1))[:, None]
        logphi = lb_w + elog[pd_]
        logphi -= logphi.max(axis=1, keepdims=True)
        phi = np.exp(logphi)
        phi /= phi.sum(axis=1, keepdims=True)
        gamma = np.full((n_docs, K), alpha)
        np.add.at(gamma, pd_, phi * c[:, None])
    stats = np.zeros((K, log_beta.shape[1]), np.float64)
    np.add.at(stats.T, pw, phi * c[:, None])
    theta = gamma / gamma.sum(axis=1, keepdims=True)
    ll = float((c * np.log((theta[pd_] * np.exp(lb_w)).sum(axis=1) + 1e-300)).sum())
    gtab = None
    if want_gamma:
        gtab = pa.table(
            {
                "doc_id": batch["doc_id"],
                "gamma": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.ascontiguousarray(gamma).reshape(-1)), K
                ),
            }
        )
    return stats, ll, gtab


def train_lda(
    ds: ray.data.Dataset,
    n_topics: int = 8,
    iters: int = 20,
    alpha: float = 0.1,
    eta: float = 0.01,
    inner_iters: int = 12,
    max_vocab: int = 1 << 17,
    seed: int = 23,
    text_col: str = "text",
    tol: float = 1e-4,
) -> dict:
    """Train LDA over a (doc_id, text) Dataset.  Returns
    {"beta": (K, V) topic-word probabilities, "vocab": [terms],
     "log_likelihoods": [per-iter], "n_iters": int}.

    Per iteration the driver holds O(K·V) floats: partials are SUMMED
    streaming from ``iter_batches`` (never ``take_all``), with
    ``preserve_order`` pinned for the run so the float accumulation order
    — and therefore beta — is bitwise deterministic for a given seed and
    block layout.  Stops early when the likelihood proxy improves by
    < ``tol`` relative."""
    from wikirec_ray.stages.stats import document_frequencies

    if n_topics < 1 or iters < 1 or inner_iters < 1:
        raise ValueError("n_topics, iters and inner_iters must be >= 1")

    dfs = document_frequencies(ds, text_col=text_col)
    head = (
        dfs.sort(["df", "term"], descending=[True, False]).limit(max_vocab).take_all()
    )
    vocab = [r["term"] for r in head]
    if not vocab:
        raise ValueError("empty vocabulary")
    V, K = len(vocab), n_topics
    bow = _bow_dataset(ds, pa.array(vocab, pa.string()), text_col)

    rng = np.random.default_rng(seed)
    beta = rng.gamma(100.0, 0.01, size=(K, V))
    beta /= beta.sum(axis=1, keepdims=True)

    ctx = ray.data.DataContext.get_current()
    prev_preserve = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        lls: list[float] = []
        for _ in range(iters):
            log_beta_ref = ray.put(np.log(beta + 1e-300))

            def partial(batch: pa.Table, _ref=log_beta_ref) -> pa.Table:
                stats, ll, _ = _estep_bow(batch, _ref, alpha, inner_iters, False)
                return pa.table(
                    {
                        "stats": pa.array([stats.reshape(-1).tobytes()], pa.binary()),
                        "ll": pa.array([ll], pa.float64()),
                    }
                )

            # two-level reduction (gradreduce.py): workers sum the K×V
            # sufficient-statistics blobs REDUCE_FANOUT-at-a-time before
            # the driver's final pass — the driver reads n_batches / FANOUT
            # rows, so it is not the epoch's reduction bottleneck
            from wikirec_ray.functions.gradreduce import (
                REDUCE_FANOUT,
                combine_dense_stats,
            )

            ssrc = bow.map_batches(partial, batch_format="pyarrow").map_batches(
                combine_dense_stats, batch_format="pyarrow",
                batch_size=REDUCE_FANOUT,
            )
            stats = np.zeros((K, V), np.float64)
            ll = 0.0
            for out in ssrc.iter_batches(batch_format="pyarrow"):
                for i in range(out.num_rows):
                    blob = out["stats"][i].as_py()
                    ll += out["ll"][i].as_py()
                    if blob:
                        stats += np.frombuffer(blob, np.float64).reshape(K, V)
            beta = stats + eta
            beta /= beta.sum(axis=1, keepdims=True)
            lls.append(ll)
            if len(lls) >= 2 and abs(lls[-1] - lls[-2]) < tol * abs(lls[-2]):
                break
    finally:
        ctx.execution_options.preserve_order = prev_preserve
    return {
        "beta": beta,
        "vocab": vocab,
        "log_likelihoods": lls,
        "n_iters": len(lls),
    }


def doc_topics(
    ds: ray.data.Dataset,
    model: dict,
    alpha: float = 0.1,
    inner_iters: int = 12,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-doc topic mixtures under a trained model: one E-step pass,
    returns (doc_id, gamma fixed_size_list<K>, top_topic)."""
    if inner_iters < 1:
        raise ValueError("inner_iters must be >= 1")
    log_beta_ref = ray.put(np.log(model["beta"] + 1e-300))
    bow = _bow_dataset(ds, pa.array(model["vocab"], pa.string()), text_col)

    def fn(batch: pa.Table) -> pa.Table:
        _, _, gtab = _estep_bow(batch, log_beta_ref, alpha, inner_iters, True)
        g = gtab["gamma"].combine_chunks()
        K = g.type.list_size
        mat = g.flatten().to_numpy(zero_copy_only=False).reshape(len(g), K)
        return gtab.append_column(
            "top_topic", pa.array(mat.argmax(axis=1).astype(np.int64))
        )

    return bow.map_batches(fn, batch_format="pyarrow")


def jaccard_topic_similarity(topic_1: list[str], topic_2: list[str]) -> float:
    """The reference's topic Jaccard (|A∩B| / |A∪B|) including its
    empty-list fixups (``/root/reference/src/wikirec/utils.py:113-137``:
    one empty side copies the other, two empty sides compare ["_None"] —
    both yielding 1.0)."""
    if topic_1 == [] and topic_2 != []:
        topic_1 = topic_2
    if topic_1 != [] and topic_2 == []:
        topic_2 = topic_1
    if topic_1 == [] and topic_2 == []:
        topic_1 = topic_2 = ["_None"]
    s1, s2 = set(topic_1), set(topic_2)
    return len(s1 & s2) / len(s1 | s2)


def topic_stability(
    ds: ray.data.Dataset,
    topic_nums: list[int],
    num_topic_words: int = 10,
    iters: int = 20,
    alpha: float = 0.1,
    eta: float = 0.01,
    inner_iters: int = 12,
    seed: int = 23,
    text_col: str = "text",
) -> dict:
    """The reference's cross-topic-count stability sweep
    (``graph_lda_topic_evals``, ``/root/reference/src/wikirec/utils.py:140-170``):
    train one model per topic count — PLUS the reference's appended extra
    count ``topic_nums[-1] + 1`` so every requested count has a successor —
    take each model's top-``num_topic_words`` topic words, and report, for
    each requested count, the MEAN pairwise Jaccard similarity between its
    topics and the next count's topics (high stability = the topic
    structure survives adding a topic).

    Each model trains with the distributed ``train_lda`` (the sweep is a
    driver-side loop over K values — the models are independent, and each
    training run already saturates the cluster, so there is nothing to
    gain by nesting parallelism).  Returns ``{"topic_nums": requested,
    "mean_stability": [...], "topics": {n: [[words]]}}``."""
    if not topic_nums or any(n < 1 for n in topic_nums):
        raise ValueError("topic_nums must be non-empty positive counts")
    if sorted(topic_nums) != list(topic_nums):
        raise ValueError("topic_nums must be ascending (the reference "
                         "compares consecutive counts)")
    nums = list(topic_nums) + [topic_nums[-1] + 1]
    topics: dict[int, list[list[str]]] = {}
    for n in nums:
        model = train_lda(
            ds, n_topics=n, iters=iters, alpha=alpha, eta=eta,
            inner_iters=inner_iters, seed=seed, text_col=text_col,
        )
        topics[n] = top_topic_words(model, num_topic_words)
    stability = [
        float(np.mean([
            jaccard_topic_similarity(t1, t2)
            for t1 in topics[nums[i]]
            for t2 in topics[nums[i + 1]]
        ]))
        for i in range(len(nums) - 1)
    ]
    return {
        "topic_nums": list(topic_nums),
        "mean_stability": stability,
        "topics": topics,
    }


def top_topic_words(model: dict, n: int = 10) -> list[list[str]]:
    """Per topic, the ``n`` highest-probability vocabulary words — the
    input shape ``topic_coherence`` expects (the reference's analog:
    show_topics → coherence eval)."""
    beta, vocab = model["beta"], model["vocab"]
    return [
        [vocab[i] for i in np.argsort(-beta[k])[:n]]
        for k in range(beta.shape[0])
    ]
