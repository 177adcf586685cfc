"""Keyword-in-context snippet extraction over the corpus (search UX / crawl
QA): every occurrence of a query term or an exact phrase, with a token
window of context, as a streaming Dataset op.

The reference surfaces matches only as ranked titles (``model.py:372-383``);
a search user also needs to see WHY a doc matched.  Context windows are the
classic KWIC presentation; at crawl scale this runs as a stateless
``map_batches`` grep — no shuffle, no index required — so it streams at
read speed and composes with any upstream filter (e.g. restrict to the
top-k doc ids from ``phrase_topk`` by broadcasting the id set).

Both kernels are fully vectorized: one tokenize pass, one boolean mask
(``pc.is_in`` for terms, shifted-equality AND for phrases), and one
variable-length window gather (``gather_segments``) — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from wikirec_ray.functions.compress import gather_segments
from wikirec_ray.stages.analyze import _flat_tokens


def _doc_layout(batch: pa.Table, text_col: str):
    """Tokenize a batch once: (flat tokens, parent row ids, row start index
    per row, token count per row)."""
    parents, flat = _flat_tokens(batch[text_col].combine_chunks())
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    row_counts = np.bincount(par, minlength=batch.num_rows)
    row_starts = np.zeros(batch.num_rows, np.int64)
    np.cumsum(row_counts[:-1], out=row_starts[1:])
    return flat, par, row_starts, row_counts


def _emit(batch: pa.Table, id_col: str, flat, par, row_starts, row_counts,
          hits: np.ndarray, span: int, window: int) -> pa.Table:
    """Build (id, pos, snippet) rows for match start indices ``hits`` (into
    the flat token stream), each covering ``span`` tokens plus ``window``
    context tokens either side, clamped to its doc."""
    if len(hits) == 0:
        return pa.table({
            id_col: pa.array([], batch[id_col].type),
            "pos": pa.array([], pa.int64()),
            "snippet": pa.array([], pa.string()),
        })
    hp = par[hits]
    lo = np.maximum(hits - window, row_starts[hp])
    hi = np.minimum(hits + span + window, row_starts[hp] + row_counts[hp])
    idx, bounds = gather_segments(
        np.arange(len(par), dtype=np.int64), lo, hi - lo
    )
    toks = flat.take(pa.array(idx, pa.int64()))
    lists = pa.LargeListArray.from_arrays(pa.array(bounds, pa.int64()), toks)
    return pa.table({
        id_col: batch[id_col].take(pa.array(hp, pa.int64())),
        "pos": pa.array(hits - row_starts[hp]),
        "snippet": pc.binary_join(lists, " "),
    })


def keyword_snippets_batch(
    batch: pa.Table,
    terms: list[str],
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """The per-batch keyword-KWIC kernel: one row per occurrence of any
    query term over ``batch``'s docs — usable directly on a small fetched
    table (the query-then-fetch snippet phase) or inside ``map_batches``
    (the corpus-scan Dataset op below)."""
    term_set = pa.array(sorted(set(terms)), pa.string())
    flat, par, row_starts, row_counts = _doc_layout(batch, text_col)
    mask = pc.is_in(flat, value_set=term_set).to_numpy(zero_copy_only=False)
    return _emit(batch, id_col, flat, par, row_starts, row_counts,
                 np.flatnonzero(mask), 1, window)


def keyword_snippets(
    ds: ray.data.Dataset,
    terms: list[str],
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """One row per occurrence of any query term: (id, pos, snippet) where
    ``pos`` is the 0-based token offset in the doc and ``snippet`` is the
    matched token with ``window`` tokens of context either side."""
    return ds.map_batches(
        lambda b: keyword_snippets_batch(b, terms, window, id_col, text_col),
        batch_format="pyarrow",
    )


def phrase_snippets_batch(
    batch: pa.Table,
    phrase: list[str],
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """The per-batch exact-phrase-KWIC kernel (adjacent tokens, in order),
    shared by the Dataset op below and the query-then-fetch snippet
    phase."""
    if not phrase:
        raise ValueError("phrase_snippets: empty phrase")
    L = len(phrase)
    flat, par, row_starts, row_counts = _doc_layout(batch, text_col)
    n = len(par)
    if n < L:
        return _emit(batch, id_col, flat, par, row_starts, row_counts,
                     np.empty(0, np.int64), L, window)
    # shifted-equality AND: match[i] = all(flat[i+j] == phrase[j]);
    # windows crossing doc boundaries masked with one comparison
    match = pc.equal(flat.slice(0, n - L + 1), phrase[0]).to_numpy(
        zero_copy_only=False
    )
    for j in range(1, L):
        match &= pc.equal(
            flat.slice(j, n - L + 1), phrase[j]
        ).to_numpy(zero_copy_only=False)
    match &= par[: n - L + 1] == par[L - 1 :]
    return _emit(batch, id_col, flat, par, row_starts, row_counts,
                 np.flatnonzero(match), L, window)


def phrase_snippets(
    ds: ray.data.Dataset,
    phrase: list[str],
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """One row per exact-phrase occurrence (adjacent tokens, in order):
    (id, pos, snippet) with the whole phrase plus ``window`` context tokens.
    Match semantics are identical to ``IndexReader.phrase_topk``'s — this is
    the corpus-scan complement (present the hits) to the index path (find
    the docs)."""
    if not phrase:
        raise ValueError("phrase_snippets: empty phrase")
    return ds.map_batches(
        lambda b: phrase_snippets_batch(b, phrase, window, id_col, text_col),
        batch_format="pyarrow",
    )
