"""Distributed inverted-index construction (the engine's wide step).

Replaces the reference's ``gen_embeddings``/``gen_sim_matrix`` pair
(``/root/reference/src/wikirec/model.py:38-290``): where wikirec fits a
TfidfVectorizer (global DF/IDF state, ``model.py:166-170``) and materializes a
dense N×N similarity matrix, we build compressed posting lists with a
**groupby-on-term shuffle** and never materialize anything dense.

SINGLE-PASS pipeline (one tokenize, one shuffle, no full materialization):

  combiner   map_batches → per-batch partial posting RUNS, already
             delta+varint encoded (one blob row per (term, doc-range) per
             batch — ~100× fewer shuffle bytes than row-per-posting), plus
             one norms run per (batch, doc-range) under the reserved
             partition tpart = -1 carrying (doc_id, doc_len) pairs
  shuffle    groupby((tpart, range_id)).map_groups:
               tpart == -1 → merge norms runs → norms/range-*.parquet
                             (+ n_docs / Σdl for corpus stats)
               tpart >= 0  → merge each term's runs (decode → concat →
                             sort) → block encode → postings/tpart-*/
                             range-*.parquet
  merge      per-tpart task: concatenate each term's range chunks in
             doc-range order (ranges are doc_id-disjoint & ordered → pure
             concatenation, no re-sort, no second shuffle)
             → segments/seg-*.parquet + df.parquet (df(term) = Σ n — one
             posting per (term, doc), the reference's DF-not-TF counting,
             data_utils.py:945-948)

The single pass is possible because the encoder holds NO corpus-global
state: block-max metadata is (max tf, min dl) per block — the BM25 factor
is monotone in both, so the admissible score bound is computed at query
time with idf and avgdl (see state/segments.py).

Skew: the shuffle key is ``(hash(term) % N_TERM_PARTITIONS, doc_id //
DOC_RANGE_SIZE)`` — the doc range is a built-in salt, so a heavy-hitter term
("the", df≈N) is split across N/DOC_RANGE_SIZE bounded groups instead of
landing on one reducer; group size is bounded independently of term skew.

Resumability: every partition file is written atomically and recorded in
``manifest.json`` with bytes+md5+wall_ms and input lineage; a re-run with
``resume=True`` validates and skips finished partitions (the reference's
file-existence skip, ``data_utils.py:302,457-459``, hardened with content
hashes).
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa
import ray.data

from wikirec_ray.functions.compress import varint_encode
from wikirec_ray.schema import BLOCK_SIZE, BM25_B, BM25_K1, DOC_RANGE_SIZE, N_TERM_PARTITIONS
from wikirec_ray.stages.analyze import doc_term_freqs
from wikirec_ray.state.segments import (
    SEGMENT_SCHEMA,
    atomic_write_table,
    load_manifest,
    pack_i64,
    partition_is_valid,
    save_manifest,
    unpack_i64,
)

NORMS_TPART = -1  # reserved shuffle partition for doc-length runs
# manifest format: v4 added per-partition input fingerprints (input-aware
# resume); v5 made them LOGICAL (decoded-posting level) so resume skips
# are independent of upstream batch/read boundaries; v6 added the optional
# positional-postings columns to SEGMENT_SCHEMA (phrase queries — the files
# differ even when positions are off); resume refuses to mix formats
MANIFEST_VERSION = 6


def term_partitions_for(terms, n_tparts: int = N_TERM_PARTITIONS) -> np.ndarray:
    """Stable term -> tpart (crc32, identical in every worker process)."""
    return np.fromiter(
        (zlib.crc32(t.encode("utf-8")) % n_tparts for t in terms),
        dtype=np.int64,
        count=len(terms),
    )


RUN_SCHEMA = pa.schema(
    [
        ("tpart", pa.int64()),
        ("range_id", pa.int64()),
        ("term", pa.string()),
        ("n", pa.int64()),
        ("doc_blob", pa.binary()),   # varint delta-gap doc ids
        ("tf_blob", pa.binary()),    # varint tfs (norms runs: doc lengths)
        ("dl_blob", pa.binary()),    # varint per-posting doc lengths
        ("pos_blob", pa.binary()),   # varint delta-gap token positions,
                                     # restart per posting (tf values each);
                                     # b"" when store_positions is off
    ]
)


def _pairs_with_positions(
    batch: pa.Table, id_col: str, text_col: str, layout=None
) -> tuple[np.ndarray, list[str], np.ndarray, np.ndarray, np.ndarray]:
    """(id, text) batch -> per-(doc, term) pairs WITH token positions:
    (doc_ids u64, uniq_terms, term_codes i64, tfs u64, pos_flat u64).

    Same (doc, term, tf) multiset as ``doc_term_freqs`` (one lexsort over
    the token stream instead of the Arrow group_by); ``pos_flat`` holds each
    pair's ascending 0-based positions within the doc's kept-token stream,
    pair-major (pair i spans ``pos_flat[cum_tf[i] : cum_tf[i+1]]``).
    ``layout`` is an optional pre-computed ``_flat_tokens`` result so a
    caller that also runs ``_pair_postings`` tokenizes the batch once."""
    from wikirec_ray.stages.analyze import _flat_tokens

    parents, flat = layout or _flat_tokens(batch[text_col].combine_chunks())
    par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    n_tok = len(par)
    if n_tok == 0:
        return (np.empty(0, np.uint64), [], np.empty(0, np.int64),
                np.empty(0, np.uint64), np.empty(0, np.uint64))
    row_counts = np.bincount(par, minlength=batch.num_rows)
    row_starts = np.zeros(batch.num_rows, np.int64)
    np.cumsum(row_counts[:-1], out=row_starts[1:])
    tok_pos = np.arange(n_tok, dtype=np.int64) - row_starts[par]
    dict_arr = flat.dictionary_encode()
    uniq_terms = dict_arr.dictionary.to_pylist()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order0 = np.lexsort((tok_pos, codes, par))
    par_s, codes_s, pos_s = par[order0], codes[order0], tok_pos[order0]
    pb = np.flatnonzero((np.diff(par_s) != 0) | (np.diff(codes_s) != 0)) + 1
    pstarts = np.concatenate([[0], pb]).astype(np.int64)
    pends = np.concatenate([pb, [n_tok]]).astype(np.int64)
    ids_np = batch[id_col].to_numpy().astype(np.uint64)
    return (
        ids_np[par_s[pstarts]],
        uniq_terms,
        codes_s[pstarts],
        (pends - pstarts).astype(np.uint64),
        pos_s.astype(np.uint64),
    )


_BIGRAM_SET_CACHE: dict[str, frozenset] = {}


def _resolve_bigrams(ref) -> frozenset | None:
    """ObjectRef | list | frozenset | None -> frozenset[(w1, w2)], memoized
    per worker process so the broadcast pair list (``ray.put`` once on the
    driver) is deserialized once per worker — never re-shipped or re-built
    per batch."""
    if ref is None:
        return None
    if isinstance(ref, frozenset):
        return ref
    if isinstance(ref, (list, tuple)):
        return frozenset(map(tuple, ref))
    key = ref.hex()
    bs = _BIGRAM_SET_CACHE.get(key)
    if bs is None:
        import ray

        bs = frozenset(map(tuple, ray.get(ref)))
        # single-slot: one live pair set per build; evicting the previous
        # ref keeps long-lived workers from pinning dead sets
        _BIGRAM_SET_CACHE.clear()
        _BIGRAM_SET_CACHE[key] = bs
    return bs


def _pair_postings(
    batch: pa.Table, id_col: str, text_col: str, pairs: frozenset,
    layout=None,
) -> tuple[np.ndarray, list[str], np.ndarray, np.ndarray, np.ndarray]:
    """Composite-term postings for the precomputed bigram set: per (doc,
    pair in ``pairs``) occurrence counts and first-token positions, in the
    same shape ``_pairs_with_positions`` gives unigrams — (doc_ids u64,
    comp_terms, codes i64 into comp_terms, tfs u64, pos_flat u64).

    The composite term is ``"{w1} {w2}"`` (space-joined — collision-free
    because the whitespace tokenizer never emits a token containing a
    space).  Vectorized: one adjacency mask, eligibility prefilter at the
    batch-vocabulary level (two O(|batch vocab|) set probes), exact pair
    membership checked only for the unique eligible pairs present."""
    from wikirec_ray.stages.analyze import _flat_tokens

    empty = (np.empty(0, np.uint64), [], np.empty(0, np.int64),
             np.empty(0, np.uint64), np.empty(0, np.uint64))
    parents, flat = layout or _flat_tokens(batch[text_col].combine_chunks())
    par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(par) < 2:
        return empty
    dict_arr = flat.dictionary_encode()
    uniq = dict_arr.dictionary.to_pylist()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    firsts = {a for a, _ in pairs}
    seconds = {b for _, b in pairs}
    elig1 = np.fromiter((t in firsts for t in uniq), np.bool_, len(uniq))
    elig2 = np.fromiter((t in seconds for t in uniq), np.bool_, len(uniq))
    if not (elig1.any() and elig2.any()):
        return empty
    idx = np.flatnonzero(
        (par[1:] == par[:-1]) & elig1[codes[:-1]] & elig2[codes[1:]]
    )
    if not len(idx):
        return empty
    n_uniq = len(uniq)
    pair_code = codes[idx] * n_uniq + codes[idx + 1]
    up = np.unique(pair_code)
    valid = np.fromiter(
        ((uniq[int(p) // n_uniq], uniq[int(p) % n_uniq]) in pairs for p in up),
        np.bool_, len(up),
    )
    if not valid.any():
        return empty
    keep = valid[np.searchsorted(up, pair_code)]
    idx, pair_code = idx[keep], pair_code[keep]
    # 0-based position of w1 within the doc's kept-token stream
    row_counts = np.bincount(par, minlength=batch.num_rows)
    row_starts = np.zeros(batch.num_rows, np.int64)
    np.cumsum(row_counts[:-1], out=row_starts[1:])
    pos_in_doc = idx - row_starts[par[idx]]
    order = np.lexsort((pos_in_doc, pair_code, par[idx]))
    d_s, pc_s, pos_s = par[idx][order], pair_code[order], pos_in_doc[order]
    pb = np.flatnonzero((np.diff(d_s) != 0) | (np.diff(pc_s) != 0)) + 1
    starts = np.concatenate([[0], pb]).astype(np.int64)
    ends = np.concatenate([pb, [len(d_s)]]).astype(np.int64)
    comp_keys = up[valid]
    comp_uniq = [
        f"{uniq[int(p) // n_uniq]} {uniq[int(p) % n_uniq]}" for p in comp_keys
    ]
    comp_codes = np.searchsorted(comp_keys, pc_s[starts]).astype(np.int64)
    ids_np = batch[id_col].to_numpy().astype(np.uint64)
    return (
        ids_np[d_s[starts]],
        comp_uniq,
        comp_codes,
        (ends - starts).astype(np.uint64),
        pos_s.astype(np.uint64),
    )


def _postings_batch(
    batch: pa.Table, id_col: str, text_col: str,
    n_tparts: int = N_TERM_PARTITIONS,
    store_positions: bool = False,
    bigrams=None,
) -> pa.Table:
    """(doc_id, text) -> partial posting runs + norms runs (RUN_SCHEMA).

    One row per (tpart, range_id, term) present in the batch with that
    term's in-batch postings (and their doc lengths) varint-encoded; plus
    one row per doc-range under tpart=-1 carrying (doc_id, doc_len).  Each
    doc lives wholly inside one batch, so per-batch tf and dl are exact.
    With ``store_positions`` each posting run also carries its token
    positions (``pos_blob``, restart per posting).  With ``bigrams`` (a
    precomputed pair set — frozenset, list, or its broadcast ObjectRef)
    composite-term postings for occurring pairs are emitted through the
    SAME shuffle; doc lengths and norms count unigrams only, so BM25 is
    unaffected."""
    bigrams = _resolve_bigrams(bigrams)
    # tokenize ONCE per batch: with bigrams on, the same _flat_tokens layout
    # feeds both the unigram pass and _pair_postings (review r5 — the
    # duplicate tokenize doubled the hot combiner's Arrow split cost)
    layout = None
    if bigrams:
        from wikirec_ray.stages.analyze import _flat_tokens

        layout = _flat_tokens(batch[text_col].combine_chunks())
    pos_flat = None
    if store_positions:
        doc_ids, uniq_terms0, term_codes0, tfs, pos_flat = _pairs_with_positions(
            batch, id_col, text_col, layout
        )
    else:
        tf_tbl = doc_term_freqs(batch, id_col=id_col, text_col=text_col)
        doc_ids = tf_tbl[id_col].to_numpy().astype(np.uint64)
        tfs = tf_tbl["tf"].to_numpy().astype(np.uint64)

    # doc lengths: sum tf per doc, scattered back to posting rows
    # (UNIGRAM postings only — composite bigram postings appended below must
    # not inflate doc length, which is the BM25 normalizer)
    batch_ids = batch[id_col].to_numpy().astype(np.uint64)
    order_b = np.argsort(batch_ids)
    sorted_bids = batch_ids[order_b]
    pos = np.searchsorted(sorted_bids, doc_ids)
    dl_per_doc = np.zeros(len(batch_ids), dtype=np.uint64)
    np.add.at(dl_per_doc, pos, tfs)
    dls = dl_per_doc[pos]

    if store_positions:
        uniq_terms, term_codes = uniq_terms0, term_codes0
    else:
        dict_arr = tf_tbl["term"].combine_chunks().dictionary_encode()
        uniq_terms = dict_arr.dictionary.to_pylist()
        term_codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    if bigrams:
        p_docs, p_uniq, p_codes, p_tfs, p_pos = _pair_postings(
            batch, id_col, text_col, bigrams, layout
        )
        if len(p_docs):
            p_dls = dl_per_doc[np.searchsorted(sorted_bids, p_docs)]
            term_codes = np.concatenate([term_codes, p_codes + len(uniq_terms)])
            uniq_terms = list(uniq_terms) + p_uniq
            doc_ids = np.concatenate([doc_ids, p_docs])
            tfs = np.concatenate([tfs, p_tfs])
            dls = np.concatenate([dls, p_dls])
            if store_positions:
                pos_flat = np.concatenate([pos_flat, p_pos])
    range_ids = (doc_ids // np.uint64(DOC_RANGE_SIZE)).astype(np.int64)
    tpart_per_uniq = term_partitions_for(uniq_terms, n_tparts)

    order = np.lexsort((doc_ids, range_ids, term_codes))
    tc, rg, di, tf, dl = (
        term_codes[order], range_ids[order], doc_ids[order], tfs[order], dls[order]
    )
    if store_positions:
        # permute the per-pair position sub-streams into the sorted pair
        # order (variable-length segment gather via offsets)
        from wikirec_ray.functions.compress import gather_segments

        vstarts0 = np.zeros(len(tfs), np.int64)
        np.cumsum(tfs[:-1].astype(np.int64), out=vstarts0[1:])
        pos_sorted, pos_new_starts = gather_segments(
            pos_flat, vstarts0[order], tf.astype(np.int64)
        )
    if len(tc):
        boundary = np.flatnonzero(np.diff(tc) | np.diff(rg)) + 1
        starts = np.concatenate([[0], boundary, [len(tc)]])
    else:
        starts = np.array([0], np.int64)

    # norms runs appended after the posting runs: one run per doc-range
    # (dl_per_doc is positional over sorted_bids; zero-token docs carry dl=0)
    doc_ranges = (sorted_bids // np.uint64(DOC_RANGE_SIZE)).astype(np.int64)
    if len(sorted_bids):
        r_bounds = np.concatenate(
            [[0], np.flatnonzero(np.diff(doc_ranges)) + 1, [len(sorted_bids)]]
        )
    else:
        r_bounds = np.array([0], np.int64)

    # one value stream for all runs (postings then norms): vectorized varint
    # encode + per-value byte lengths -> blob slices per run
    from wikirec_ray.functions.compress import varint_lengths

    run_starts = starts[:-1]
    run_ends = starts[1:]
    norm_starts = r_bounds[:-1]
    norm_ends = r_bounds[1:]

    all_docs = np.concatenate([di, sorted_bids])
    all_vals = np.concatenate([tf, dl_per_doc])  # tf for postings, dl for norms
    all_dls = dl  # per-posting dl stream (postings only)
    abs_starts = np.concatenate([run_starts, norm_starts + len(di)])
    abs_ends = np.concatenate([run_ends, norm_ends + len(di)])

    gaps = np.empty(len(all_docs), np.uint64)
    if len(all_docs):
        gaps[1:] = all_docs[1:] - all_docs[:-1]
        gaps[0] = all_docs[0]
        gaps[abs_starts] = all_docs[abs_starts]
    doc_stream = varint_encode(gaps)
    val_stream = varint_encode(all_vals)
    dl_stream = varint_encode(all_dls)
    doc_cum = np.zeros(len(all_docs) + 1, np.int64)
    np.cumsum(varint_lengths(gaps), out=doc_cum[1:])
    val_cum = np.zeros(len(all_vals) + 1, np.int64)
    np.cumsum(varint_lengths(all_vals), out=val_cum[1:])
    dl_cum = np.zeros(len(all_dls) + 1, np.int64)
    np.cumsum(varint_lengths(all_dls), out=dl_cum[1:])

    n_runs = len(run_starts)
    tparts_out = np.concatenate(
        [tpart_per_uniq[tc[run_starts]] if n_runs else np.empty(0, np.int64),
         np.full(len(norm_starts), NORMS_TPART, np.int64)]
    ).astype(np.int64)
    ranges_out = np.concatenate(
        [rg[run_starts] if n_runs else np.empty(0, np.int64),
         doc_ranges[norm_starts] if len(norm_starts) else np.empty(0, np.int64)]
    ).astype(np.int64)
    terms_out = [uniq_terms[int(c)] for c in tc[run_starts]] + [""] * len(norm_starts)
    doc_blobs = [doc_stream[doc_cum[s] : doc_cum[e]] for s, e in zip(abs_starts, abs_ends)]
    val_blobs = [val_stream[val_cum[s] : val_cum[e]] for s, e in zip(abs_starts, abs_ends)]
    dl_blobs = [dl_stream[dl_cum[s] : dl_cum[e]] for s, e in zip(run_starts, run_ends)]
    dl_blobs += [b""] * len(norm_starts)

    if store_positions and len(pos_sorted):
        pos_gaps = np.empty(len(pos_sorted), np.uint64)
        pos_gaps[1:] = pos_sorted[1:] - pos_sorted[:-1]
        pos_gaps[0] = pos_sorted[0]
        pos_gaps[pos_new_starts[:-1]] = pos_sorted[pos_new_starts[:-1]]
        pos_stream = varint_encode(pos_gaps)
        pos_cum = np.zeros(len(pos_gaps) + 1, np.int64)
        np.cumsum(varint_lengths(pos_gaps), out=pos_cum[1:])
        pos_blobs = [
            pos_stream[pos_cum[pos_new_starts[s]] : pos_cum[pos_new_starts[e]]]
            for s, e in zip(run_starts, run_ends)
        ]
    else:
        pos_blobs = [b""] * n_runs
    pos_blobs += [b""] * len(norm_starts)

    return pa.table(
        {
            "tpart": pa.array(tparts_out),
            "range_id": pa.array(ranges_out),
            "term": pa.array(terms_out, pa.string()),
            "n": pa.array((abs_ends - abs_starts).astype(np.int64)),
            "doc_blob": pa.array(doc_blobs, pa.binary()),
            "tf_blob": pa.array(val_blobs, pa.binary()),
            "dl_blob": pa.array(dl_blobs, pa.binary()),
            "pos_blob": pa.array(pos_blobs, pa.binary()),
        },
        schema=RUN_SCHEMA,
    )


def _bm25_factor(tf: np.ndarray | float, dl: np.ndarray | float, avgdl: float):
    """idf-independent BM25 factor; monotone ↑tf, ↓dl (used for bounds)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (BM25_K1 + 1.0) / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))


def _encode_terms_table(
    terms: list[str], starts: np.ndarray, doc_ids: np.ndarray, tfs: np.ndarray,
    dls: np.ndarray, pos: np.ndarray | None = None,
) -> pa.Table:
    """Encode (term-sorted, doc-sorted-within-term) posting arrays into one
    SEGMENT_SCHEMA table. ``starts`` has len(terms)+1 boundaries. Holds no
    corpus-global state (block bounds are raw maxtf/mindl).  ``pos``, when
    given, is the flat posting-major position stream (posting i owns
    ``pos[cum_tf[i] : cum_tf[i+1]]``) and fills pos_blob / blk_pos_off.

    Fully vectorized: ONE varint pass over all gaps and one over all tfs for
    the whole group (per-value byte lengths let each term/block slice its
    bytes out of the shared stream); per-block stats via ufunc.reduceat.
    With zipfian vocabularies most terms have 1-3 postings — per-term/
    per-block Python encode calls dominated the old encoder."""
    from wikirec_ray.functions.compress import varint_lengths

    n_total = len(doc_ids)
    if n_total == 0:
        return pa.table({k: [] for k in SEGMENT_SCHEMA.names}, schema=SEGMENT_SCHEMA)
    starts = np.asarray(starts, dtype=np.int64)
    counts = np.diff(starts)
    # global block starts: every term start + every 128th posting within term
    blk_starts_list = []
    for ti in range(len(terms)):
        s, e = int(starts[ti]), int(starts[ti + 1])
        blk_starts_list.append(np.arange(s, e, BLOCK_SIZE, dtype=np.int64))
    blk_starts = np.concatenate(blk_starts_list)
    nblk_per_term = np.array([len(x) for x in blk_starts_list], dtype=np.int64)
    blk_ends = np.concatenate([blk_starts[1:], [n_total]])
    # term boundaries also cut blocks: fix ends at term boundaries
    term_of_block = np.repeat(np.arange(len(terms)), nblk_per_term)
    blk_ends = np.minimum(blk_ends, starts[term_of_block + 1])
    blk_counts = blk_ends - blk_starts

    # gaps with restart at every block start
    gaps = np.empty(n_total, np.uint64)
    gaps[1:] = doc_ids[1:] - doc_ids[:-1]
    gaps[0] = doc_ids[0]
    gaps[blk_starts] = doc_ids[blk_starts]

    doc_stream = varint_encode(gaps)
    tf_stream = varint_encode(tfs)
    doc_len_b = varint_lengths(gaps)
    tf_len_b = varint_lengths(tfs)
    doc_cum = np.zeros(n_total + 1, np.int64)
    np.cumsum(doc_len_b, out=doc_cum[1:])
    tf_cum = np.zeros(n_total + 1, np.int64)
    np.cumsum(tf_len_b, out=tf_cum[1:])

    blk_last = doc_ids[blk_ends - 1].astype(np.int64)
    blk_maxtf = np.maximum.reduceat(tfs, blk_starts).astype(np.int64)
    blk_mindl = np.minimum.reduceat(dls, blk_starts).astype(np.int64)

    if pos is not None:
        vstart = np.zeros(n_total + 1, np.int64)
        np.cumsum(tfs.astype(np.int64), out=vstart[1:])
        pos_gaps = np.empty(len(pos), np.uint64)
        pos_gaps[1:] = pos[1:] - pos[:-1]
        pos_gaps[0] = pos[0]
        pos_gaps[vstart[:-1]] = pos[vstart[:-1]]  # restart per posting
        pos_stream = varint_encode(pos_gaps)
        pos_cum = np.zeros(len(pos_gaps) + 1, np.int64)
        np.cumsum(varint_lengths(pos_gaps), out=pos_cum[1:])
        pbyte = pos_cum[vstart]  # byte offset at every posting boundary

    cols: dict[str, list] = {name: [] for name in SEGMENT_SCHEMA.names}
    bpos = 0
    for ti, term in enumerate(terms):
        s, e = int(starts[ti]), int(starts[ti + 1])
        nb = int(nblk_per_term[ti])
        bs = blk_starts[bpos : bpos + nb]
        be = blk_ends[bpos : bpos + nb]
        d0, t0 = int(doc_cum[s]), int(tf_cum[s])
        cols["term"].append(term)
        cols["n"].append(int(counts[ti]))
        cols["blk_last"].append(pack_i64(blk_last[bpos : bpos + nb]))
        cols["blk_counts"].append(pack_i64(blk_counts[bpos : bpos + nb]))
        cols["blk_doc_off"].append(
            pack_i64(np.concatenate([doc_cum[bs], [doc_cum[e]]]) - d0)
        )
        cols["blk_tf_off"].append(
            pack_i64(np.concatenate([tf_cum[bs], [tf_cum[e]]]) - t0)
        )
        cols["doc_blob"].append(doc_stream[d0 : int(doc_cum[e])])
        cols["tf_blob"].append(tf_stream[t0 : int(tf_cum[e])])
        cols["blk_maxtf"].append(pack_i64(blk_maxtf[bpos : bpos + nb]))
        cols["blk_mindl"].append(pack_i64(blk_mindl[bpos : bpos + nb]))
        cols["term_maxtf"].append(int(blk_maxtf[bpos : bpos + nb].max()))
        cols["term_mindl"].append(int(blk_mindl[bpos : bpos + nb].min()))
        if pos is not None:
            p0 = int(pbyte[s])
            cols["pos_blob"].append(pos_stream[p0 : int(pbyte[e])])
            cols["blk_pos_off"].append(
                pack_i64(np.concatenate([pbyte[bs], [pbyte[e]]]) - p0)
            )
        else:
            cols["pos_blob"].append(b"")
            cols["blk_pos_off"].append(b"")
        bpos += nb
    return pa.table(cols, schema=SEGMENT_SCHEMA)


def _entry_table(entries: list[dict]) -> pa.Table:
    return pa.table(
        {
            "key": pa.array([e["key"] for e in entries]),
            "entry": pa.array([json.dumps(e) for e in entries]),
        }
    )


def _logical_fingerprint(*streams: np.ndarray) -> str:
    """Order-independent fingerprint of one partition's LOGICAL input —
    one record per index position across the parallel uint64 streams
    (postings: term-hash/doc_id/tf/dl; norms: doc_id/dl).  Resume skips a
    partition only when its output file is intact AND this fingerprint
    matches the manifest's, so a changed corpus (appended docs, edited
    pages) rebuilds exactly the partitions whose inputs changed instead of
    silently serving stale postings.

    v5 hashes DECODED records rather than the raw run blobs (v4): the
    value no longer depends on how upstream map batches split postings
    into runs, so an unchanged partition skips even when the read layout
    changed — e.g. a crawl append that re-bundles the base files into
    different read tasks (v4 rebuilt everything there: safe, but an
    incremental ingest never actually skipped).  XOR combines per-record
    chained fmix64 hashes: record-order independent and NONLINEAR — a
    linear byte-sum checksum collided on compensating tf edits
    (review r04)."""
    from wikirec_ray.functions.hashing import GOLD64, fmix64

    n = len(streams[0])
    if n == 0:
        return "0"
    with np.errstate(over="ignore"):
        h = np.full(n, GOLD64, np.uint64)
        for s in streams:
            h = fmix64(h * GOLD64 ^ s.astype(np.uint64))
        fp = np.bitwise_xor.reduce(h) ^ fmix64(np.uint64(n))
    return f"{int(fp):016x}"


def _positions_hash(pos_abs: np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Per-posting uint64 digest of its position list (for the logical
    input fingerprint of a POSITIONAL index): each value is hashed with its
    rank inside the posting, then XOR-combined per posting — nonlinear in
    the values (fmix64) and sensitive to within-posting order, so permuted
    or shifted positions change the digest even when tf is unchanged."""
    from wikirec_ray.functions.hashing import GOLD64, fmix64

    n = len(tfs)
    if n == 0:
        return np.empty(0, np.uint64)
    counts = tfs.astype(np.int64)
    starts = np.zeros(n, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    ranks = np.arange(len(pos_abs), dtype=np.uint64) - np.repeat(
        starts, counts
    ).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = fmix64((pos_abs.astype(np.uint64) * GOLD64) ^ fmix64(ranks))
    return np.bitwise_xor.reduceat(h, starts)


def make_group_encoder(
    index_dir: str, prior_partitions: dict, resume: bool,
    store_positions: bool = False,
):
    """One callable for every shuffle group: norms groups (tpart=-1) merge
    doc-length runs; postings groups merge+block-encode posting runs."""

    def encode_group(group: pa.Table) -> pa.Table:
        from wikirec_ray.functions.compress import decode_postings, varint_decode

        tpart = int(group["tpart"][0].as_py())
        range_id = int(group["range_id"][0].as_py())

        if tpart == NORMS_TPART:
            path = os.path.join(index_dir, "norms", f"range-{range_id:06d}.parquet")
            key = os.path.relpath(path, index_dir)
            runs = group.to_pylist()
            parts = [decode_postings(r["doc_blob"], r["tf_blob"], r["n"]) for r in runs]
            ids = np.concatenate([p[0] for p in parts])
            dls_all = np.concatenate([p[1] for p in parts])
            o = np.argsort(ids)
            ids, dls_all = ids[o], dls_all[o]
            n_docs, sum_dl = len(ids), int(dls_all.sum())
            fp = _logical_fingerprint(ids, dls_all)
            if (
                resume
                and partition_is_valid(path, prior_partitions.get(key))
                and prior_partitions.get(key, {}).get("input_fp") == fp
            ):
                e = dict(prior_partitions[key])
                e.update(key=key, skipped=True, n_docs=n_docs, sum_dl=sum_dl)
                return _entry_table([e])
            tbl = pa.table(
                {"doc_id": pa.array(ids.astype(np.int64)),
                 "doc_len": pa.array(dls_all.astype(np.int64))}
            )
            entry = atomic_write_table(tbl, path)
            entry.update(key=key, kind="norms", range_id=range_id,
                         n_docs=n_docs, sum_dl=sum_dl, skipped=False,
                         input_fp=fp)
            return _entry_table([entry])

        path = os.path.join(index_dir, "postings", f"tpart-{tpart:03d}",
                            f"range-{range_id:06d}.parquet")
        key = os.path.relpath(path, index_dir)
        # Vectorized run merge: all runs' varint streams are decoded in ONE
        # pass each (concatenate → decode → split by run counts with the
        # cumsum-restart correction), then postings are ordered by
        # (term, doc_id) with a single lexsort.  Per-run Python decode calls
        # dominated with zipfian vocabularies (most runs hold 1-3 postings).
        # Decode happens BEFORE the resume check: the v5 input fingerprint
        # is computed over the decoded (term, doc, tf, dl) records so an
        # unchanged partition skips regardless of run boundaries; the skip
        # path pays decode but not the sort/encode/write.
        from wikirec_ray.functions.compress import decode_restarted, gather_segments

        run_n = group["n"].to_numpy()
        dict_terms = group["term"].combine_chunks().dictionary_encode()
        uniq_terms = dict_terms.dictionary.to_pylist()
        run_codes = dict_terms.indices.to_numpy(zero_copy_only=False).astype(np.int64)

        tf_concat = b"".join(group["tf_blob"].to_pylist())
        dl_concat = b"".join(group["dl_blob"].to_pylist())
        total = int(run_n.sum())
        doc_ids = decode_restarted(b"".join(group["doc_blob"].to_pylist()), run_n)
        tfs = varint_decode(tf_concat, total)
        dls = varint_decode(dl_concat, total)
        pos_abs = None
        if store_positions:
            # concatenated run pos blobs form one valid varint stream of
            # Σtf values with a delta restart at every posting boundary
            pos_abs = decode_restarted(
                b"".join(group["pos_blob"].to_pylist()), tfs
            )
            vstart0 = np.zeros(total, np.int64)
            np.cumsum(tfs[:-1].astype(np.int64), out=vstart0[1:])

        from wikirec_ray.functions.hashing import token_hashes_arrow

        uniq_hashes = token_hashes_arrow(dict_terms.dictionary)
        fp_streams = [np.repeat(uniq_hashes[run_codes], run_n), doc_ids, tfs, dls]
        if pos_abs is not None:
            fp_streams.append(_positions_hash(pos_abs, tfs))
        fp = _logical_fingerprint(*fp_streams)
        if (
            resume
            and partition_is_valid(path, prior_partitions.get(key))
            and prior_partitions.get(key, {}).get("input_fp") == fp
        ):
            e = dict(prior_partitions[key])
            e.update(key=key, skipped=True)
            return _entry_table([e])
        t0 = time.monotonic()
        # lexicographic term order (deterministic output independent of
        # arrival order)
        lex_rank = np.empty(len(uniq_terms), np.int64)
        lex_rank[np.argsort(np.array(uniq_terms, dtype=object))] = np.arange(len(uniq_terms))
        term_idx = np.repeat(lex_rank[run_codes], run_n)
        # final (term, doc) order — runs of one term may interleave doc ids,
        # and a (term, doc) pair is unique (each doc lives in one batch), so
        # this single lexsort fully determines the output
        order2 = np.lexsort((doc_ids, term_idx))
        pos_sorted = None
        if pos_abs is not None:
            pos_sorted, _ = gather_segments(
                pos_abs, vstart0[order2], tfs[order2].astype(np.int64)
            )
        doc_ids, tfs, dls, term_idx = (
            doc_ids[order2], tfs[order2], dls[order2], term_idx[order2]
        )
        boundaries = np.flatnonzero(np.diff(term_idx)) + 1
        starts = np.concatenate([[0], boundaries, [total]])
        present = term_idx[starts[:-1]]
        terms_sorted_all = sorted(uniq_terms)
        terms = [terms_sorted_all[int(c)] for c in present]
        table = _encode_terms_table(terms, starts, doc_ids, tfs, dls, pos_sorted)
        entry = atomic_write_table(table, path)
        entry.update(
            key=key, kind="postings", tpart=tpart, range_id=range_id,
            n_terms=len(terms), n_postings=int(len(doc_ids)),
            encode_ms=round((time.monotonic() - t0) * 1000, 3), skipped=False,
            input_fp=fp,
        )
        return _entry_table([entry])

    return encode_group


def _decode_range_table(
    t: pa.Table,
) -> tuple[list[str], np.ndarray, np.ndarray, np.ndarray, np.ndarray | None]:
    """Bulk-decode one postings range file (SEGMENT_SCHEMA) back into flat
    posting arrays: (terms, term_starts[len+1], doc_ids, tfs, pos|None).
    One varint pass per stream — concatenated per-term blobs form one valid
    stream, and per-block gap restarts are corrected with the same cumsum
    trick as ``SegmentReader.postings`` (state/segments.py), just across all
    terms at once.  ``pos`` is the flat posting-major position stream when
    the file stores positions, else None."""
    from wikirec_ray.functions.compress import decode_restarted, varint_decode

    terms = t["term"].to_pylist()
    n_per = t["n"].to_numpy()
    term_starts = np.zeros(len(terms) + 1, np.int64)
    np.cumsum(n_per, out=term_starts[1:])
    total = int(term_starts[-1])
    if total == 0:
        return (terms, term_starts, np.empty(0, np.uint64),
                np.empty(0, np.uint64), None)
    blk_counts = np.concatenate(
        [unpack_i64(b) for b in t["blk_counts"].to_pylist()]
    ).astype(np.int64)
    doc_ids = decode_restarted(b"".join(t["doc_blob"].to_pylist()), blk_counts)
    tfs = varint_decode(b"".join(t["tf_blob"].to_pylist()), total)
    pos = None
    pos_concat = b"".join(t["pos_blob"].to_pylist()) if "pos_blob" in t.schema.names else b""
    if pos_concat:
        pos = decode_restarted(pos_concat, tfs)
    return terms, term_starts, doc_ids, tfs, pos


def make_delta_merger(index_dir: str, prior_parts: dict,
                      store_positions: bool = False):
    """Group encoder for ``append_index``: each delta shuffle group MERGES
    with the partition already on disk (bulk decode → union → re-encode)
    instead of owning the whole range.  Fingerprints are recomputed over the
    merged logical postings, so they equal what a full build over base+delta
    records — ``build_index(resume=True)`` over the full corpus afterwards
    skips every partition an append produced.

    Every existing partition is validated against the manifest (size+md5)
    BEFORE it is merged: a crashed prior append leaves files the saved
    manifest does not describe, and silently merging them would bake the
    half-applied delta into a fully "valid" new manifest.  Divergence
    raises with the heal instruction instead."""

    def check_prior(path: str, key: str) -> bool:
        """True iff a validated prior partition exists at ``path``; False
        iff the partition is genuinely new (no file, no manifest entry)."""
        entry = prior_parts.get(key)
        if entry is None and not os.path.exists(path):
            return False
        if not partition_is_valid(path, entry):
            raise ValueError(
                f"append_index: on-disk partition {key} does not match the "
                f"manifest (torn file from a crashed prior append?) — heal "
                f"with build_index(resume=True) over the full corpus first"
            )
        return True

    def merge_group(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from wikirec_ray.functions.compress import (
            decode_restarted,
            gather_segments,
            varint_decode,
        )
        from wikirec_ray.functions.hashing import token_hashes_arrow

        tpart = int(group["tpart"][0].as_py())
        range_id = int(group["range_id"][0].as_py())

        # single-pass decode of the delta runs (same layout as encode_group)
        run_n = group["n"].to_numpy()
        total = int(run_n.sum())
        d_docs = decode_restarted(b"".join(group["doc_blob"].to_pylist()), run_n)
        d_vals = varint_decode(b"".join(group["tf_blob"].to_pylist()), total)

        if tpart == NORMS_TPART:
            path = os.path.join(index_dir, "norms", f"range-{range_id:06d}.parquet")
            key = os.path.relpath(path, index_dir)
            ids, dls = d_docs, d_vals  # norms runs: val stream holds doc lengths
            if len(ids) > 1:
                s_ids = np.sort(ids)
                if (np.diff(s_ids) == 0).any():
                    raise ValueError(
                        f"append_index: duplicate doc_ids WITHIN the delta in "
                        f"{key} — each appended doc must appear exactly once"
                    )
            if check_prior(path, key):
                old = pq.read_table(path)
                old_ids = old["doc_id"].to_numpy().astype(np.uint64)
                if len(np.intersect1d(old_ids, ids)):
                    raise ValueError(
                        f"append_index: delta doc_ids overlap existing docs in "
                        f"{key} — appends must carry only NEW doc ids; apply "
                        f"edits with build_index(resume=True) over the full corpus"
                    )
                ids = np.concatenate([old_ids, ids])
                dls = np.concatenate(
                    [old["doc_len"].to_numpy().astype(np.uint64), dls]
                )
            o = np.argsort(ids)
            ids, dls = ids[o], dls[o]
            fp = _logical_fingerprint(ids, dls)
            tbl = pa.table(
                {"doc_id": pa.array(ids.astype(np.int64)),
                 "doc_len": pa.array(dls.astype(np.int64))}
            )
            entry = atomic_write_table(tbl, path)
            entry.update(key=key, kind="norms", range_id=range_id,
                         n_docs=len(ids), sum_dl=int(dls.sum()), skipped=False,
                         input_fp=fp)
            return _entry_table([entry])

        path = os.path.join(index_dir, "postings", f"tpart-{tpart:03d}",
                            f"range-{range_id:06d}.parquet")
        key = os.path.relpath(path, index_dir)
        t0 = time.monotonic()
        d_dls = varint_decode(b"".join(group["dl_blob"].to_pylist()), total)
        dict_terms = group["term"].combine_chunks().dictionary_encode()
        d_uniq = dict_terms.dictionary.to_pylist()
        d_codes = dict_terms.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        d_pos = None
        if store_positions:
            d_pos = decode_restarted(
                b"".join(group["pos_blob"].to_pylist()), d_vals
            )

        if check_prior(path, key):
            o_terms, o_starts, o_docs, o_tfs, o_pos = _decode_range_table(
                pq.read_table(path)
            )
            if store_positions and len(o_docs) and o_pos is None:
                raise ValueError(
                    f"append_index: {key} stores no positions but the index "
                    f"stats say store_positions — rebuild"
                )
            # old postings' per-doc lengths come from the range's norms file;
            # doc lengths never change in append-only ingest, so reading it
            # before or after its own merge task is equally correct.  (The
            # norms file is NOT md5-validated here — this run's own norms
            # merge task may already have atomically rewritten it; taint
            # from a crashed prior append is caught by that norms task's
            # own check_prior, which fails the whole append.)
            npath = os.path.join(index_dir, "norms", f"range-{range_id:06d}.parquet")
            norms = pq.read_table(npath)
            n_ids = norms["doc_id"].to_numpy().astype(np.uint64)
            n_order = np.argsort(n_ids)
            o_dls = norms["doc_len"].to_numpy().astype(np.uint64)[n_order][
                np.searchsorted(n_ids[n_order], o_docs)
            ]
        else:
            o_terms, o_starts = [], np.zeros(1, np.int64)
            o_docs = np.empty(0, np.uint64)
            o_tfs = np.empty(0, np.uint64)
            o_dls = np.empty(0, np.uint64)
            o_pos = np.empty(0, np.uint64) if store_positions else None

        # union vocabulary, then one lexsort over (term, doc)
        uniq_all = sorted(set(o_terms) | set(d_uniq))
        rank = {t: i for i, t in enumerate(uniq_all)}
        o_term_idx = np.repeat(
            np.array([rank[t] for t in o_terms], np.int64),
            np.diff(o_starts).astype(np.int64),
        )
        d_rank = np.array([rank[t] for t in d_uniq], np.int64)
        term_idx = np.concatenate([o_term_idx, np.repeat(d_rank[d_codes], run_n)])
        doc_ids = np.concatenate([o_docs, d_docs])
        tfs = np.concatenate([o_tfs, d_vals])
        dls = np.concatenate([o_dls, d_dls])
        order = np.lexsort((doc_ids, term_idx))
        pos_sorted = None
        if store_positions:
            pos_all = np.concatenate(
                [o_pos if o_pos is not None else np.empty(0, np.uint64),
                 d_pos if d_pos is not None else np.empty(0, np.uint64)]
            )
            vst = np.zeros(len(tfs), np.int64)
            np.cumsum(tfs[:-1].astype(np.int64), out=vst[1:])
            pos_sorted, _ = gather_segments(
                pos_all, vst[order], tfs[order].astype(np.int64)
            )
        doc_ids, tfs, dls, term_idx = (
            doc_ids[order], tfs[order], dls[order], term_idx[order]
        )
        if len(doc_ids) > 1:
            dup = (np.diff(term_idx) == 0) & (np.diff(doc_ids) == 0)
            if dup.any():
                raise ValueError(
                    f"append_index: duplicate (term, doc) postings in {key} — "
                    f"delta doc_ids must be new"
                )
        uniq_hashes = token_hashes_arrow(pa.array(uniq_all, pa.string()))
        fp_streams = [uniq_hashes[term_idx], doc_ids, tfs, dls]
        if pos_sorted is not None:
            fp_streams.append(_positions_hash(pos_sorted, tfs))
        fp = _logical_fingerprint(*fp_streams)
        boundaries = np.flatnonzero(np.diff(term_idx)) + 1
        starts = np.concatenate([[0], boundaries, [len(doc_ids)]])
        terms = [uniq_all[int(c)] for c in term_idx[starts[:-1]]]
        table = _encode_terms_table(terms, starts, doc_ids, tfs, dls, pos_sorted)
        entry = atomic_write_table(table, path)
        entry.update(key=key, kind="postings", tpart=tpart, range_id=range_id,
                     n_terms=len(terms), n_postings=int(len(doc_ids)),
                     encode_ms=round((time.monotonic() - t0) * 1000, 3),
                     skipped=False, input_fp=fp)
        return _entry_table([entry])

    return merge_group


def _binary_offsets_and_data(col: pa.Array) -> tuple[np.ndarray, pa.Buffer]:
    """(absolute cell offsets int64[len+1], data buffer) of a binary array."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    bufs = col.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int32)[col.offset : col.offset + len(col) + 1]
    return off.astype(np.int64), bufs[2]


def _check_i32(last_offset: int, what: str) -> None:
    """SEGMENT_SCHEMA blob columns are 32-bit-offset ``binary``; a merged
    per-tpart blob past 2 GiB would silently wrap when offsets are cast to
    int32 (ADVICE r02 — silent corruption, worse than the loud Arrow
    builder overflow the vectorized merge replaced).  Fail loudly with the
    fix (raise ``n_term_partitions`` or move blobs to ``large_binary``)."""
    if last_offset >= (1 << 31):
        raise ValueError(
            f"{what}: merged blob column is {last_offset} bytes — exceeds the "
            "2 GiB int32 offset limit of SEGMENT_SCHEMA's binary columns. "
            "Raise n_term_partitions (smaller segments) or migrate the "
            "schema to large_binary."
        )


def _regroup_binary(col: pa.Array, group_starts: np.ndarray) -> pa.Array:
    """Concatenate runs of adjacent binary cells: new cell g spans input
    cells [group_starts[g], group_starts[g+1]).  Zero-copy — the data buffer
    is reused, only the offsets are resampled at group boundaries."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off, data = _binary_offsets_and_data(col)
    _check_i32(int(off[-1]), "_regroup_binary")
    new_off = off[np.concatenate([group_starts, [len(col)]])].astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), len(group_starts),
        [None, pa.py_buffer(np.ascontiguousarray(new_off).tobytes()), data],
    )


def _rebase_block_offsets(col: pa.Array, group_starts: np.ndarray) -> pa.Array:
    """Merge per-chunk block byte-offset cells (each ``[0, e1, …, E]``
    int64-packed) into per-term cells, rebasing each chunk's offsets by the
    cumulative blob length of the chunks before it — the vectorized
    equivalent of the old per-row ``unpack[1:] + len(blob)`` loop."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off, data = _binary_offsets_and_data(col)
    vals = np.frombuffer(data, dtype="<i8", offset=int(off[0]),
                         count=int((off[-1] - off[0]) // 8))
    entries = ((off[1:] - off[:-1]) // 8).astype(np.int64)  # m_r per cell
    n_cells = len(entries)
    # per-block byte sizes: adjacent diffs within each cell (cells carry a
    # leading 0, so diffs at cell starts are dropped)
    ends = np.cumsum(entries)
    starts = ends - entries
    diffs = np.diff(vals)
    keep = np.ones(len(vals) - 1, bool) if len(vals) else np.empty(0, bool)
    keep[starts[1:] - 1] = False  # positions crossing a cell boundary
    sizes = diffs[keep]  # one entry per block, in (term, range) order
    nblk_per_cell = entries - 1
    # per-term block spans
    gs = np.concatenate([group_starts, [n_cells]])
    nblk_per_term = np.add.reduceat(nblk_per_cell, gs[:-1]) if n_cells else np.empty(0, np.int64)
    b0 = np.zeros(len(group_starts), np.int64)
    np.cumsum(nblk_per_term[:-1], out=b0[1:])
    csum = np.cumsum(sizes)
    base = np.where(b0 > 0, csum[b0 - 1], 0) if len(sizes) else np.zeros(len(b0), np.int64)
    shifted = csum - np.repeat(base, nblk_per_term)
    out_vals = np.insert(shifted, b0, 0)  # leading 0 per term
    out_entries = nblk_per_term + 1
    new_off = np.zeros(len(group_starts) + 1, np.int64)
    np.cumsum(out_entries * 8, out=new_off[1:])
    _check_i32(int(new_off[-1]), "_rebase_block_offsets")
    return pa.Array.from_buffers(
        pa.binary(), len(group_starts),
        [None, pa.py_buffer(new_off.astype(np.int32).tobytes()),
         pa.py_buffer(np.ascontiguousarray(out_vals, dtype="<i8").tobytes())],
    )


def _merge_range_tables(tables: list[pa.Table]) -> pa.Table:
    """Merge per-range SEGMENT_SCHEMA tables into one per-term table.

    Fully vectorized (the old per-row ``to_pylist`` + dict-of-bytes merge was
    Python-speed over the whole vocabulary and became the build tail at
    realistic vocab sizes): rows are ordered by (term, range) with one Arrow
    sort, per-term cells then concatenate by OFFSET RESAMPLING (zero-copy for
    every plain binary column) and the two block-offset columns are rebased
    with a cumsum/reduceat pass.  Ranges are doc_id-disjoint and ascending,
    so file order within a term is already posting order."""
    for fi, t in enumerate(tables):
        tables[fi] = t.append_column(
            "fidx", pa.array(np.full(t.num_rows, fi, np.int64))
        )
    allt = pa.concat_tables(tables).combine_chunks()
    allt = allt.sort_by([("term", "ascending"), ("fidx", "ascending")])
    terms_all = allt["term"].combine_chunks()
    n_rows = allt.num_rows
    # group starts: first row of each distinct term (term-sorted)
    import pyarrow.compute as pc

    neq = pc.not_equal(terms_all.slice(1), terms_all.slice(0, n_rows - 1))
    group_starts = np.concatenate(
        [[0], np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1]
    ).astype(np.int64)
    gs = np.concatenate([group_starts, [n_rows]])
    n_col = allt["n"].to_numpy()
    maxtf = allt["term_maxtf"].to_numpy()
    mindl = allt["term_mindl"].to_numpy()
    # positional indexes rebase blk_pos_off like the other offset columns;
    # positions-off files carry b"" cells, which concatenate to b""
    has_pos = int(
        pc.sum(pc.binary_length(allt["blk_pos_off"])).as_py() or 0
    ) > 0
    pos_off_merge = _rebase_block_offsets if has_pos else _regroup_binary
    return pa.table(
        {
            "term": terms_all.take(pa.array(group_starts)),
            "n": pa.array(np.add.reduceat(n_col, gs[:-1]).astype(np.int64)),
            "blk_last": _regroup_binary(allt["blk_last"], group_starts),
            "blk_counts": _regroup_binary(allt["blk_counts"], group_starts),
            "blk_doc_off": _rebase_block_offsets(allt["blk_doc_off"], group_starts),
            "blk_tf_off": _rebase_block_offsets(allt["blk_tf_off"], group_starts),
            "doc_blob": _regroup_binary(allt["doc_blob"], group_starts),
            "tf_blob": _regroup_binary(allt["tf_blob"], group_starts),
            "blk_maxtf": _regroup_binary(allt["blk_maxtf"], group_starts),
            "blk_mindl": _regroup_binary(allt["blk_mindl"], group_starts),
            "term_maxtf": pa.array(np.maximum.reduceat(maxtf, gs[:-1]).astype(np.int64)),
            "term_mindl": pa.array(np.minimum.reduceat(mindl, gs[:-1]).astype(np.int64)),
            "pos_blob": _regroup_binary(allt["pos_blob"], group_starts),
            "blk_pos_off": pos_off_merge(allt["blk_pos_off"], group_starts),
        },
        schema=SEGMENT_SCHEMA,
    )


def _merge_tpart(
    index_dir: str,
    tpart: int,
    prior_partitions: dict,
    resume: bool,
    expected_inputs: dict[str, str] | None = None,
) -> list[dict]:
    """Merge one tpart's range files into its immutable segment + DF rows.

    Pure concatenation per term: range files are read in ascending range_id
    order and each term's blocks/blobs are appended with offset rebasing —
    doc ranges are disjoint and ordered so postings stay doc_id-sorted."""
    import pyarrow.parquet as pq

    part_dir = os.path.join(index_dir, "postings", f"tpart-{tpart:03d}")
    seg_path = os.path.join(index_dir, "segments", f"seg-{tpart:03d}.parquet")
    key = os.path.relpath(seg_path, index_dir)
    df_path = os.path.join(index_dir, "df", f"df-{tpart:03d}.parquet")
    df_key = os.path.relpath(df_path, index_dir)
    # merge exactly this run's inputs — never whatever happens to be on disk
    # (stale ranges from a previous, larger corpus must not leak in)
    if expected_inputs is not None:
        files = sorted(expected_inputs)
    else:
        files = sorted(os.listdir(part_dir)) if os.path.isdir(part_dir) else []
    if (
        resume
        and partition_is_valid(seg_path, prior_partitions.get(key))
        and partition_is_valid(df_path, prior_partitions.get(df_key))
        and (
            expected_inputs is None
            or prior_partitions.get(key, {}).get("inputs") == expected_inputs
        )
    ):
        e = dict(prior_partitions[key])
        e.update(key=key, skipped=True)
        de = dict(prior_partitions[df_key])
        de.update(key=df_key, skipped=True)
        return [e, de]
    t0 = time.monotonic()
    tables = [pq.read_table(os.path.join(part_dir, f)) for f in files]
    tables = [t for t in tables if t.num_rows]
    if tables:
        merged = _merge_range_tables(tables)
    else:
        merged = pa.table({k: [] for k in SEGMENT_SCHEMA.names}, schema=SEGMENT_SCHEMA)
    terms = merged["term"].to_pylist()
    n_per_term = merged["n"].to_numpy()
    entry = atomic_write_table(merged, seg_path)
    # Heavy-hitter observability (VERDICT r02 item 9): the largest posting
    # lists per tpart are exactly the skew signal needed to tune
    # DOC_RANGE_SIZE / n_term_partitions on a real cluster without reading
    # segments back.
    if len(n_per_term):
        top_idx = np.argsort(-n_per_term)[:10]
        top_df = [[terms[i], int(n_per_term[i])] for i in top_idx]
        max_df = int(n_per_term.max())
    else:
        top_df, max_df = [], 0
    entry.update(
        key=key, kind="segment", tpart=tpart, n_terms=len(terms),
        n_postings=int(n_per_term.sum()),
        max_df=max_df, top_df=top_df,
        merge_ms=round((time.monotonic() - t0) * 1000, 3),
        inputs=expected_inputs or {}, skipped=False,
    )
    # DF falls out of the merge: one posting per (term, doc) => df = n.
    df_tbl = pa.table(
        {"term": merged["term"], "df": pa.array(n_per_term.astype(np.int64))}
    )
    df_entry = atomic_write_table(df_tbl, df_path)
    df_entry.update(key=df_key, kind="df", tpart=tpart, skipped=False)
    return [entry, df_entry]


def run_tpart_merges(
    index_dir: str,
    inputs_by_tpart: dict[int, dict[str, str]],
    prior_parts: dict,
    resume: bool,
    tparts: list[int] | None = None,
) -> list[dict]:
    """Drive ``_merge_tpart`` as one Ray task per tpart and return the
    decoded manifest entries — the shared merge driver for build, append
    and ``merge_indexes`` (three call sites, one block to change)."""
    if tparts is None:
        tparts = sorted(inputs_by_tpart)
    return [
        json.loads(r["entry"])
        for r in ray.data.from_items([{"tpart": t} for t in tparts])
        .map_batches(
            lambda b: _entry_table(
                [
                    e
                    for t in b["tpart"].to_pylist()
                    for e in _merge_tpart(
                        index_dir, int(t), prior_parts, resume,
                        inputs_by_tpart[int(t)],
                    )
                ]
            ),
            batch_format="pyarrow",
            batch_size=1,
        )
        .take_all()
    ]


def build_index(
    ds: ray.data.Dataset,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    resume: bool = True,
    lineage: dict | None = None,
    n_term_partitions: int | None = None,
    store_positions: bool = False,
    precompute_bigrams: int | list[tuple[str, str]] = 0,
) -> dict:
    """Build the full index from a Dataset(id, text, …); returns the manifest.

    Single streaming pass over the corpus; nothing is materialized
    driver-side except manifest entries and the (term, df) vocabulary files.

    ``n_term_partitions`` sizes the segment layout to the cluster (merge
    parallelism = segment count = this value); it defaults to
    ``schema.N_TERM_PARTITIONS`` and is recorded in the manifest — resuming
    with a different value triggers a full rebuild (partition assignment
    changes every file).

    ``store_positions`` additionally records each posting's token positions
    (``pos_blob``) enabling exact phrase queries (``IndexReader.phrase_topk``)
    at ~the cost of one extra varint per token in the shuffle and on disk;
    BM25 paths are unaffected.  Recorded in the manifest — resuming with a
    different value triggers a full rebuild.

    ``precompute_bigrams=K`` additionally materializes posting lists for the
    K highest-document-frequency adjacent token pairs as composite terms
    ("w1 w2"), selected by a pre-pass (``phrases.top_bigrams_by_df``) and
    recorded in ``bigrams.parquet``: a two-term phrase query whose pair is
    precomputed becomes a normal posting lookup instead of a position-stream
    decode — the stopword-pair ("of the") cold path that otherwise decodes
    two df≈N position streams.  Doc lengths/norms count unigrams only, so
    BM25 scores are unchanged.  Recorded in the manifest — resuming with a
    different value triggers a full rebuild.

    ``precompute_bigrams`` also accepts an EXPLICIT pair list: the
    selection pre-pass is skipped and exactly those pairs are indexed as
    composite terms.  This is the frozen-set pattern for multi-index
    workflows (``merge_indexes`` requires every input to share one pair
    set; ``append_index`` reuses the build's set the same way) — select
    once on the first crawl, pass the list to every later crawl's build.
    """
    explicit_pairs: list[tuple[str, str]] | None = None
    if not isinstance(precompute_bigrams, int):
        explicit_pairs = [tuple(p) for p in precompute_bigrams]
        precompute_bigrams = len(explicit_pairs)
    n_tparts = int(n_term_partitions or N_TERM_PARTITIONS)
    prior = load_manifest(index_dir) if resume else None
    if prior is not None and prior.get("version") != MANIFEST_VERSION:
        prior = None  # older segment format — never resume across versions
    if prior is not None and prior.get("stats", {}).get("n_term_partitions") != n_tparts:
        prior = None  # different partitioning — every partition is stale
    if prior is not None and bool(
        prior.get("stats", {}).get("store_positions", False)
    ) != bool(store_positions):
        prior = None  # positional layout differs — every file is stale
    if prior is not None and int(
        prior.get("stats", {}).get("precompute_bigrams", 0)
    ) != int(precompute_bigrams):
        prior = None  # composite-term set differs — postings content changes
    if prior is not None and explicit_pairs is not None:
        from wikirec_ray.state.segments import load_bigram_pairs

        if set(load_bigram_pairs(index_dir)) != set(explicit_pairs):
            prior = None  # same count, different pairs — content changes
    prior_parts = (prior or {}).get("partitions", {})
    t_start = time.monotonic()

    # Size shuffle parallelism to the cluster: the default min_parallelism
    # (200) makes every sort/groupby pay ~200 reduce tasks of fixed overhead
    # even when the cluster has 8 CPUs — measured 2× slowdown on the wide
    # step at this scale.  Restored on exit.
    import ray as _ray
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev_min_parallelism = ctx.min_parallelism
    try:
        ncpu = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        ctx.min_parallelism = max(ncpu, 16)
    except Exception:
        pass
    try:
        return _build_index_inner(
            ds, index_dir, id_col, text_col, resume, lineage, prior_parts, t_start,
            n_tparts, store_positions, precompute_bigrams, explicit_pairs,
        )
    finally:
        ctx.min_parallelism = prev_min_parallelism


def _build_index_inner(
    ds, index_dir, id_col, text_col, resume, lineage, prior_parts, t_start,
    n_tparts, store_positions=False, precompute_bigrams=0, explicit_pairs=None,
) -> dict:
    # -- optional pre-pass: select + broadcast the frequent-bigram set ----
    # (one extra streaming read of the corpus and one pair-vocabulary-sized
    # groupby; the pair list is ray.put once and memoized per worker).
    # An explicit pair list skips the selection — the frozen-set pattern
    # for cross-index consistency (merge_indexes / append_index).
    bigram_pairs: list[tuple[str, str]] = []
    bigram_ref = None
    if precompute_bigrams:
        from wikirec_ray.stages.phrases import top_bigrams_by_df

        if explicit_pairs is not None:
            bigram_pairs = list(explicit_pairs)
        else:
            bigram_pairs = top_bigrams_by_df(ds, int(precompute_bigrams), text_col)
        if bigram_pairs:
            import ray as _ray_put

            bigram_ref = _ray_put.put(bigram_pairs)

    # -- the single shuffle: postings + norms in one groupby -------------
    runs = ds.map_batches(
        lambda b: _postings_batch(b, id_col, text_col, n_tparts, store_positions,
                                  bigram_ref),
        batch_format="pyarrow",
        batch_size=4096,  # bigger batches → fewer partial runs in the shuffle
    )
    entries = [
        json.loads(r["entry"])
        for r in runs.groupby(["tpart", "range_id"])
        .map_groups(make_group_encoder(index_dir, prior_parts, resume,
                                       store_positions),
                    batch_format="pyarrow")
        .take_all()
    ]
    norm_entries = [e for e in entries if e["kind"] == "norms"]
    post_entries = [e for e in entries if e["kind"] == "postings"]
    n_docs = sum(e["n_docs"] for e in norm_entries)
    total_tokens = sum(e["sum_dl"] for e in norm_entries)
    avgdl = (total_tokens / n_docs) if n_docs else 0.0

    # -- merge: one task per tpart, no shuffle ---------------------------
    # lineage: a segment may be reused only if the exact set+hash of its
    # input postings partitions is unchanged since it was built
    tparts = sorted({e["tpart"] for e in post_entries})
    inputs_by_tpart: dict[int, dict[str, str]] = {t: {} for t in tparts}
    for e in post_entries:
        inputs_by_tpart[e["tpart"]][os.path.basename(e["key"])] = e["md5"]
    merge_entries = run_tpart_merges(index_dir, inputs_by_tpart, prior_parts, resume)

    # -- persist the bigram pair set the postings were built with ---------
    bigram_entries: list[dict] = []
    bigrams_path = os.path.join(index_dir, "bigrams.parquet")
    if precompute_bigrams:
        big_tbl = pa.table(
            {
                "w1": pa.array([a for a, _ in bigram_pairs], pa.string()),
                "w2": pa.array([b for _, b in bigram_pairs], pa.string()),
            }
        )
        bigram_entries = [
            dict(atomic_write_table(big_tbl, bigrams_path),
                 key="bigrams.parquet", kind="bigrams")
        ]
    elif os.path.exists(bigrams_path):
        os.remove(bigrams_path)  # stale set from a differently-configured build

    # pending deletes (lifecycle.delete_docs) survive a heal/resume build:
    # tombstones are INDEX state (a removal promise), not build input — a
    # valid prior overlay is carried forward; anything else (fresh build,
    # torn file, no prior manifest) resets the overlay
    tomb_path = os.path.join(index_dir, "tombstones.parquet")
    prior_tomb = prior_parts.get("tombstones.parquet")
    tomb_entries: list[dict] = []
    if prior_tomb is not None and partition_is_valid(tomb_path, prior_tomb):
        tomb_entries = [dict(prior_tomb, key="tombstones.parquet", skipped=True)]
    elif resume and os.path.exists(tomb_path):
        # overlay out of step with the manifest: a crash between
        # delete_docs' atomic file rename and its manifest save.  The file
        # is a complete superset of every ACKNOWLEDGED delete (it only ever
        # grows between compactions), so the heal must carry it forward —
        # rewritten to refresh the entry — not discard it.  Only an
        # unreadable overlay (real corruption) is dropped.
        from wikirec_ray.state.segments import load_tombstones, write_tombstones

        try:
            pending = load_tombstones(index_dir)
        except Exception:
            pending = None
        if pending is not None and len(pending):
            tomb_entries = [write_tombstones(index_dir, pending)]
        else:
            os.remove(tomb_path)
    elif os.path.exists(tomb_path):
        os.remove(tomb_path)  # fresh build (resume=False) resets the overlay

    stats = {
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": avgdl,
        "k1": BM25_K1,
        "b": BM25_B,
        "n_term_partitions": n_tparts,
        "doc_range_size": DOC_RANGE_SIZE,
        "block_size": BLOCK_SIZE,
        "store_positions": bool(store_positions),
        "precompute_bigrams": int(precompute_bigrams),
        "n_bigrams": len(bigram_pairs),
        "n_tombstones": int(tomb_entries[0]["n_tombstones"]) if tomb_entries else 0,
    }
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)

    manifest = {
        "version": MANIFEST_VERSION,
        "stats": stats,
        "lineage": lineage or {},
        "build_wall_s": round(time.monotonic() - t_start, 3),
        "partitions": {
            e["key"]: {k: v for k, v in e.items() if k != "key"}
            for e in entries + merge_entries + bigram_entries + tomb_entries
        },
    }
    save_manifest(index_dir, manifest)
    return manifest


def append_index(
    delta_ds: ray.data.Dataset,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lineage: dict | None = None,
) -> dict:
    """Append-only incremental ingest: stream ONLY the delta corpus into an
    existing index.  ``build_index(resume=True)`` over base+delta re-reads
    and re-shuffles everything and merely skips the encode of unchanged
    partitions; this path reads just the new docs — on a 100 TB index with
    a 1 % crawl append that is the difference between re-streaming 100 TB
    and streaming 1 TB.

    Contract: delta docs carry doc_ids NOT present in the index (enforced —
    overlapping ids raise; apply edits via a full ``resume=True`` build).
    Only the (tpart, doc-range) partitions a delta doc touches are decoded,
    merged and atomically rewritten; segments re-merge only for touched
    tparts (pure concatenation).  Merged partitions record the same logical
    fingerprint a full build over base+delta would, so appends and full
    input-aware resumes compose in any order.  A failed append never saves
    a manifest: partially rewritten partitions then fail the manifest md5
    check and heal on the next ``resume=True`` build."""
    prior = load_manifest(index_dir)
    if prior is None or prior.get("version") != MANIFEST_VERSION:
        raise ValueError(
            f"append_index needs an existing v{MANIFEST_VERSION} manifest at "
            f"{index_dir}; run build_index first"
        )
    stats0 = prior["stats"]
    if (stats0.get("doc_range_size"), stats0.get("block_size")) != (
        DOC_RANGE_SIZE, BLOCK_SIZE
    ):
        raise ValueError(
            "append_index: index was built with different doc_range/block "
            "sizes — partition keys would not line up; rebuild"
        )
    n_tparts = int(stats0["n_term_partitions"])
    store_positions = bool(stats0.get("store_positions", False))
    prior_parts = prior["partitions"]

    # delta docs must emit composite postings for the SAME pair set the
    # index was built with (frozen at build time — appends never re-rank
    # the top-K; a full rebuild refreshes the selection)
    bigram_ref = None
    if int(stats0.get("precompute_bigrams", 0)):
        from wikirec_ray.state.segments import load_bigram_pairs

        bp = os.path.join(index_dir, "bigrams.parquet")
        if not partition_is_valid(bp, prior_parts.get("bigrams.parquet")):
            raise ValueError(
                "append_index: bigrams.parquet is missing or fails its "
                "manifest md5 — heal with a full build_index(resume=True)"
            )
        pairs = load_bigram_pairs(index_dir)
        if pairs:
            import ray as _ray_put

            bigram_ref = _ray_put.put(pairs)
    t_start = time.monotonic()

    import ray as _ray
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev_min_parallelism = ctx.min_parallelism
    try:
        ncpu = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        ctx.min_parallelism = max(ncpu, 16)
    except Exception:
        pass
    try:
        runs = delta_ds.map_batches(
            lambda b: _postings_batch(b, id_col, text_col, n_tparts,
                                      store_positions, bigram_ref),
            batch_format="pyarrow",
            batch_size=4096,
        )
        touched = [
            json.loads(r["entry"])
            for r in runs.groupby(["tpart", "range_id"])
            .map_groups(make_delta_merger(index_dir, prior_parts,
                                          store_positions),
                        batch_format="pyarrow")
            .take_all()
        ]
    finally:
        ctx.min_parallelism = prev_min_parallelism

    touched_keys = {e["key"] for e in touched}
    kept = [
        dict(v, key=k, skipped=True)
        for k, v in prior_parts.items()
        if k not in touched_keys and v.get("kind") in ("norms", "postings")
    ]
    norm_entries = [e for e in touched + kept if e["kind"] == "norms"]
    post_entries = [e for e in touched + kept if e["kind"] == "postings"]
    n_docs = sum(e["n_docs"] for e in norm_entries)
    total_tokens = sum(e["sum_dl"] for e in norm_entries)

    # re-merge ONLY the tparts the delta touched; other segments are kept
    touched_tparts = sorted({e["tpart"] for e in touched if e["kind"] == "postings"})
    inputs_by_tpart: dict[int, dict[str, str]] = {t: {} for t in touched_tparts}
    for e in post_entries:
        if e["tpart"] in inputs_by_tpart:
            inputs_by_tpart[e["tpart"]][os.path.basename(e["key"])] = e["md5"]
    merge_entries = run_tpart_merges(
        index_dir, inputs_by_tpart, prior_parts, True, tparts=touched_tparts
    )
    kept_meta = [
        dict(v, key=k, skipped=True)
        for k, v in prior_parts.items()
        if (v.get("kind") in ("segment", "df") and v.get("tpart") not in set(touched_tparts))
        or v.get("kind") in ("bigrams", "tombstones")
        # tombstones carry through an append untouched: the delta-overlap
        # check above already rejects re-adding a deleted id (its norms row
        # survives until compaction), and stats stay frozen-per-contract
    ]

    stats = dict(
        stats0,
        n_docs=n_docs,
        total_tokens=total_tokens,
        avgdl=(total_tokens / n_docs) if n_docs else 0.0,
    )
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    manifest = {
        "version": MANIFEST_VERSION,
        "stats": stats,
        "lineage": lineage or dict(prior.get("lineage") or {}),
        "build_wall_s": round(time.monotonic() - t_start, 3),
        "partitions": {
            e["key"]: {k: v for k, v in e.items() if k != "key"}
            for e in touched + kept + merge_entries + kept_meta
        },
    }
    save_manifest(index_dir, manifest)
    return manifest
