"""Schemas and engine-wide constants.

The primary input is a Common-Crawl-style web-page table (the graft
``input_hint``)::

    url: string (unique key)   warc_ts: timestamp[us]
    html: binary               text: string          lang: string

which replaces the reference's positional ``(title, text, wikilinks)``
article tuple (``/root/reference/src/wikirec/data_utils.py:204-241``) — ``url``
is the document key where wikirec used the list position / title.
"""

from __future__ import annotations

import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Okapi BM25 parameters pinned by the north rule.
BM25_K1 = 1.5
BM25_B = 0.75

# Tokenizer: lowercase + split on runs of non-alphanumeric characters.
# Chosen because it is exactly expressible both as vectorized Arrow kernels
# (pc.utf8_lower + pc.split_pattern_regex) and as ANSI SQL
# (string_split_regex(lower(text), '[^a-z0-9]+')), which is what lets the
# DuckDB oracle validate every downstream operator.  The reference's richer
# 7-step cleaning chain (data_utils.py:670-1008) is implemented separately in
# stages/analyze.py (wikirec_clean) behind config flags, mirroring clean()'s
# parameters.
TOKEN_SPLIT_REGEX = "[^a-z0-9]+"

# Largest NEAR proximity window any retrieval path accepts.  The proximity
# kernels build composite (candidate, position) int64 keys whose position
# component carries through a +window step, so window must stay below 2^31;
# a window this size already degrades to conjunctive AND (no doc has 2^31
# tokens).  near_topk (local and served) REJECTS larger windows; the
# query-string surface (parse_query) CLAMPS to this instead, because a
# user-facing parser must not raise on user-controlled input.  All three
# sites share this constant so the raise/clamp boundary cannot drift.
NEAR_WINDOW_MAX = (1 << 31) - 1

# Wildcard (trailing-*) queries rewrite a prefix to its highest-df
# completions, capped — Lucene's TopTermsRewrite bound: an unbounded
# rewrite of a one-letter prefix over a crawl vocabulary would OR
# millions of terms into one query.  The cap is deterministic (df desc,
# term asc), so the dropped tail is the lowest-signal one.
PREFIX_EXPANSION_MAX = 128

# Fuzzy (~d) retrieval caps each query-term OCCURRENCE's vocabulary
# neighborhood to its highest-df members before scoring — Lucene
# FuzzyQuery's maxExpansions bound: at distance 2 over a crawl
# vocabulary a short typo's neighborhood is O(10^2-10^3) terms, and an
# uncapped OR of them turns one typo into a df≈N disjunction.  Same
# deterministic order as the prefix cap (df desc, term asc — the
# neighborhood's native order, so the cap is a truncation).
# ``fuzzy_expand`` itself stays uncapped (it is the introspection /
# oracle surface); only retrieval truncates.
FUZZY_EXPANSION_MAX = 128

# Index layout knobs.
N_TERM_PARTITIONS = 32  # tpart = hash(term) % N_TERM_PARTITIONS
DOC_RANGE_SIZE = 8192  # salt: doc_id // DOC_RANGE_SIZE bounds shuffle groups
BLOCK_SIZE = 128  # postings per block-max block


def term_partition_expr():
    """Deterministic term -> partition id, stable across processes."""
    # zlib.crc32 is stable (unlike hash()) and fast; used everywhere a term
    # must map to the same partition in different worker processes.
    import zlib

    def tpart(term: str) -> int:
        return zlib.crc32(term.encode("utf-8")) % N_TERM_PARTITIONS

    return tpart
