"""Vocabulary-level query helpers: prefix suggestions (autocomplete) and
fuzzy term expansion (typo-tolerant retrieval).

Both operate on the index's (term, df) vocabulary — the same O(vocab)
state the df sidecar already materializes (``df/df-*.parquet``) — not on
postings, so they are cheap to host anywhere the df files are readable.
At cluster scale the vocabulary is tpart-sharded; a suggest/fuzzy tier
loads only its tparts' df files (``load_df_tparts``) and the coordinator
merges per-shard top-k — each term lives in exactly ONE tpart, so the
merge is a plain concatenation, never a re-aggregation.

- ``PrefixIndex``: sorted term array + aligned df array; a prefix lookup
  is two ``searchsorted`` probes and a vectorized top-k over the matched
  slice (count-desc, term-asc — the deterministic autocomplete order).
- ``SuffixIndex``: the same two-probe shape over REVERSED terms (Lucene's
  ReverseStringFilter trick for leading wildcards: ``*tion`` is a prefix
  probe on the reversed vocabulary); matches map back through the stored
  permutation, so selection keeps the engine-wide (df desc, TERM asc)
  order — not reversed-term order — and local/served results agree.
- ``FuzzyIndex``: SymSpell-style deletion neighborhood for edit distance
  ≤ ``max_d`` (1 or 2 — the Lucene FuzzyQuery range).  Each vocabulary
  term is indexed under itself and its ≤ max_d-deletion variants; a query
  probes its own variants and VERIFIES true edit distance (the deletion
  trick overgenerates: "ab"/"ba" share deletions at distance 2), so
  expansion equals DuckDB ``levenshtein(q, t) <= max_d`` exactly — the
  property the driver oracle pins.  The d=2 index is ~O(len²/2) variants
  per term (≈ 40 dict entries for an 8-char term); ``Lexicon`` builds
  each distance's index lazily, so corpora that never see a ``~2`` query
  never pay it.
- ``Lexicon.regex_terms``: whole-term regex matching (Lucene RegexpQuery)
  as one vectorized anchored-RE2 pass over the term array — the same RE2
  DuckDB's ``regexp_full_match`` runs, which is what makes the driver
  oracle exact.

The reference engine's only lexical tolerance is fuzzy argument
suggestions over a fixed option list (K3,
/root/reference/src/wikirec/utils.py:21-57); these bring the same idea
to the query path itself, Lucene FuzzyQuery / suggester style.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "Lexicon",
    "PrefixIndex",
    "SuffixIndex",
    "FuzzyIndex",
    "edit_distance_le1",
    "edit_distance_le",
]

FUZZY_MAX_D = 2  # Lucene FuzzyQuery's ceiling; parse_query shares it


def edit_distance_le1(a: str, b: str) -> bool:
    """True iff levenshtein(a, b) <= 1 (O(len) scan, no DP table)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return False
                seen = True
        return True
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def edit_distance_le(a: str, b: str, maxd: int) -> bool:
    """True iff levenshtein(a, b) <= maxd.  maxd<=1 uses the O(len) scan;
    larger bounds run the classic DP row with early abandon when a whole
    row exceeds the bound (tokens are short, so O(len²) per verify over a
    handful of SymSpell candidates is nothing)."""
    if maxd <= 0:
        return a == b
    if maxd == 1:
        return edit_distance_le1(a, b)
    la, lb = len(a), len(b)
    if abs(la - lb) > maxd:
        return False
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != b[j - 1]),
            )
        if min(cur) > maxd:
            return False
        prev = cur
    return prev[lb] <= maxd


class Lexicon:
    """The query-surface wrapper both ``IndexReader`` and the served
    ``DfResolver`` share: one (term, df) vocabulary, two lazily built
    sub-indexes.  It owns the surface contract so local and served
    results cannot diverge: input is lowercased (the analyzer lowers
    before tokenizing, so the vocabulary is all-lowercase — an uppercase
    prefix/typo must still match), and composite precomputed-bigram
    terms ("w1 w2") are excluded (an internal phrase fast path, not
    user-facing vocabulary).  PrefixIndex and FuzzyIndex build
    independently on first use — an autocomplete-only caller never pays
    the SymSpell deletion-dict build, and vice versa."""

    def __init__(self, df: dict[str, int]):
        self._uni = {t: n for t, n in df.items() if " " not in t}
        self._prefix: PrefixIndex | None = None
        self._suffix: SuffixIndex | None = None
        self._fuzzy: dict[int, FuzzyIndex] = {}  # per-distance, lazy
        self._pa_terms = None  # Arrow view of the term array (regex scans)

    def suggest(self, prefix: str, k: int = 10) -> list[tuple[str, int]]:
        if self._prefix is None:
            self._prefix = PrefixIndex(self._uni)
        return self._prefix.suggest(prefix.lower(), k)

    def suggest_suffix(self, suffix: str, k: int = 10) -> list[tuple[str, int]]:
        if self._suffix is None:
            # build (or reuse) the prefix index first and share its
            # forward arrays — one (terms, dfs) pair serves both
            # wildcard directions
            if self._prefix is None:
                self._prefix = PrefixIndex(self._uni)
            self._suffix = SuffixIndex(
                self._uni,
                arrays=(self._prefix._terms, self._prefix._dfs),
            )
        return self._suffix.suggest(suffix.lower(), k)

    def regex_terms(self, pattern: str, k: int = 10) -> list[tuple[str, int]]:
        """Top-k (term, df) vocabulary terms FULLY matching ``pattern``
        (Lucene RegexpQuery semantics: the pattern is anchored to the
        whole term), highest df first, ties term-ascending.  The scan is
        one vectorized RE2 pass (``pyarrow.compute.match_substring_regex``
        on an anchored pattern) over this lexicon's term array — O(vocab)
        per query, which is the per-shard vocabulary slice at cluster
        scale (Lucene instead intersects a compiled automaton with the
        term dictionary; the full scan is the simple exact equivalent at
        sidecar-vocabulary sizes).  The pattern is passed VERBATIM — no
        lowercasing, since case-mangling regex escapes like ``\\W`` would
        silently change semantics; the vocabulary is all-lowercase, so
        uppercase literals simply match nothing.  An invalid pattern
        raises ``ValueError``."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if self._prefix is None:
            self._prefix = PrefixIndex(self._uni)
        if self._pa_terms is None:
            self._pa_terms = pa.array(self._prefix._terms, pa.string())
        try:
            mask = pc.match_substring_regex(
                self._pa_terms, f"^(?:{pattern})$"
            )
        except pa.lib.ArrowInvalid as exc:
            raise ValueError(f"invalid regex pattern {pattern!r}: {exc}")
        idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
        if not len(idx):
            return []
        return _topk_df_term_asc(
            self._prefix._terms[idx], self._prefix._dfs[idx], k
        )

    def expand(self, term: str, d: int = 1) -> list[tuple[str, int]]:
        # any already-built index of depth >= d answers a distance-d
        # query (probe depth and verify distance are per-call), so a
        # mixed ~/~2 workload builds ONE deletion dict, not one per
        # distance; a shallower-only cache still builds the deeper one.
        built = max(self._fuzzy, default=0)
        if built < d:
            built = d
            self._fuzzy[d] = FuzzyIndex(self._uni, max_d=d)
        return self._fuzzy[built].expand(term.lower(), d)

    def expand_many(
        self, items: list[str | tuple[str, int]], cap: int | None = None
    ) -> list[list[tuple[str, int]]]:
        """Per item, the (term, df) neighborhood.  An item is either a
        plain term (distance 1) or a (term, distance) pair — the shape
        ``parse_query`` emits for ``term~`` vs ``term~2``.  ``cap``
        truncates each neighborhood to its top entries (the df desc /
        term asc head) — retrieval callers pass FUZZY_EXPANSION_MAX so
        served shards never ship the full d=2 neighborhood."""
        out = []
        for it in items:
            t, d = it if isinstance(it, tuple) else (it, 1)
            exp = self.expand(t, d)
            out.append(exp if cap is None else exp[:cap])
        return out


def _topk_df_term_asc(
    terms: np.ndarray, dfs: np.ndarray, k: int
) -> list[tuple[str, int]]:
    """Top-k (term, df) by (df desc, term asc) over TERM-ASCENDING-aligned
    arrays.  Cut to exactly k candidates BEFORE any Python-level sort:
    ties at the kth df are broken term-ascending, and ascending array
    position IS term order, so ascending ``flatnonzero`` order is the tie
    rule — a flat-df long tail (100k terms of df=1) costs O(range) numpy
    scans + an O(k log k) sort, not an O(range log range) Python sort."""
    if k <= 0 or len(terms) == 0:
        return []
    if len(terms) > k:
        kth = -np.partition(-dfs, k - 1)[k - 1]
        above = np.flatnonzero(dfs > kth)
        ties = np.flatnonzero(dfs == kth)[: k - len(above)]
        idx = np.concatenate([above, ties])
    else:
        idx = np.arange(len(terms))
    order = sorted(idx.tolist(), key=lambda i: (-int(dfs[i]), terms[i]))[:k]
    return [(str(terms[i]), int(dfs[i])) for i in order]


class PrefixIndex:
    """Autocomplete over a (term -> df) vocabulary."""

    def __init__(self, df: dict[str, int]):
        terms = sorted(df)
        self._terms = np.array(terms, dtype=object)
        # plain object-array compare in searchsorted is fine at vocab size;
        # dfs aligned so the top-k over a matched slice stays vectorized
        self._dfs = np.array([df[t] for t in terms], dtype=np.int64)

    def suggest(self, prefix: str, k: int = 10) -> list[tuple[str, int]]:
        """Top-k (term, df) completions of ``prefix``: highest df first,
        ties term-ascending.  Empty prefix ranks the whole vocabulary
        (the "trending terms" degenerate case); absent prefix -> []."""
        lo = int(np.searchsorted(self._terms, prefix))
        # the upper bound of the prefix range: prefix + a character above
        # any valid token char (tokens are [a-z0-9], so '\x7f' majorizes)
        hi = int(np.searchsorted(self._terms, prefix + "\x7f")) if prefix else len(self._terms)
        if hi <= lo:
            return []
        return _topk_df_term_asc(self._terms[lo:hi], self._dfs[lo:hi], k)


class SuffixIndex:
    """Leading-wildcard (``*tion``) completion over a (term -> df)
    vocabulary: Lucene's ReverseStringFilter trick — a suffix of the term
    is a prefix of its reversal, so the probe is two ``searchsorted``
    calls on the reversed-sorted vocabulary.  Matches map back through
    the stored permutation and selection runs in TERM-ascending order,
    keeping the engine-wide deterministic (df desc, term asc) contract —
    NOT reversed-term order, so per-shard top-k merges agree with a
    global index."""

    def __init__(
        self, df: dict[str, int],
        arrays: tuple[np.ndarray, np.ndarray] | None = None,
    ):
        # ``arrays`` = a PrefixIndex's (terms, dfs) pair (term-ascending
        # aligned) — Lexicon passes it so the forward arrays are shared,
        # not rebuilt, when both wildcard directions are in use
        if arrays is not None:
            self._terms, self._dfs = arrays
        else:
            terms = sorted(df)
            self._terms = np.array(terms, dtype=object)
            self._dfs = np.array([df[t] for t in terms], dtype=np.int64)
        rev_order = sorted(
            range(len(self._terms)), key=lambda i: self._terms[i][::-1]
        )
        self._rev_terms = np.array(
            [self._terms[i][::-1] for i in rev_order], dtype=object
        )
        self._rev_to_orig = np.array(rev_order, dtype=np.int64)

    def suggest(self, suffix: str, k: int = 10) -> list[tuple[str, int]]:
        """Top-k (term, df) with ``term.endswith(suffix)``: highest df
        first, ties term-ascending.  Empty suffix ranks the whole
        vocabulary; absent suffix -> []."""
        rq = suffix[::-1]
        if not rq:
            # whole-vocabulary ranking: zero-copy over the forward
            # arrays, no permutation sort/gather
            return _topk_df_term_asc(self._terms, self._dfs, k)
        lo = int(np.searchsorted(self._rev_terms, rq))
        hi = int(np.searchsorted(self._rev_terms, rq + "\x7f"))
        if hi <= lo:
            return []
        orig = np.sort(self._rev_to_orig[lo:hi])  # ascending == term asc
        return _topk_df_term_asc(self._terms[orig], self._dfs[orig], k)


class FuzzyIndex:
    """Edit-distance-<= max_d term expansion (SymSpell deletion
    neighborhood): if levenshtein(q, t) <= d then some <= d-deletion
    variant of q equals some <= d-deletion variant of t, so indexing all
    variants of the vocabulary and probing all variants of the query is a
    complete candidate generator; true distance is then re-verified."""

    def __init__(self, df: dict[str, int], max_d: int = 1):
        if not 1 <= max_d <= FUZZY_MAX_D:
            raise ValueError(f"max_d must be in [1, {FUZZY_MAX_D}]")
        self._df = df
        self._max_d = max_d
        index: dict[str, list[str]] = {}
        for t in df:
            for v in self._dels(t, max_d):
                index.setdefault(v, []).append(t)
        self._index = index

    @staticmethod
    def _dels(s: str, d: int) -> set[str]:
        """``s`` plus every variant reachable by <= d deletions."""
        out = {s}
        frontier = {s}
        for _ in range(d):
            frontier = {
                v[:i] + v[i + 1:] for v in frontier for i in range(len(v))
            }
            out |= frontier
        return out

    def expand(self, term: str, d: int | None = None) -> list[tuple[str, int]]:
        """Vocabulary terms within edit distance ``d`` (default: max_d,
        which also bounds it) of ``term``, as (term, df) pairs ordered
        (df desc, term asc) — exactly the set ``levenshtein(term, t) <= d``
        selects.  Candidates from the deletion neighborhood are
        re-verified, killing the "ab"~"ba" false positives the trick
        generates; probing a depth-max_d index at a SHALLOWER query depth
        stays complete (levenshtein(q,t) <= d yields a common string
        within d <= max_d deletions of both sides)."""
        if d is None:
            d = self._max_d
        if not 1 <= d <= self._max_d:
            raise ValueError(f"d must be in [1, {self._max_d}]")
        cands: set[str] = set()
        for key in self._dels(term, d):
            cands.update(self._index.get(key, ()))
        hits = [t for t in cands if edit_distance_le(term, t, d)]
        hits.sort(key=lambda t: (-self._df[t], t))
        return [(t, self._df[t]) for t in hits]
