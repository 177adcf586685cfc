"""Web-corpus curation filters — the Common-Crawl-side operators a 100 TB
training-data pipeline applies before anything else ingests (C4, Raffel et
al. 2020 §2.2; Gopher rules, Rae et al. 2021 Appendix A).  The reference
has no analog (it starts from curated wiki dumps); these extend the
quality family of ``pipelines/textstats``.

- ``domain_caps`` — bound any single registrable domain's share of the
  corpus: extract the domain from ``url``, ONE hash-partitioned shuffle on
  it, keep the ``max_per_domain`` lowest doc ids per domain
  (deterministic, so re-runs and the test oracle agree).  This is the
  standard anti-spam/anti-SEO-farm cap.
- ``line_dup_ratio`` — per-doc fraction of repeated lines (the line-level
  member of C4's repetition rules): docs dominated by boilerplate
  navigation/footer lines score high and get dropped.
- ``gopher_quality_mask`` — the classic per-doc heuristics: word count in
  [min, max], mean word length in [3, 10], symbol-to-word ratio, and
  fraction of lines starting with a bullet — each vectorized per batch,
  emitted as individual boolean columns plus the combined ``keep``.
- ``repetition_ratios`` — Gopher's n-gram repetition signals (top-n-gram
  character fraction, duplicated-n-gram character fraction) with the
  published Table A1 thresholds.
- ``dedup_lines_global`` — C4's cross-document span dedup at line
  granularity (two shuffles; see its docstring).
- ``scrub_pii`` — RefinedWeb-style regex redaction of emails / phones /
  IP addresses with placeholder tokens + per-kind counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from wikirec_ray.functions.partitions import partitioned_map_groups

# The ASCII whitespace class shared by every line-level rule in this module:
# exactly RE2's \s = [\t\n\f\r ] minus \n (lines are \n-split so \n cannot
# occur inside one) — the same class the gopher bullet SQL's '^\s*' uses.
# Pinning an explicit charset keeps the Ray kernels and the DuckDB oracles
# byte-for-byte equivalent: Arrow's utf8_*_whitespace strips UNICODE
# whitespace (NBSP, vertical tab, ...) which DuckDB's trim/regex cannot
# replay.
ASCII_WS = " \t\r\f"


def extract_domain(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized host extraction: scheme://HOST/... -> host (lowercased;
    userinfo and port stripped)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    urls = urls.fill_null("")  # null urls -> '' domain (crash-free caps)
    host = pc.replace_substring_regex(urls, pattern=r"^[a-zA-Z][a-zA-Z0-9+.-]*://", replacement="")
    host = pc.replace_substring_regex(host, pattern=r"[/?#].*$", replacement="")
    # userinfo: 'alice@spam.com' must cap as spam.com, or varying the
    # userinfo string buys a fresh per-domain quota (review r03)
    host = pc.replace_substring_regex(host, pattern=r"^[^@]*@", replacement="")
    host = pc.replace_substring_regex(host, pattern=r":\d+$", replacement="")
    return pc.utf8_lower(host)


# Public-suffix snapshot (publicsuffix.org ICANN section — public data),
# restricted to one- and two-label suffixes so the eTLD+1 rule is a pure
# two-level lookup that the DuckDB oracle replays exactly.  Deliberately the
# ICANN registry view (NOT the private-domains section): the published
# C4/Gopher cap is per REGISTRABLE domain, so 'a.blogspot.com' and
# 'b.blogspot.com' share blogspot.com's quota (VERDICT r03 item 6).  Hosts
# whose TLD is not listed fall back to the full host — a conservative
# superset (finer granularity could only merge quotas, never split them).
PSL_MULTI_SUFFIXES = frozenset(
    """co.uk org.uk ac.uk gov.uk me.uk net.uk ltd.uk plc.uk sch.uk
    com.au net.au org.au edu.au gov.au asn.au id.au
    co.jp or.jp ne.jp ac.jp ad.jp ed.jp go.jp gr.jp lg.jp
    com.br net.br org.br gov.br edu.br art.br
    com.cn net.cn org.cn gov.cn edu.cn ac.cn
    co.in net.in org.in firm.in gen.in ind.in ac.in edu.in gov.in
    co.nz net.nz org.nz govt.nz ac.nz school.nz geek.nz
    co.za net.za org.za gov.za ac.za web.za
    com.mx org.mx net.mx gob.mx edu.mx
    com.ar net.ar org.ar gob.ar edu.ar int.ar
    com.tr net.tr org.tr gov.tr edu.tr web.tr
    co.kr or.kr ne.kr re.kr go.kr ac.kr pe.kr
    com.sg net.sg org.sg gov.sg edu.sg per.sg
    com.hk net.hk org.hk gov.hk edu.hk idv.hk
    com.tw net.tw org.tw gov.tw edu.tw idv.tw
    co.il net.il org.il gov.il ac.il muni.il
    com.ua net.ua org.ua gov.ua edu.ua in.ua
    com.pl net.pl org.pl edu.pl gov.pl waw.pl
    co.th in.th ac.th go.th or.th net.th
    com.my net.my org.my gov.my edu.my
    co.id or.id ac.id go.id web.id my.id
    com.ph net.ph org.ph gov.ph edu.ph
    com.vn net.vn org.vn gov.vn edu.vn
    com.eg net.eg org.eg gov.eg edu.eg
    com.ng net.ng org.ng gov.ng edu.ng
    co.ke or.ke ne.ke go.ke ac.ke
    com.sa net.sa org.sa gov.sa edu.sa
    co.ae net.ae org.ae gov.ae ac.ae""".split()
)
PSL_SINGLE_SUFFIXES = frozenset(
    """com org net edu gov mil int info biz name mobi pro aero asia cat
    coop jobs museum tel travel xxx app dev page io ai co me tv cc ws fm
    am io sh gg je im ly to gl gd vc la nu
    ac ad ae af ag al ar at au aw ax az ba bb bd be bf bg bh bi bj bm bn
    bo br bs bt bw by bz ca cd cf cg ch ci cl cm cn cr cu cv cw cy cz de
    dj dk dm do dz ec ee eg es et eu fi fj fo fr ga ge gf gh gi gm gn gp
    gq gr gt gu gy hk hm hn hr ht hu id ie il in iq ir is it jm jo jp ke
    kg kh ki km kn kp kr kw ky kz lb lc li lk lr ls lt lu lv ma mc md mg
    mh mk ml mm mn mo mp mq mr ms mt mu mv mw mx my mz na nc ne nf ng ni
    nl no np nr om pa pe pf pg ph pk pl pm pn pr ps pt pw py qa re ro rs
    ru rw sa sb sc sd se sg si sk sl sm sn so sr ss st sv sx sy sz td tg
    th tj tk tl tm tn tr tt tw tz ua ug uk us uy uz va ve vg vi vn vu wf
    ye yt za zm zw""".split()
)


def registrable_domain(hosts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """eTLD+1 under the embedded suffix snapshot, vectorized:
    last-two-labels in the multi-label set -> last three labels;
    else last label in the single-label set -> last two labels;
    else (unlisted TLD, bare suffix, single-label host) the full host."""
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    n_dots = pc.count_substring(hosts, ".")
    # greedy ^.*\. leaves exactly the trailing label(s) the tail matches
    last1 = pc.replace_substring_regex(hosts, pattern=r"^.*\.", replacement="")
    last2 = pc.replace_substring_regex(
        hosts, pattern=r"^.*\.([^.]+\.[^.]+)$", replacement=r"\1"
    )
    last3 = pc.replace_substring_regex(
        hosts, pattern=r"^.*\.([^.]+\.[^.]+\.[^.]+)$", replacement=r"\1"
    )
    multi = pa.array(sorted(PSL_MULTI_SUFFIXES), pa.string())
    single = pa.array(sorted(PSL_SINGLE_SUFFIXES), pa.string())
    is_multi = pc.and_(
        pc.is_in(last2, value_set=multi), pc.greater_equal(n_dots, 2)
    )
    is_single = pc.and_(
        pc.is_in(last1, value_set=single), pc.greater_equal(n_dots, 1)
    )
    return pc.if_else(is_multi, last3, pc.if_else(is_single, last2, hosts))


def domain_caps(
    ds: ray.data.Dataset,
    max_per_domain: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    n_parts: int = 64,
    registrable: bool = True,
    keep_domain: bool = False,
) -> ray.data.Dataset:
    """Keep at most ``max_per_domain`` docs per domain (lowest ``id_col``
    wins — deterministic).  One shuffle keyed by a hash of the domain;
    the per-partition cap runs vectorized (lexsort + run ranks).

    ``registrable=True`` caps by eTLD+1 (the published C4 semantic, via the
    embedded suffix snapshot); ``False`` caps by full host.
    ``keep_domain=True`` emits the cap key as a ``domain`` column."""
    import zlib

    if max_per_domain < 1:
        raise ValueError("max_per_domain must be >= 1")

    def add_domain(b: pa.Table) -> pa.Table:
        host = extract_domain(b[url_col])
        return b.append_column(
            "_domain", registrable_domain(host) if registrable else host
        )

    def cap(group: pa.Table) -> pa.Table:
        if "ppart" in group.column_names:
            group = group.drop_columns(["ppart"])
        dom = group["_domain"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy()
        _, codes = np.unique(dom, return_inverse=True)
        order = np.lexsort((ids, codes))
        codes_s = codes[order]
        new = np.ones(len(order), bool)
        new[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(new)
        runs = np.diff(np.concatenate([starts, [len(order)]]))
        rank = np.arange(len(order)) - np.repeat(starts, runs)
        keep = np.sort(order[rank < max_per_domain])
        group = group.take(pa.array(keep))
        if keep_domain:
            return group.rename_columns(
                ["domain" if c == "_domain" else c for c in group.column_names]
            )
        return group.drop_columns(["_domain"])

    def key(b: pa.Table) -> np.ndarray:
        doms = b["_domain"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(doms, return_inverse=True)
        hk = np.fromiter(
            (zlib.crc32(str(u).encode("utf-8")) for u in uniq), np.int64, len(uniq)
        )
        return hk[inv]

    tagged = ds.map_batches(add_domain, batch_format="pyarrow")
    return partitioned_map_groups(tagged, key, cap, n_parts)


def line_dup_ratio(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """(id, n_lines, dup_line_ratio): fraction of a doc's non-empty lines
    that are repeats of an earlier line — one vectorized pass (Arrow line
    split + per-doc group-by over the flat line stream)."""

    def fn(batch: pa.Table) -> pa.Table:
        lines = pc.split_pattern(
            batch[text_col].combine_chunks().fill_null(""), pattern="\n"
        )
        flat = pc.list_flatten(lines)
        parents = pc.list_parent_indices(lines)
        nonempty = pc.not_equal(pc.utf8_trim(flat, ASCII_WS), "")
        flat = flat.filter(nonempty)
        par = parents.filter(nonempty).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        total = np.zeros(n, np.int64)
        np.add.at(total, par, 1)
        distinct = np.zeros(n, np.int64)
        if len(flat):
            g = (
                pa.table({"p": pa.array(par), "l": flat})
                .group_by(["p", "l"])
                .aggregate([])
            )
            np.add.at(distinct, g["p"].to_numpy(), 1)
        dups = total - distinct
        ratio = np.round(
            np.divide(dups, np.maximum(total, 1), dtype=np.float64), 6
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_lines": pa.array(total),
                "dup_line_ratio": pa.array(ratio),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# Gopher rule constants (Rae et al. 2021, Appendix A — public thresholds)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1   # '#' and '…' per word
GOPHER_MAX_BULLET_RATIO = 0.9   # lines starting with a bullet


def _word_stream(texts: pa.Array) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Whitespace words (the published Gopher/C4 accounting, NOT the index
    tokenizer): (flat non-empty words, parent row index int64, word length
    int64) — the single word-extraction kernel shared by every per-doc
    word-statistics rule in this module."""
    words = pc.split_pattern_regex(texts, pattern=r"\s+")
    flat = pc.list_flatten(words)
    parents = pc.list_parent_indices(words)
    ne = pc.not_equal(flat, "")
    flat = flat.filter(ne)
    par = parents.filter(ne).to_numpy(zero_copy_only=False).astype(np.int64)
    wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, par, wlen


def gopher_quality_mask(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
) -> ray.data.Dataset:
    """Per-doc Gopher heuristic columns + the combined ``keep`` flag.
    Whitespace words (not the index tokenizer) per the published rules."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].combine_chunks().fill_null("")
        flat, par, wlen = _word_stream(texts)
        n = batch.num_rows
        n_words = np.zeros(n, np.int64)
        np.add.at(n_words, par, 1)
        len_sum = np.zeros(n, np.int64)
        np.add.at(len_sum, par, wlen)
        mean_len = np.divide(len_sum, np.maximum(n_words, 1), dtype=np.float64)

        n_hash = pc.count_substring(texts, "#").to_numpy(zero_copy_only=False)
        # ellipsis in either rendering: U+2026 or ASCII '...' (the published
        # rule counts the glyph, not a specific encoding)
        n_ell = pc.count_substring(texts, "…").to_numpy(zero_copy_only=False)
        n_dots = pc.count_substring_regex(
            texts, pattern=r"\.{3}"
        ).to_numpy(zero_copy_only=False)
        sym_ratio = np.divide(
            n_hash + n_ell + n_dots, np.maximum(n_words, 1), dtype=np.float64
        )

        lines = pc.split_pattern(texts, pattern="\n")
        lflat = pc.utf8_ltrim(pc.list_flatten(lines), ASCII_WS)
        lpar = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        n_lines = np.zeros(n, np.int64)
        np.add.at(n_lines, lpar, 1)
        is_bullet = pc.match_substring_regex(
            lflat, pattern=r"^([-*•]|\d+[.)])"
        ).to_numpy(zero_copy_only=False)
        n_bullets = np.zeros(n, np.int64)
        np.add.at(n_bullets, lpar[is_bullet], 1)
        bullet_ratio = np.divide(
            n_bullets, np.maximum(n_lines, 1), dtype=np.float64
        )

        ok_words = (n_words >= min_words) & (n_words <= max_words)
        ok_len = (mean_len >= GOPHER_MIN_MEAN_WORD_LEN) & (
            mean_len <= GOPHER_MAX_MEAN_WORD_LEN
        )
        ok_sym = sym_ratio <= GOPHER_MAX_SYMBOL_RATIO
        ok_bullet = bullet_ratio <= GOPHER_MAX_BULLET_RATIO
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(n_words),
                "mean_word_len": pa.array(np.round(mean_len, 6)),
                "symbol_ratio": pa.array(np.round(sym_ratio, 6)),
                "bullet_ratio": pa.array(np.round(bullet_ratio, 6)),
                "ok_words": pa.array(ok_words),
                "ok_mean_len": pa.array(ok_len),
                "ok_symbols": pa.array(ok_sym),
                "ok_bullets": pa.array(ok_bullet),
                "keep": pa.array(ok_words & ok_len & ok_sym & ok_bullet),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def dedup_lines_global(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int = 64,
) -> ray.data.Dataset:
    """C4-style CROSS-document line deduplication (Raffel et al. 2020
    §2.2: "we discard all but one of any three-sentence span occurring
    more than once in the data set" — applied here at line granularity,
    the common open-implementation choice): every distinct non-blank line
    survives only in its first occurrence corpus-wide (lowest
    ``(doc_id, line_idx)`` — deterministic), later occurrences are removed
    and each document is reassembled from its surviving lines in original
    order.

    Shape (two shuffles, the canonical cost of this op — cf. TFDS c4's two
    GroupByKey stages): explode docs into line rows; ONE hash-partitioned
    shuffle keyed by line-content hash picks winners (within a partition
    the winner logic compares full line content, so a 64-bit key collision
    can only co-locate lines, never wrongly merge them); a second shuffle
    keyed by doc id reassembles.  Blank (space-only) lines are structural
    and always kept; a per-doc sentinel row rides the shuffle so docs
    whose every line was removed still emit a row.

    Returns (id, text, n_kept, n_removed); n_* count real lines only.
    """
    from wikirec_ray.functions.hashing import GOLD64, token_hashes_arrow

    def explode(b: pa.Table) -> pa.Table:
        txt = b[text_col].combine_chunks().fill_null("")
        lines = pc.split_pattern(txt, pattern="\n")
        flat = pc.list_flatten(lines)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        par = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        counts = np.diff(lines.offsets.to_numpy())
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        idx_within = np.arange(len(flat)) - np.repeat(starts, counts)
        ids = b[id_col].to_numpy()
        # blank = ASCII-whitespace-only (ASCII_WS note above): exactly
        # DuckDB trim(line, <same charset>), never Unicode trim
        blank = pc.equal(pc.utf8_trim(flat, ASCII_WS), "")
        real = pa.table(
            {
                id_col: pa.array(ids[par]),
                "line_idx": pa.array(idx_within.astype(np.int64)),
                "line": flat,
                "blank": blank,
                "n_lines": pa.array(counts[par].astype(np.int64)),
            }
        )
        sentinel = pa.table(
            {
                id_col: b[id_col],
                "line_idx": pa.array(np.full(len(ids), -1, np.int64)),
                "line": pa.array([""] * len(ids), pa.string()),
                "blank": pa.array(np.ones(len(ids), bool)),
                "n_lines": pa.array(counts.astype(np.int64)),
            }
        )
        return pa.concat_tables([real, sentinel])

    def content_key(b: pa.Table) -> np.ndarray:
        # non-blank lines co-locate by content hash; blank/sentinel rows
        # skip dedup, so they spread by doc id (a single '' bucket would
        # route every blank line in the corpus to one partition)
        bl = b["blank"].to_numpy(zero_copy_only=False).astype(bool)
        h = token_hashes_arrow(b["line"].combine_chunks()).astype(np.int64)
        with np.errstate(over="ignore"):
            doc_k = (
                b[id_col].to_numpy().astype(np.uint64) * GOLD64
            ).astype(np.int64)
        return np.where(bl, doc_k, h)

    def winners(group: pa.Table) -> pa.Table:
        if "ppart" in group.column_names:
            group = group.drop_columns(["ppart"])
        bl = group["blank"].to_numpy(zero_copy_only=False).astype(bool)
        keep = bl.copy()  # blanks + sentinels always survive
        nb = np.flatnonzero(~bl)
        if len(nb):
            enc = group["line"].combine_chunks().dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)[nb]
            doc = group[id_col].to_numpy()[nb]
            idx = group["line_idx"].to_numpy()[nb]
            order = np.lexsort((idx, doc, codes))
            cs = codes[order]
            first = np.ones(len(order), bool)
            first[1:] = cs[1:] != cs[:-1]
            keep[nb[order[first]]] = True
        return group.filter(pa.array(keep))

    def doc_key(b: pa.Table) -> np.ndarray:
        return b[id_col].to_numpy().astype(np.int64)

    def reassemble(group: pa.Table) -> pa.Table:
        if "ppart" in group.column_names:
            group = group.drop_columns(["ppart"])
        doc = group[id_col].to_numpy()
        idx = group["line_idx"].to_numpy()
        order = np.lexsort((idx, doc))
        d_s = doc[order]
        run_start = np.ones(len(order), bool)
        run_start[1:] = d_s[1:] != d_s[:-1]
        starts = np.flatnonzero(run_start)
        run_len = np.diff(np.concatenate([starts, [len(order)]]))
        # the sentinel (line_idx = -1) sorts first in each run — drop it
        # from the joined text, use it only for doc identity + n_lines
        mask = np.ones(len(order), bool)
        mask[starts] = False
        vals = group["line"].combine_chunks().take(pa.array(order[mask]))
        n_kept = (run_len - 1).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(n_kept)]).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals)
        n_total = group["n_lines"].to_numpy()[order[starts]]
        return pa.table(
            {
                id_col: pa.array(d_s[starts]),
                "text": pc.binary_join(lists, "\n"),
                "n_kept": pa.array(n_kept),
                "n_removed": pa.array((n_total - n_kept).astype(np.int64)),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    kept = partitioned_map_groups(exploded, content_key, winners, n_parts)
    return partitioned_map_groups(kept, doc_key, reassemble, n_parts)


# PII scrubbing patterns (RefinedWeb, Penedo et al. 2023 §G; the published
# open-pipeline practice is regex redaction of emails / phone numbers /
# IP addresses with stable placeholder tokens so downstream token stats
# stay comparable).  All RE2-compatible — replayable in a DuckDB oracle.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    # (name, pattern, placeholder) — ORDER MATTERS: email first (digits in
    # an address must not re-match), then ipv4 BEFORE phone (an IP like
    # 192.168.10.25 matches the phone pattern's dot-separated digit groups;
    # review r04)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # international-ish phone: optional +CC, 3 groups of 2-4 digits with
    # space/dash/dot separators
    ("phone", r"\+?\d{1,3}[-. (]{1,2}\d{2,4}[-. )]{1,2}\d{2,4}[-. ]?\d{2,4}", "<PHONE>"),
)


def scrub_pii(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> ray.data.Dataset:
    """Redact PII spans with placeholder tokens, stateless per batch —
    emits the scrubbed text plus a per-kind match count so corpus-level
    PII statistics are one ``sum`` away.  Patterns apply in declaration
    order (see PII_PATTERNS note — ipv4 must precede phone).
    Returns (id_col, text_col, n_<kind>...) with one count column per
    pattern in pattern order (default: n_email, n_ipv4, n_phone)."""

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch[text_col].combine_chunks().fill_null("")
        cols: dict = {id_col: batch[id_col]}
        counts = []
        for name, pat, repl in patterns:
            counts.append(
                (name, pc.count_substring_regex(txt, pat))
            )
            txt = pc.replace_substring_regex(txt, pattern=pat, replacement=repl)
        cols[text_col] = txt
        for name, c in counts:
            cols[f"n_{name}"] = pc.cast(c, pa.int64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


# Gopher repetition thresholds (Rae et al. 2021, Table A1 — public data):
# fraction of characters in the most common n-gram, and fraction of
# characters inside duplicated n-grams.
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def repetition_ratios(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
) -> ray.data.Dataset:
    """Gopher's repetition signals, per doc and fully batch-local:

    - ``top{n}_char_frac`` — characters covered by the single most common
      word n-gram (its occurrence count × its character length, over total
      word characters); Rae et al. drop docs where this exceeds 0.20/0.18/
      0.16 for n=2/3/4.  Overlapping occurrences each count (the standard
      open-implementation accounting), so a degenerate doc like "tok "×60
      can score above 1.0 — the threshold comparison is unaffected.
    - ``dup{n}_char_frac`` — characters inside word n-grams that occur
      more than once (each duplicated n-gram's chars counted once per
      occurrence); thresholds 0.15..0.10 for n=5..10.
    - ``keep`` — all configured thresholds pass.

    Implementation: whitespace words per the published rules; n-grams as
    rolling joins of the token-hash stream (content equality via 64-bit
    rolling hash — the same corpus-scale tradeoff as MinHash shingles;
    cross-doc false collisions are impossible because grouping is
    per-doc).  Everything is numpy over the flat word stream — no Python
    loop over rows or tokens."""
    from wikirec_ray.functions.hashing import token_hashes_arrow, window_fold

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].combine_chunks().fill_null("")
        flat, par, wlen = _word_stream(texts)
        n = batch.num_rows
        n_words = np.zeros(n, np.int64)
        np.add.at(n_words, par, 1)
        tot_chars = np.zeros(n, np.int64)
        np.add.at(tot_chars, par, wlen)
        h = token_hashes_arrow(flat)

        # prefix-sum of word lengths for O(1) n-gram char spans
        csum = np.concatenate([[0], np.cumsum(wlen)])
        cols: dict = {id_col: batch[id_col]}
        keep = np.ones(n, bool)

        def ngram_stats(k: int):
            """(doc ids, gram hashes, gram char lengths) for all k-grams."""
            if len(h) < k:
                e = np.array([], np.int64)
                return e, np.array([], np.uint64), e
            acc = window_fold(h, k)  # the shared shingle/n-gram kernel
            gdoc = par[: len(h) - k + 1]
            valid = par[k - 1 :] == gdoc  # gram fully inside one doc
            # chars of the k words (no separators, matching the published
            # "fraction of characters" accounting)
            glen = csum[k:] - csum[: len(csum) - k]
            return gdoc[valid], acc[valid], glen[valid]

        for k in top_ns:
            gdoc, gh, glen = ngram_stats(k)
            frac = np.zeros(n, np.float64)
            if len(gh):
                # per (doc, gram): count and char length; top gram per doc
                # by covered chars = count * len
                order = np.lexsort((gh, gdoc))
                d_s, h_s, l_s = gdoc[order], gh[order], glen[order]
                new = np.ones(len(order), bool)
                new[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
                starts = np.flatnonzero(new)
                cnt = np.diff(np.concatenate([starts, [len(order)]]))
                covered = cnt * l_s[starts]
                np.maximum.at(frac, d_s[starts], covered)
                frac = frac / np.maximum(tot_chars, 1)
            cols[f"top{k}_char_frac"] = pa.array(np.round(frac, 6))
            thr = GOPHER_TOP_NGRAM_MAX.get(k)
            if thr is not None:
                keep &= frac <= thr
        for k in dup_ns:
            gdoc, gh, glen = ngram_stats(k)
            frac = np.zeros(n, np.float64)
            if len(gh):
                order = np.lexsort((gh, gdoc))
                d_s, h_s, l_s = gdoc[order], gh[order], glen[order]
                new = np.ones(len(order), bool)
                new[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
                starts = np.flatnonzero(new)
                cnt = np.diff(np.concatenate([starts, [len(order)]]))
                dup_chars = np.where(cnt > 1, cnt * l_s[starts], 0)
                acc_d = np.zeros(n, np.int64)
                np.add.at(acc_d, d_s[starts], dup_chars)
                frac = acc_d / np.maximum(tot_chars, 1)
            cols[f"dup{k}_char_frac"] = pa.array(np.round(frac, 6))
            thr = GOPHER_DUP_NGRAM_MAX.get(k)
            if thr is not None:
                keep &= frac <= thr
        cols["keep"] = pa.array(keep)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")
