"""Command-line entry points — the ``ray job submit`` surface.

On a cluster these are the driver scripts a deployment submits
(``ray job submit -- python -m wikirec_ray build ...``); locally they run
against ``address="local"``.  Each subcommand is a thin argparse shell over
the library functions — all pipeline logic lives in the package, so the
CLI adds no second code path to keep correct.

    python -m wikirec_ray build  --input DIR --index DIR \
        [--format pages|documents] [--positions] [--bigrams K] [--no-resume]
    python -m wikirec_ray append --input DIR --index DIR [--format ...]
    python -m wikirec_ray delete --index DIR --ids 3,17,42 | --ids-file F
    python -m wikirec_ray compact --index DIR
    python -m wikirec_ray meta   --index DIR --input F --cols lang,source
    python -m wikirec_ray query  --index DIR QUERY [-k 10] [--serve POOL] \
        [--facets COLS] [--stats COLS] [--extended-stats COLS] \
        [--histogram COL:INTERVAL] [--cardinality COLS] \
        [--stats-by BYCOL:VALCOL] [--percentiles COL[:P1,P2,...]] \
        [--significant COLS] [--top-hits COL[:K]] [--rare COL[:MAXDC]] \
        [--multi-terms COLS] [--demote TERMS [--negative-boost 0.5]] \
        [--significant-text SAMPLE (needs --store)] [--fields COLS] \
        [--store EXPORT_DIR [--snippet-window W]] \
        [--title-index DIR [--title-weight 2.0] \
            [--mf-mode most_fields|best_fields [--tie-breaker TB]]]
        [--prior COL:WEIGHT]                       # BM25 + static signal
    python -m wikirec_ray suggest --index DIR PREFIX [-k 10]
    python -m wikirec_ray explain --index DIR QUERY DOC_ID
    python -m wikirec_ray serve  --index DIR [--coordinators N] [--pool P] \
        [--pool-replicas R]      # stdin query lines -> stdout JSON lines
    python -m wikirec_ray stats  --index DIR

Query strings use the ``search()`` mini-language: ``"quoted"`` = exact
phrase, ``NEAR/n(terms)`` = proximity, ``+term``/``-term`` chunk prefixes
= boolean required/excluded, ``col:value`` chunks = metadata filters over
the ``meta`` sidecar's columns, ``term^2.5`` = query-time boosts,
anything else = BM25 (WAND).

This module (not the library) owns the Ray session, per the repo rule
that only CLI scripts, bench.py and the test fixture call ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import math
import sys


_OWNS_RAY = False  # did THIS invocation start the session? (tests call
#                     main() under their own session, which must survive)


def _ensure_ray():
    global _OWNS_RAY
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
        _OWNS_RAY = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _corpus(input_dir: str, fmt: str):
    """(doc_id, text) Dataset from either input shape.

    ``pages``: parquet of Common-Crawl-style rows (url, html, ...) —
    column-pruned read, streaming extraction, doc_id = the trailing
    integer of the url (the synth source's invertible id scheme).
    ``documents``: parquet already shaped (doc_id, text)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from wikirec_ray.stages.extract import extract_pages

    if fmt == "documents":
        return ray.data.read_parquet(input_dir, columns=["doc_id", "text"])
    pages = ray.data.read_parquet(input_dir, columns=["url", "html"])
    return extract_pages(pages).map_batches(
        lambda b: b.append_column(
            "doc_id",
            pc.cast(pc.replace_substring_regex(b["url"], r"^.*/", ""),
                    pa.int64()),
        ),
        batch_format="pyarrow",
    )


def cmd_build(args) -> int:
    _ensure_ray()
    from wikirec_ray.stages.index_build import build_index

    manifest = build_index(
        _corpus(args.input, args.format),
        args.index,
        resume=not args.no_resume,
        lineage={"input": args.input, "format": args.format},
        store_positions=args.positions,
        precompute_bigrams=args.bigrams,
    )
    print(json.dumps({
        "index": args.index,
        "n_docs": manifest.get("stats", {}).get("n_docs"),
        "partitions": len(manifest.get("partitions", [])),
        "positions": args.positions,
        "bigrams": args.bigrams,
    }))
    return 0


def cmd_append(args) -> int:
    _ensure_ray()
    from wikirec_ray.stages.index_build import append_index

    manifest = append_index(
        _corpus(args.input, args.format),
        args.index,
        lineage={"input": args.input, "format": args.format},
    )
    print(json.dumps({
        "index": args.index,
        "n_docs": manifest.get("stats", {}).get("n_docs"),
        "partitions": len(manifest.get("partitions", [])),
    }))
    return 0


def cmd_delete(args) -> int:
    """Tombstone doc ids (no Ray session needed — a driver-side manifest
    update).  Deleted docs vanish from every retrieval route immediately;
    run ``compact`` to purge postings and recompute stats."""
    from wikirec_ray.stages.lifecycle import delete_docs

    if args.ids:
        ids = [int(x) for x in args.ids.split(",") if x.strip()]
    else:
        with open(args.ids_file) as f:
            ids = [int(line) for line in f if line.strip()]
    out = delete_docs(args.index, ids)
    print(json.dumps(dict(out, index=args.index)))
    return 0


def cmd_compact(args) -> int:
    _ensure_ray()
    from wikirec_ray.stages.lifecycle import compact_index

    manifest = compact_index(args.index)
    print(json.dumps({
        "index": args.index,
        "n_docs": manifest.get("stats", {}).get("n_docs"),
        "n_tombstones": manifest.get("stats", {}).get("n_tombstones", 0),
        "partitions": len(manifest.get("partitions", [])),
    }))
    return 0


def cmd_suggest(args) -> int:
    """Prefix autocomplete over the index vocabulary (df-ranked).  No Ray
    session needed — a driver-side lookup over the df files.  A leading
    ``*`` flips to suffix completion (``*tion`` = terms ending in tion)
    and a slash-delimited ``/re/`` runs whole-term regex matching, both
    matching the query language's operator forms."""
    import sys

    from wikirec_ray.pipelines.query import IndexReader

    p = args.prefix
    # mirror the query language's wildcard rules: only a well-formed
    # leading-* chunk (*tion — length >= 2, no trailing *) flips to
    # suffix mode; bare '*' and both-ended '*x*' are not suggestion
    # patterns there either, so reject them loudly instead of silently
    # ranking the whole vocabulary / matching nothing
    if p == "*" or (p.startswith("*") and p.endswith("*")):
        print(f"suggest: unsupported pattern {p!r} — use PREFIX, "
              "PREFIX*, *SUFFIX or /REGEX/", file=sys.stderr)
        return 2
    rd = IndexReader(args.index)
    if len(p) >= 3 and p.startswith("/") and p.endswith("/"):
        try:
            hits = rd.regex_terms(p[1:-1], args.k)
        except ValueError as exc:
            print(f"suggest: {exc}", file=sys.stderr)
            return 2
    elif p.startswith("*"):
        hits = rd.suggest_suffix(p[1:], args.k)
    else:
        hits = rd.suggest(p.removesuffix("*"), args.k)
    print(json.dumps({
        "prefix": p,
        "suggestions": [{"term": t, "df": n} for t, n in hits],
    }))
    return 0


def cmd_merge(args) -> int:
    """Merge independently built indexes (disjoint doc-id blocks) by file
    reuse — the per-crawl ingest path: no corpus re-read, no shuffle."""
    _ensure_ray()
    from wikirec_ray.stages.merge import merge_indexes

    manifest = merge_indexes(args.inputs, args.index)
    print(json.dumps({
        "index": args.index,
        "merged_from": manifest["lineage"]["merged_from"],
        "n_docs": manifest.get("stats", {}).get("n_docs"),
        "partitions": len(manifest.get("partitions", [])),
    }))
    return 0


def cmd_meta(args) -> int:
    """Build/refresh the document-attribute sidecar (``meta/``) powering
    ``col:value`` filters and ``--facets`` — input-aware-resumable like the
    index build (unchanged ranges skip their write)."""
    _ensure_ray()
    import ray.data

    from wikirec_ray.stages.doc_meta import build_doc_meta

    cols = [c.strip() for c in args.cols.split(",") if c.strip()]
    manifest = build_doc_meta(
        ray.data.read_parquet(args.input, columns=["doc_id"] + cols),
        args.index,
        cols=cols,
        lineage={"input": args.input},
    )
    print(json.dumps({
        "index": args.index, "cols": cols,
        "n_docs": manifest.get("n_docs"),
        "partitions": len(manifest.get("partitions", {})),
        "skipped": sum(bool(e.get("skipped"))
                       for e in manifest["partitions"].values()),
    }))
    return 0


def _parse_after(spec: str):
    """``doc_id:score`` -> the (doc_id, score) search_after cursor, or
    None for the empty string.  The score must be the exact float a
    previous page printed (the strictly-after test compares it verbatim —
    see ``pipelines.query._after_cursor``); JSON round-trips doubles
    exactly, so copy-pasting from the previous result line is correct."""
    if not spec:
        return None
    doc, sep, score = spec.partition(":")
    try:
        if not sep:
            raise ValueError
        cursor = (int(doc), float(score))
        # a NaN/inf cursor score fails every strictly-after comparison,
        # silently returning empty pages — reject it like other malformed
        # cursors (real pages only ever print finite scores)
        if not math.isfinite(cursor[1]):
            raise ValueError
        return cursor
    except ValueError:
        raise SystemExit(
            f"--after must be doc_id:score (got {spec!r})") from None


def cmd_query(args) -> int:
    from wikirec_ray.pipelines.query import (
        IndexReader,
        parse_query,
        search_with_terms,
        split_filters,
    )

    prior = getattr(args, "prior", "")
    title = getattr(args, "title_index", "")
    if prior and title:
        raise SystemExit("--prior and --title-index do not compose yet — "
                         "the multi-field engines have no prior surface")
    if not title and (args.mf_mode != "most_fields"
                      or args.tie_breaker != 0.0):
        # silently running a plain single-field query while the user
        # believes best_fields ranked it is the worst outcome — reject
        # loudly like every other non-composing flag (review r5)
        raise SystemExit(
            "--mf-mode/--tie-breaker only apply with --title-index "
            "(multi-field retrieval)"
        )
    if getattr(args, "msm", 0) and (prior or title):
        # the quorum rides the boolean route, which the prior/multi-field
        # engines do not expose — reject instead of silently ignoring
        raise SystemExit(
            "--msm composes with boolean/plain queries only, not with "
            "--prior or --title-index"
        )
    if title:
        # multi-field (title^w + body, Lucene most_fields): the multi-field
        # engines rank the weighted BM25 sum — positional/boolean/lexicon
        # routes are per-field surfaces the sum has no semantics for, so
        # reject those modes up front with a named error
        mode, _, _ = parse_query(split_filters(args.query, [])[1])
        if (mode not in ("bm25", "boosted") or args.collapse
                or args.facets or args.stats or args.extended_stats
                or args.histogram or args.cardinality or args.stats_by
                or args.percentiles or args.significant or args.top_hits
                or args.sig_text or args.fields or args.rare
                or args.multi_terms or args.demote):
            unsupported = ("collapsed" if args.collapse
                           else "faceted" if args.facets
                           else "stats" if args.stats
                           else "extended-stats" if args.extended_stats
                           else "histogram" if args.histogram
                           else "cardinality" if args.cardinality
                           else "stats-by" if args.stats_by
                           else "percentiles" if args.percentiles
                           else "significant" if args.significant
                           else "top-hits" if args.top_hits
                           else "significant-text" if args.sig_text
                           else "fields" if args.fields
                           else "rare" if args.rare
                           else "multi-terms" if args.multi_terms
                           else "demote" if args.demote else mode)
            raise SystemExit(
                "--title-index supports plain BM25 and ^boosted queries "
                f"only (got a {unsupported} query)"
            )
        fields = [(args.index, 1.0), (title, args.title_weight)]
        if args.serve:
            _ensure_ray()
            from wikirec_ray.state.server import MultiFieldShardedEngine

            engine = MultiFieldShardedEngine(
                fields, pool_size=args.serve, mode=args.mf_mode,
                tie_breaker=args.tie_breaker,
            )
        else:
            from wikirec_ray.pipelines.multifield import MultiFieldReader

            engine = MultiFieldReader(fields, mode=args.mf_mode,
                                      tie_breaker=args.tie_breaker)
    elif args.serve:
        _ensure_ray()  # the served engine needs a Ray session for actors
        from wikirec_ray.state.server import RangeShardedQueryEngine

        engine = RangeShardedQueryEngine(args.index, pool_size=args.serve)
    else:
        engine = IndexReader(args.index)  # pure local read, no Ray needed
    try:
        if prior:
            # static-score ranking: BM25 + w × sidecar prior — plain and
            # ^boosted queries only (the prior rides the weighted dense
            # path; positional/boolean/lexicon modes have no prior
            # semantics), col:value chunks stay filters.  Output shapes
            # the prior branch does not produce reject loudly instead of
            # being dropped (review r5).
            if (args.facets or args.store or args.collapse or args.stats
                    or args.extended_stats or args.histogram
                    or args.cardinality or args.stats_by
                    or args.percentiles or args.significant
                    or args.top_hits or args.sig_text or args.fields
                    or args.rare or args.multi_terms or args.demote):
                raise SystemExit(
                    "--prior composes with filters/boosts/--after only — "
                    "the aggregation and --store/--collapse outputs are "
                    "not produced by the prior branch"
                )
            col, sep, wtxt = prior.partition(":")
            if not sep or col not in engine.meta_cols():
                avail = engine.meta_cols() or "none — run the meta subcommand"
                raise SystemExit(
                    f"--prior needs COL:WEIGHT with COL in the metadata "
                    f"sidecar (available: {avail})"
                )
            p_attrs, rest = split_filters(args.query, engine.meta_cols())
            mode, parsed, _w = parse_query(rest)
            if mode == "boosted":
                p_terms, p_weights = list(parsed[0]), list(parsed[1])
            elif mode == "bm25":
                p_terms, p_weights = list(parsed), None
            else:
                raise SystemExit(
                    f"--prior supports plain BM25 and ^boosted queries "
                    f"only (got a {mode} query)"
                )
            try:
                w = float(wtxt)
            except ValueError:
                raise SystemExit(f"--prior weight {wtxt!r} is not a number")
            if not math.isfinite(w):
                raise SystemExit(f"--prior weight {wtxt!r} is not finite")
            hits = engine.prior_topk(
                p_terms, args.k, col, w, attrs=p_attrs or None,
                after=_parse_after(args.after), weights=p_weights,
            )
            print(json.dumps({
                "query": args.query, "prior": {"col": col, "weight": w},
                "hits": [{"doc_id": d, "score": s} for d, s in hits],
            }))
            return 0
        # one parse + one lexicon expansion per request: `positive` is the
        # effective term set retrieval ran over, reused by the snippet
        # highlighter AND the facet counter below
        collapse = args.collapse or None
        if collapse is not None and collapse not in engine.meta_cols():
            avail = engine.meta_cols() or "none — run the meta subcommand"
            raise SystemExit(
                f"--collapse column {collapse!r} is not in the metadata "
                f"sidecar (available: {avail})"
            )
        # one filter split serves the demote branch AND every aggregation
        # branch below (review r5: identical recomputations); s_attrs is
        # the col:value chunks of the query string, the shared scope
        s_attrs, s_rest = split_filters(args.query, engine.meta_cols())
        if args.demote:
            # ES boosting query: soft demotion — plain BM25 / ^boosted
            # queries only (the demotion rides the dense scorer; other
            # modes have no demote semantics), col:value chunks stay
            # filters, collapse/msm do not compose
            if collapse is not None or getattr(args, "msm", 0):
                raise SystemExit(
                    "--demote composes with plain/boosted queries, "
                    "filters and --after only — not --collapse/--msm"
                )
            d_attrs = s_attrs
            d_mode, d_parsed, _ = parse_query(s_rest)
            if d_mode == "boosted":
                d_terms, d_weights = list(d_parsed[0]), list(d_parsed[1])
            elif d_mode == "bm25":
                d_terms, d_weights = list(d_parsed), None
            else:
                raise SystemExit(
                    "--demote supports plain BM25 and ^boosted queries "
                    f"only (got a {d_mode} query)"
                )
            d_neg_mode, neg_terms, _ = parse_query(args.demote)
            if d_neg_mode != "bm25" or not neg_terms:
                raise SystemExit(
                    f"--demote needs plain terms (got {args.demote!r})"
                )
            hits = engine.boosting_topk(
                d_terms, args.k, neg_terms, args.negative_boost,
                attrs=d_attrs or None, after=_parse_after(args.after),
                weights=d_weights,
            )
            positive, phrase = d_terms, None
        else:
            hits, positive, phrase = search_with_terms(
                engine, args.query, args.k, after=_parse_after(args.after),
                collapse=collapse, min_should_match=getattr(args, "msm", 0),
            )
        values = None
        if collapse is not None:
            # collapsed hits are (doc_id, score, value) triples; split the
            # value off so the store/snippet path sees plain pairs
            values = [v for _, _, v in hits]
            hits = [(d, s) for d, s, _ in hits]
        out = {"query": args.query}
        if args.store:
            # query-then-fetch: hydrate the top-k from the export-sink
            # stored-fields store and attach a KWIC why-it-matched snippet
            from wikirec_ray.state.docstore import DocStore, hydrate_hits

            out["hits"] = hydrate_hits(
                DocStore(args.store), hits, positive, phrase,
                snippet_window=args.snippet_window,
            )
        else:
            out["hits"] = [{"doc_id": d, "score": s} for d, s in hits]
        if values is not None:
            for h, v in zip(out["hits"], values):
                h["collapse_value"] = v
        if args.fields:
            # ES docvalue_fields: decorate every hit with its sidecar
            # attribute values for result display
            f_cols = [c.strip() for c in args.fields.split(",") if c.strip()]
            fv = engine.attr_values([h["doc_id"] for h in out["hits"]],
                                    f_cols)
            for h in out["hits"]:
                h["fields"] = fv[h["doc_id"]]
        if args.facets:
            # facet counts run over docs matching ANY positive query term
            # (the driver-checked facet_counts contract)
            out["facets"] = {
                col: [{"value": v, "n_docs": n}
                      for v, n in engine.facet_counts(positive, col, args.k)]
                for col in (c.strip() for c in args.facets.split(","))
                if col
            }
        if args.stats:
            # ES stats aggregation: count/min/max/sum/avg of each numeric
            # sidecar column over docs matching ANY positive query term
            # (same match set as --facets; col:value filters from the
            # query string compose through `attrs`)
            out["stats"] = {
                col: engine.metric_stats(positive, col,
                                         attrs=s_attrs or None)
                for col in (c.strip() for c in args.stats.split(","))
                if col
            }
        if args.extended_stats:
            # ES extended_stats: the stats shape plus sum_of_squares /
            # variance / std_deviation (population moments)
            out["extended_stats"] = {
                col: engine.extended_stats(positive, col,
                                           attrs=s_attrs or None)
                for col in (c.strip()
                            for c in args.extended_stats.split(","))
                if col
            }
        if args.histogram:
            # ES histogram aggregation: COL:INTERVAL buckets keyed by
            # floor(v/interval)*interval over the same match set
            h_col, h_sep, h_itxt = args.histogram.partition(":")
            try:
                h_interval = float(h_itxt) if h_sep else float("nan")
            except ValueError:
                h_interval = float("nan")
            if (not h_col or not h_sep or not math.isfinite(h_interval)
                    or h_interval <= 0):
                raise SystemExit(
                    "--histogram needs COL:INTERVAL with a finite "
                    f"interval > 0 (got {args.histogram!r})"
                )
            out["histogram"] = {
                "col": h_col, "interval": h_interval,
                "buckets": [
                    {"key": lo, "n_docs": n}
                    for lo, n in engine.histogram(
                        positive, h_col, h_interval, attrs=s_attrs or None)
                ],
            }
        if args.cardinality:
            # ES cardinality aggregation (exact here): distinct stored
            # values per column over the same match set
            out["cardinality"] = {
                col: engine.cardinality(positive, col,
                                        attrs=s_attrs or None)
                for col in (c.strip() for c in args.cardinality.split(","))
                if col
            }
        if args.stats_by:
            # ES terms + stats sub-aggregation: BYCOL:VALCOL — per-value
            # numeric stats over the same match set, buckets ordered and
            # cut like --facets
            g_by, g_sep, g_val = args.stats_by.partition(":")
            if not g_sep or not g_by or not g_val:
                raise SystemExit(
                    f"--stats-by needs BYCOL:VALCOL (got {args.stats_by!r})"
                )
            out["stats_by"] = {
                "by": g_by, "col": g_val,
                "buckets": engine.grouped_stats(
                    positive, g_by, g_val, args.k, attrs=s_attrs or None),
            }
        if args.percentiles:
            # ES percentiles aggregation (exact here): COL or
            # COL:P1,P2,... over the same match set
            p_col, p_sep, p_txt = args.percentiles.partition(":")
            if not p_col:
                raise SystemExit(
                    "--percentiles needs COL or COL:P1,P2,... "
                    f"(got {args.percentiles!r})"
                )
            if p_sep:
                try:
                    percents = tuple(
                        float(p) for p in p_txt.split(",") if p.strip()
                    )
                except ValueError:
                    percents = ()
                if not percents or not all(
                        math.isfinite(p) and 0.0 <= p <= 100.0
                        for p in percents):
                    raise SystemExit(
                        "--percentiles needs COL or COL:P1,P2,... with "
                        f"each P in [0, 100] (got {args.percentiles!r})"
                    )
            else:
                percents = (25.0, 50.0, 75.0, 95.0, 99.0)
            pcts = engine.percentiles(positive, p_col, percents,
                                      attrs=s_attrs or None)
            out["percentiles"] = {
                "col": p_col, "values": {str(p): v for p, v in pcts.items()}
            }
        if args.significant:
            # ES significant_terms: values overrepresented in the match
            # set vs the whole corpus (JLH score); col:value filters
            # narrow the FOREGROUND only, like the ES default background
            out["significant"] = {
                col: engine.significant_terms(positive, col, args.k,
                                              attrs=s_attrs or None)
                for col in (c.strip() for c in args.significant.split(","))
                if col
            }
        if args.multi_terms:
            # ES multi_terms: composite-key buckets over 2+ sidecar
            # columns, ordered/cut like --facets at -k
            m_cols = [c.strip() for c in args.multi_terms.split(",")
                      if c.strip()]
            if len(m_cols) < 2:
                raise SystemExit(
                    "--multi-terms needs 2+ comma-separated columns "
                    f"(got {args.multi_terms!r})"
                )
            out["multi_terms"] = {
                "cols": m_cols,
                "buckets": [
                    {"values": list(t), "n_docs": n}
                    for t, n in engine.multi_terms(
                        positive, m_cols, args.k, attrs=s_attrs or None)
                ],
            }
        if args.rare:
            # ES rare_terms: the long tail — COL or COL:MAXDC (keep only
            # values with at most MAXDC matches), ascending, cut at -k
            r_col, r_sep, r_dtxt = args.rare.partition(":")
            if r_sep:
                try:
                    r_maxdc = int(r_dtxt)
                except ValueError:
                    r_maxdc = 0
                if r_maxdc < 1:
                    raise SystemExit(
                        "--rare needs COL or COL:MAXDC with MAXDC >= 1 "
                        f"(got {args.rare!r})"
                    )
            else:
                r_maxdc = None
            if not r_col:
                raise SystemExit(
                    f"--rare needs COL or COL:MAXDC (got {args.rare!r})"
                )
            out["rare"] = {
                "col": r_col, "max_doc_count": r_maxdc,
                "buckets": [
                    {"value": v, "n_docs": n}
                    for v, n in engine.rare_terms(
                        positive, r_col, args.k, max_doc_count=r_maxdc,
                        attrs=s_attrs or None)
                ],
            }
        if args.sig_text:
            # ES significant_text: the terms characterizing the matched
            # docs — needs stored text, so it rides --store
            if args.sig_text < 1:
                raise SystemExit(
                    "--significant-text needs SAMPLE >= 1 "
                    f"(got {args.sig_text})"
                )
            if not args.store:
                raise SystemExit(
                    "--significant-text needs --store EXPORT_DIR (the "
                    "index keeps no text to sample)"
                )
            from wikirec_ray.pipelines.query import significant_text
            from wikirec_ray.state.docstore import DocStore

            out["significant_text"] = significant_text(
                engine, positive, DocStore(args.store), k=args.k,
                sample=args.sig_text, attrs=s_attrs or None,
            )
        if args.top_hits:
            # ES terms + top_hits sub-aggregation: grouped search results
            # — COL or COL:K (K = hits per bucket, default 3), buckets
            # cut at -k like --facets
            t_col, t_sep, t_ktxt = args.top_hits.partition(":")
            if not t_col:
                raise SystemExit(
                    f"--top-hits needs COL or COL:K (got {args.top_hits!r})"
                )
            if t_sep:
                try:
                    t_k = int(t_ktxt)
                except ValueError:
                    t_k = 0
                if t_k < 1:
                    raise SystemExit(
                        "--top-hits needs COL or COL:K with K >= 1 "
                        f"(got {args.top_hits!r})"
                    )
            else:
                t_k = 3
            out["top_hits"] = {
                "col": t_col, "k_per_bucket": t_k,
                "buckets": [
                    {"value": b["value"], "n_docs": b["n_docs"],
                     "hits": [{"doc_id": d, "score": s}
                              for d, s in b["hits"]]}
                    for b in engine.top_hits_by(
                        positive, t_col, args.k, t_k,
                        attrs=s_attrs or None)
                ],
            }
        print(json.dumps(out))
    finally:
        if args.serve:
            engine.shutdown()
    return 0


def cmd_explain(args) -> int:
    """Per-term score breakdown (Lucene Explanation) of one document for
    one query string — pure local read, no Ray.  The breakdown covers the
    SCORING side of whatever mode the query parses to: phrase/NEAR/
    sloppy/boolean modes and ``col:value`` filters decide MEMBERSHIP, not
    score (the engine's filter-vs-score contract), so for those the
    breakdown explains the plain BM25 sum over the positive terms;
    boosted queries carry their weights and ``~``/``*``//re/ queries are
    lexicon-expanded first (the same term multiset retrieval ran over)."""
    from wikirec_ray.pipelines.query import (
        IndexReader,
        parse_query,
        scoring_terms,
        split_filters,
    )

    reader = IndexReader(args.index)
    _attrs, rest = split_filters(args.query, reader.meta_cols())
    mode, parsed, _w = parse_query(rest)
    try:
        # the SAME mode -> scoring-multiset switch retrieval uses — a new
        # parse mode wired into search_with_terms is automatically
        # explained.  ValueError covers the user-input failures of both
        # steps (invalid /regex/ pattern, doc_id outside the index) —
        # they keep the JSON line protocol like every other error here.
        terms, weights = scoring_terms(reader, mode, parsed)
        if not terms:
            print(json.dumps(
                {"query": args.query, "error": "no scoring terms"}))
            return 1
        ex = reader.explain(terms, args.doc_id, weights=weights)
    except ValueError as exc:
        print(json.dumps({"query": args.query, "error": str(exc)}))
        return 1
    ex["query"] = args.query
    ex["mode"] = mode
    print(json.dumps(ex))
    return 0


def cmd_serve(args) -> int:
    """Long-running query server: one query string per stdin line, one
    JSON result line per stdout line (errors are reported per-line, the
    server stays up).  Backed by the replicated tier — ``--coordinators``
    replicas over ``--pool-replicas`` shard pools of ``--pool`` shards —
    so this is the deployment shape BASELINE.md's serve-load section
    measures.  Exits cleanly on EOF."""
    _ensure_ray()
    from wikirec_ray.state.server import ReplicatedSearchTier

    tier = ReplicatedSearchTier(
        args.index, n_coordinators=args.coordinators,
        pool_size=args.pool, n_pools=args.pool_replicas,
    )
    print(json.dumps({"ready": True, "index": args.index,
                      "coordinators": args.coordinators,
                      "pools": len(tier.pools), "pool_size": args.pool}),
          flush=True)
    try:
        for i, line in enumerate(sys.stdin):
            q = line.strip()
            if not q:
                continue
            after, k = None, args.k
            try:
                if q.startswith("{"):
                    # JSON request form: {"query": ..., "k"?: ...,
                    # "after"?: [doc_id, score]} — the paging/cursor
                    # protocol.  A '{'-leading line that is NOT valid
                    # JSON falls through to the plain-query path (the
                    # documented line protocol must keep searching for
                    # literal text like '{spark} join'); a valid JSON
                    # object missing "query" gets a named error, not a
                    # bare KeyError repr.
                    try:
                        req = json.loads(q)
                    except json.JSONDecodeError:
                        req = None
                    if isinstance(req, dict):
                        if "query" not in req:
                            raise ValueError(
                                'JSON request missing "query" key')
                        q = req["query"]
                        k = int(req.get("k", args.k))
                        if req.get("after") is not None:
                            a = req["after"]
                            after = (int(a[0]), float(a[1]))
                hits = tier.search(q, k, client_id=i, after=after)
                print(json.dumps({
                    "query": q,
                    "hits": [{"doc_id": d, "score": s} for d, s in hits],
                }), flush=True)
            except Exception as exc:  # malformed query must not kill serving
                print(json.dumps({"query": q, "error": str(exc)}),
                      flush=True)
    finally:
        tier.shutdown()
    return 0


def cmd_stats(args) -> int:
    from wikirec_ray.state.segments import load_manifest, load_stats

    manifest = load_manifest(args.index)
    if manifest is None:
        print(json.dumps({"error": f"no manifest in {args.index}"}))
        return 1
    stats = load_stats(args.index)
    print(json.dumps({
        "index": args.index,
        "format_version": manifest.get("version"),
        "n_docs": stats.get("n_docs"),
        "n_term_partitions": stats.get("n_term_partitions"),
        "avgdl": stats.get("avgdl"),
        "partitions": len(manifest.get("partitions", [])),
        "positions": bool(stats.get("store_positions")),
        "bigrams": stats.get("precompute_bigrams", 0),
        "tombstones": stats.get("n_tombstones", 0),
        "build_wall_s": manifest.get("build_wall_s"),
        "lineage": manifest.get("lineage", {}),
    }))
    return 0


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="wikirec_ray", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def io(sp, needs_input=True):
        if needs_input:
            sp.add_argument("--input", required=True,
                            help="input parquet dir")
            sp.add_argument("--format", choices=["pages", "documents"],
                            default="pages")
        sp.add_argument("--index", required=True, help="index dir")

    b = sub.add_parser("build", help="build an index from a corpus")
    io(b)
    b.add_argument("--positions", action="store_true",
                   help="store token positions (phrase/NEAR retrieval)")
    b.add_argument("--bigrams", type=int, default=0, metavar="K",
                   help="precompute top-K frequent-bigram posting lists")
    b.add_argument("--no-resume", action="store_true",
                   help="rebuild from scratch even if a manifest exists")
    b.set_defaults(fn=cmd_build)

    a = sub.add_parser("append", help="delta-only incremental ingest")
    io(a)
    a.set_defaults(fn=cmd_append)

    d = sub.add_parser("delete", help="tombstone doc ids (purge via compact)")
    io(d, needs_input=False)
    g = d.add_mutually_exclusive_group(required=True)
    g.add_argument("--ids", help="comma-separated doc ids")
    g.add_argument("--ids-file", help="file with one doc id per line")
    d.set_defaults(fn=cmd_delete)

    c = sub.add_parser("compact",
                       help="purge tombstoned docs, recompute stats")
    io(c, needs_input=False)
    c.set_defaults(fn=cmd_compact)

    sg = sub.add_parser(
        "suggest", help="prefix autocomplete over the index vocabulary")
    sg.add_argument("--index", required=True, help="index dir")
    sg.add_argument("prefix", help="term prefix (empty = whole vocabulary)")
    sg.add_argument("-k", type=int, default=10)
    sg.set_defaults(fn=cmd_suggest)

    mg = sub.add_parser(
        "merge", help="merge independently built indexes (file reuse)")
    mg.add_argument("--index", required=True, help="output index dir")
    mg.add_argument("inputs", nargs="+",
                    help="two or more input index dirs (disjoint id blocks)")
    mg.set_defaults(fn=cmd_merge)

    m = sub.add_parser(
        "meta", help="build the doc-attribute sidecar (filters + facets)")
    io(m, needs_input=False)
    m.add_argument("--input", required=True,
                   help="parquet with doc_id + attribute columns")
    m.add_argument("--cols", required=True,
                   help="comma-separated attribute columns, e.g. lang,source")
    m.set_defaults(fn=cmd_meta)

    q = sub.add_parser("query", help="run one query string")
    io(q, needs_input=False)
    q.add_argument("query", help='BM25 terms, "exact phrase", NEAR/n(...), '
                                 '+/-boolean, col:value filters')
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--serve", type=int, default=0, metavar="POOL",
                   help="query through a range-sharded actor pool of this "
                        "size instead of the local reader")
    q.add_argument("--facets", default="", metavar="COLS",
                   help="also report per-value match counts for these "
                        "comma-separated sidecar columns")
    q.add_argument("--stats", default="", metavar="COLS",
                   help="also report count/min/max/sum/avg of these "
                        "comma-separated NUMERIC sidecar columns over the "
                        "matched docs (ES stats aggregation; col:value "
                        "filters in the query compose)")
    q.add_argument("--extended-stats", default="", metavar="COLS",
                   dest="extended_stats",
                   help="like --stats plus sum_of_squares/variance/"
                        "std_deviation (ES extended_stats, population "
                        "moments)")
    q.add_argument("--histogram", default="", metavar="COL:INTERVAL",
                   help="also report fixed-interval value buckets of this "
                        "NUMERIC sidecar column over the matched docs "
                        "(ES histogram aggregation, non-empty buckets "
                        "only; col:value filters in the query compose)")
    q.add_argument("--cardinality", default="", metavar="COLS",
                   help="also report the number of distinct stored values "
                        "of these comma-separated sidecar columns over "
                        "the matched docs (ES cardinality aggregation, "
                        "exact; col:value filters in the query compose)")
    q.add_argument("--stats-by", default="", metavar="BYCOL:VALCOL",
                   dest="stats_by",
                   help="also report per-BYCOL-value stats of NUMERIC "
                        "VALCOL over the matched docs (ES terms+stats "
                        "sub-aggregation; buckets ordered and cut like "
                        "--facets at -k; col:value filters compose)")
    q.add_argument("--percentiles", default="", metavar="COL[:P1,P2,...]",
                   help="also report exact percentiles of this NUMERIC "
                        "sidecar column over the matched docs (ES "
                        "percentiles aggregation; default percents "
                        "25,50,75,95,99; col:value filters compose)")
    q.add_argument("--significant", default="", metavar="COLS",
                   help="also report which values of these comma-separated "
                        "sidecar columns are overrepresented in the "
                        "matched docs vs the whole corpus (ES "
                        "significant_terms, JLH score, top -k; col:value "
                        "filters narrow the foreground only)")
    q.add_argument("--demote", default="", metavar="TERMS",
                   help="soft-demote docs containing ANY of these "
                        "space-separated terms (ES boosting query; plain/"
                        "^boosted queries only; see --negative-boost)")
    q.add_argument("--negative-boost", default=0.5, type=float,
                   dest="negative_boost", metavar="NB",
                   help="the --demote multiplier in (0, 1] (default 0.5)")
    q.add_argument("--multi-terms", default="", metavar="COLS",
                   dest="multi_terms",
                   help="also report match counts per composite key of "
                        "these 2+ comma-separated sidecar columns (ES "
                        "multi_terms; ordered/cut like --facets at -k)")
    q.add_argument("--rare", default="", metavar="COL[:MAXDC]",
                   help="also report the long-tail values of this sidecar "
                        "column over the matched docs (ES rare_terms, "
                        "count asc, top -k; optional MAXDC keeps only "
                        "values with at most that many matches)")
    q.add_argument("--fields", default="", metavar="COLS",
                   help="decorate every hit with these comma-separated "
                        "metadata sidecar columns (ES docvalue_fields)")
    q.add_argument("--significant-text", default=0, type=int,
                   metavar="SAMPLE", dest="sig_text",
                   help="also report the terms characterizing the matched "
                        "docs (ES significant_text): JLH vs the df "
                        "background over the top SAMPLE hits' stored "
                        "text; requires --store, top -k terms")
    q.add_argument("--top-hits", default="", metavar="COL[:K]",
                   dest="top_hits",
                   help="also report the K best hits (default 3) per top "
                        "value of this sidecar column — grouped search "
                        "results (ES terms+top_hits; buckets cut at -k, "
                        "ordered like --facets; col:value filters "
                        "compose)")
    q.add_argument("--store", default="", metavar="EXPORT_DIR",
                   help="hydrate hits from this export_clean_corpus "
                        "directory (stored fields) and attach KWIC "
                        "snippets (query-then-fetch)")
    q.add_argument("--snippet-window", type=int, default=5)
    q.add_argument("--collapse", default="", metavar="COL",
                   help="field collapsing: return the best doc per "
                        "distinct value of this sidecar column "
                        "(plain/expanded BM25 queries only)")
    q.add_argument("--after", default="", metavar="DOC:SCORE",
                   help="search_after cursor: the previous page's last "
                        "hit as doc_id:score, both copied VERBATIM from "
                        "that page's output — returns the next page")
    q.add_argument("--title-index", default="", metavar="DIR",
                   help="multi-field most_fields: also rank this title-"
                        "field index at --title-weight (plain/boosted "
                        "queries; --serve uses the sharded multi-field "
                        "engine)")
    q.add_argument("--title-weight", type=float, default=2.0)
    q.add_argument("--mf-mode", default="most_fields", dest="mf_mode",
                   choices=["most_fields", "best_fields"],
                   help="multi-field combine: field-weighted SUM "
                        "(most_fields, default) or Lucene DisMax — best "
                        "field + tie-breaker x the rest (best_fields)")
    q.add_argument("--tie-breaker", type=float, default=0.0,
                   dest="tie_breaker", metavar="TB",
                   help="best_fields tie breaker in [0, 1] (0 = pure "
                        "dis_max, 1 = the most_fields sum)")
    q.add_argument("--prior", default="", metavar="COL:WEIGHT",
                   help="static-score ranking: BM25 + WEIGHT × the numeric "
                        "sidecar column COL (function_score; plain/boosted "
                        "queries, col:value chunks stay filters)")
    q.add_argument("--msm", type=int, default=0, metavar="N",
                   help="minimum_should_match: hits must contain at least "
                        "N distinct should terms (boolean +/- queries and "
                        "plain term lists)")
    q.set_defaults(fn=cmd_query)

    e = sub.add_parser(
        "explain", help="per-term score breakdown of one doc for a query")
    io(e, needs_input=False)
    e.add_argument("query", help="query string (same mini-language as "
                                 "the query subcommand)")
    e.add_argument("doc_id", type=int)
    e.set_defaults(fn=cmd_explain)

    sv = sub.add_parser(
        "serve", help="query server: stdin query lines -> stdout JSON lines")
    io(sv, needs_input=False)
    sv.add_argument("-k", type=int, default=10)
    sv.add_argument("--coordinators", type=int, default=4)
    sv.add_argument("--pool", type=int, default=4,
                    help="shards per pool replica")
    sv.add_argument("--pool-replicas", type=int, default=1)
    sv.set_defaults(fn=cmd_serve)

    s = sub.add_parser("stats", help="print index manifest summary")
    io(s, needs_input=False)
    s.set_defaults(fn=cmd_stats)
    return p


def main(argv: list[str] | None = None) -> int:
    global _OWNS_RAY
    args = make_parser().parse_args(argv)
    try:
        return args.fn(args)
    finally:
        # end only a session THIS run started (repo rule: CLI scripts own
        # their session; a caller's — e.g. pytest's — must survive).  Reset
        # the flag: a later main() call in the same process must not shut
        # down a session the CALLER started in between.
        if _OWNS_RAY:
            import ray

            if ray.is_initialized():
                ray.shutdown()
            _OWNS_RAY = False


if __name__ == "__main__":
    sys.exit(main())
