"""HTML → text extraction: the engine's analog of the reference's wikitext
extraction kernel ``_process_article``
(``/root/reference/src/wikirec/data_utils.py:204-241``, strip at :238).

The reference parses MediaWiki markup and keeps ``wikicode.strip_code()``
output; our input is Common-Crawl-style HTML (``input_hint``), so the kernel
strips page chrome (head/script/style/header/nav/footer/comments), keeps the
``<article>`` body's paragraph text, and unescapes HTML entities.  The
invariant (pinned by the north rule) is **byte-identical extracted text per
url** versus the single-process oracle ``extract_text_single`` — and, for the
synthetic corpus, versus the ground-truth ``text`` column the renderer wrapped
(``sources/synth.py`` is the exact inverse).

Runs as a stateless ``map_batches`` stage over zero-copy Arrow batches; the
regexes are compiled once per process at import (no per-batch setup).
"""

from __future__ import annotations

import html as _html
import re

import pyarrow as pa

_ARTICLE_RE = re.compile(rb"<article>(.*?)</article>", re.DOTALL)
_SCRIPT_STYLE_RE = re.compile(rb"<(script|style)\b.*?</\1>", re.DOTALL)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_PARA_RE = re.compile(rb"<p>(.*?)</p>", re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]+>")
_TITLE_RE = re.compile(rb"<title[^>]*>(.*?)</title>", re.DOTALL)


def extract_title_single(html: bytes) -> str:
    """One page -> its ``<title>`` text (first tag, inner markup stripped,
    entities unescaped, surrounding whitespace trimmed; "" when the page
    has none).  The second retrieval FIELD of a web page — pure and
    deterministic like ``extract_text_single``, and like it the page is
    comment/script/style-stripped FIRST, so a ``<title>`` inside a
    comment or a script string literal can never shadow the real tag
    (review r5)."""
    page = _COMMENT_RE.sub(b"", _SCRIPT_STYLE_RE.sub(b"", html))
    m = _TITLE_RE.search(page)
    if m is None:
        return ""
    raw = _TAG_RE.sub(b"", m.group(1))
    return _html.unescape(raw.decode("utf-8", errors="replace")).strip()


def extract_text_single(html: bytes) -> str:
    """One page -> extracted text. Pure, deterministic; the per-row oracle.

    Semantics: within <article>…</article> (fall back to the whole page),
    after dropping scripts/styles/comments, the text is the <p> block
    contents — inner tags stripped, entities unescaped — joined by a single
    space.  No unicode normalization of any kind (byte-identity requires
    passing utf-8 through untouched).
    """
    m = _ARTICLE_RE.search(html)
    body = m.group(1) if m else html
    body = _SCRIPT_STYLE_RE.sub(b"", body)
    body = _COMMENT_RE.sub(b"", body)
    paras = [_TAG_RE.sub(b"", p) for p in _PARA_RE.findall(body)]
    return _html.unescape(b" ".join(paras).decode("utf-8", errors="replace"))


def extract_batch(
    batch: pa.Table, html_col: str = "html", out_col: str = "text",
    title_col: str | None = None,
) -> pa.Table:
    """(url, html, …) batch -> (url, text) with text extracted per row.

    Regex over bytes per row; the patterns are module-level compiled (setup
    cost amortized across the whole worker lifetime).  ``title_col`` also
    emits each page's ``<title>`` as a second field (one pass over the
    already-fetched html bytes, no second decode of the column).
    """
    htmls = batch[html_col].to_pylist()
    texts = pa.array([extract_text_single(h) for h in htmls], type=pa.string())
    cols, names = [], []
    for name in batch.column_names:
        if name in (html_col, out_col, title_col):
            continue
        cols.append(batch[name])
        names.append(name)
    cols.append(texts)
    names.append(out_col)
    if title_col is not None:
        cols.append(
            pa.array([extract_title_single(h) for h in htmls], type=pa.string())
        )
        names.append(title_col)
    return pa.table(dict(zip(names, cols)))


def extract_pages(
    ds, html_col: str = "html", out_col: str = "text",
    title_col: str | None = None,
):
    """Dataset(url, warc_ts, html, lang, …) -> Dataset with html replaced by
    extracted text. Stateless map_batches; batch_size kept moderate because
    html is a wide binary column.  ``title_col="title"`` adds the page
    title as a second retrieval field (for per-field indexes /
    ``MultiFieldReader``)."""
    return ds.map_batches(
        lambda b: extract_batch(
            b, html_col=html_col, out_col=out_col, title_col=title_col
        ),
        batch_format="pyarrow",
        batch_size=1024,
    )
