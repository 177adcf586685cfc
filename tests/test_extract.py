"""HTML→text extraction: byte-identity per url (the input_hint invariant),
vs both the single-process oracle and the ground-truth text column."""

import os

import pyarrow as pa

from wikirec_ray.sources.synth import build_pages, make_url, render_html
from wikirec_ray.stages.extract import extract_batch, extract_pages, extract_text_single


def test_render_extract_inverse_edge_cases():
    for txt in ["", " ", "a", "a  b", "x & y < z > w", "tab\there", "trailing ",
                "ünïcodé — em–dash ’quote’", "a" * 5000]:
        h = render_html(13, txt, "en", "src1")
        assert extract_text_single(h) == txt


def test_extract_strips_chrome():
    h = render_html(2, "hello world", "en", "s")
    t = extract_text_single(h)
    assert t == "hello world"
    assert "home" not in t and "boilerplate" not in t and "crawl" not in t


def test_extract_without_article_tag():
    assert extract_text_single(b"<html><p>plain &amp; simple</p></html>") == "plain & simple"


def test_extract_batch_drops_html_col():
    b = pa.table(
        {
            "url": ["u1"],
            "html": [render_html(0, "some text", "en", "s")],
            "lang": ["en"],
        }
    )
    out = extract_batch(b)
    assert out.column_names == ["url", "lang", "text"]
    assert out["text"].to_pylist() == ["some text"]


def test_pages_pipeline_byte_identity(ray_session, sf_dir):
    """Full Ray pipeline: synthesize pages, extract text from html, compare
    per-url byte equality against the ground-truth text column."""
    import pyarrow.parquet as pq
    import ray.data

    pages_dir = build_pages(sf_dir)
    truth = {
        r["url"]: r["text"]
        for r in pq.read_table(pages_dir, columns=["url", "text"]).to_pylist()
    }
    extracted = extract_pages(
        ray.data.read_parquet(pages_dir, columns=["url", "html"])
    ).take_all()
    assert len(extracted) == len(truth)
    for row in extracted:
        assert row["text"] == truth[row["url"]], row["url"]


def test_pages_build_idempotent(ray_session, sf_dir):
    # second call must reuse the cache (reference idempotency pattern,
    # data_utils.py:302,457-459; tested twice-called like conftest.py:27-29)
    d1 = build_pages(sf_dir)
    mtime = os.path.getmtime(os.path.join(d1, "_SUCCESS"))
    d2 = build_pages(sf_dir)
    assert d1 == d2
    assert os.path.getmtime(os.path.join(d2, "_SUCCESS")) == mtime


def test_url_is_unique_key(ray_session, sf_dir):
    import pyarrow.parquet as pq

    urls = pq.read_table(build_pages(sf_dir), columns=["url"])["url"].to_pylist()
    assert len(urls) == len(set(urls))
    assert make_url(7, "src1", "en") == "https://example.org/src1/en/00000007"
