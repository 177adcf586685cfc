"""Web-corpus curation filters: domain caps, line-repetition ratio,
Gopher quality heuristics — each vs a brute-force oracle."""

import numpy as np
import pyarrow as pa
import pytest


def test_extract_domain():
    from wikirec_ray.pipelines.webfilters import extract_domain

    urls = pa.array(
        [
            "https://Example.org/a/b?q=1",
            "http://sub.site.com:8080/page#frag",
            "https://plain.net",
            "ftp://files.host.io/x",
        ]
    )
    got = extract_domain(urls).to_pylist()
    assert got == ["example.org", "sub.site.com", "plain.net", "files.host.io"]
    # userinfo stripped (anti-quota-bypass) and nulls survive as ''
    tricky = pa.array(
        ["https://alice@spam.com/p", "https://x:y@spam.com:8080/p", None]
    )
    assert extract_domain(tricky).to_pylist() == ["spam.com", "spam.com", ""]


def test_registrable_domain():
    from wikirec_ray.pipelines.webfilters import registrable_domain

    hosts = pa.array(
        [
            "www.a.blogspot.com",   # ICANN view: com suffix -> blogspot.com
            "b.blogspot.com",       # shares the quota with the one above
            "news.bbc.co.uk",       # multi-label suffix -> bbc.co.uk
            "bbc.co.uk",
            "deep.sub.site.org",    # single-label suffix -> site.org
            "site.org",
            "host.internal",        # unlisted TLD -> full-host fallback
            "localhost",            # no dots -> itself
            "co.uk",                # bare suffix degenerate -> itself
        ]
    )
    got = registrable_domain(hosts).to_pylist()
    assert got == [
        "blogspot.com", "blogspot.com", "bbc.co.uk", "bbc.co.uk",
        "site.org", "site.org", "host.internal", "localhost", "co.uk",
    ]


def test_domain_caps_registrable(ray_session):
    # the VERDICT r03 item-6 criterion: www.a.blogspot.com and
    # b.blogspot.com share ONE quota under the default eTLD+1 capping
    import ray.data

    from wikirec_ray.pipelines.webfilters import domain_caps

    rows = [(i, f"https://{'www.' if i % 2 else ''}u{i}.blogspot.com/p") for i in range(10)]
    rows += [(100 + i, f"https://only{i}.example.org/p") for i in range(3)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "url": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    out = domain_caps(ds, max_per_domain=4, keep_domain=True).take_all()
    got = sorted((r["doc_id"], r["domain"]) for r in out)
    # blogspot.com is ONE group (4 lowest ids kept); example.org another
    assert got == [
        (0, "blogspot.com"), (1, "blogspot.com"), (2, "blogspot.com"),
        (3, "blogspot.com"),
        (100, "example.org"), (101, "example.org"), (102, "example.org"),
    ]
    # full-host mode keeps every row (each host unique)
    assert domain_caps(ds, max_per_domain=4, registrable=False).count() == 13


def test_domain_caps(ray_session):
    import ray.data

    from wikirec_ray.pipelines.webfilters import domain_caps, extract_domain

    rows = []
    for i in range(30):
        dom = ["a.com", "b.org", "c.net"][i % 3]
        rows.append((i, f"https://{dom}/p/{i}"))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "url": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    out = domain_caps(ds, max_per_domain=3).take_all()
    got = sorted(r["doc_id"] for r in out)
    # brute-force oracle: 3 lowest ids per domain
    by_dom: dict = {}
    for i, u in rows:
        by_dom.setdefault(u.split("/")[2], []).append(i)
    want = sorted(i for ids in by_dom.values() for i in sorted(ids)[:3])
    assert got == want and len(got) == 9
    with pytest.raises(ValueError):
        domain_caps(ds, max_per_domain=0)


def test_line_dup_ratio(ray_session):
    import ray.data

    from wikirec_ray.pipelines.webfilters import line_dup_ratio

    docs = [
        (0, "nav\ncontent one\nnav\nfooter\nnav"),   # 5 lines, 3 distinct
        (1, "a\nb\nc"),                               # all distinct
        (2, ""),                                      # empty
        (3, "x\n\n  \nx"),                            # blanks ignored; 1 dup
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    )
    got = {r["doc_id"]: r for r in line_dup_ratio(ds).take_all()}
    assert got[0]["n_lines"] == 5 and abs(got[0]["dup_line_ratio"] - 2 / 5) < 1e-9
    assert got[1]["dup_line_ratio"] == 0.0
    assert got[2]["n_lines"] == 0 and got[2]["dup_line_ratio"] == 0.0
    assert got[3]["n_lines"] == 2 and got[3]["dup_line_ratio"] == 0.5


def test_gopher_quality_mask(ray_session):
    import ray.data

    from wikirec_ray.pipelines.webfilters import gopher_quality_mask

    good = "the quick brown fox jumps over the lazy dog again " * 10  # 100 words
    short = "too short"
    symbols = ("word " * 60) + "#" * 30
    bullets = "\n".join(f"- item {i}" for i in range(20))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array([good, short, symbols, bullets], pa.string()),
            }
        )
    )
    got = {r["doc_id"]: r for r in gopher_quality_mask(ds).take_all()}
    assert got[0]["keep"] is True or got[0]["keep"] == True  # noqa: E712
    assert got[0]["n_words"] == 100
    assert not got[1]["ok_words"]
    assert not got[2]["ok_symbols"]
    assert not got[3]["ok_bullets"] and not got[3]["keep"]


def _brute_line_dedup(docs: dict[int, str]):
    """Independent reimplementation: first (doc_id, line_idx) occurrence
    of each non-blank line wins; blanks always kept."""
    from wikirec_ray.pipelines.webfilters import ASCII_WS

    seen = set()
    out = {}
    for did in sorted(docs):
        kept, removed = [], 0
        for ln in docs[did].split("\n"):
            if ln.strip(ASCII_WS) == "":
                kept.append(ln)
            elif ln not in seen:
                seen.add(ln)
                kept.append(ln)
            else:
                removed += 1
        out[did] = ("\n".join(kept), len(kept), removed)
    return out


def test_dedup_lines_global(ray_session):
    import ray.data

    from wikirec_ray.pipelines.webfilters import dedup_lines_global

    docs = {
        0: "alpha beta\ncommon footer\ngamma",
        1: "common footer\ndelta\n \nalpha beta",   # both dups removed, blank kept
        2: "common footer\ncommon footer\nepsilon", # within-doc repeat also dedups
        3: "common footer",                          # whole doc removed -> ''
        4: "",                                       # empty doc: one blank line
    }
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(docs), pa.int64()),
                "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
            }
        )
    )
    got = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_removed"])
        for r in dedup_lines_global(ds, n_parts=4).take_all()
    }
    assert got == _brute_line_dedup(docs)
    # every doc emits a row even when all its lines were removed
    assert got[3] == ("", 0, 1)
    assert got[4] == ("", 1, 0)


def test_dedup_lines_global_order_invariant(ray_session):
    """Winner choice is (doc_id, line_idx)-deterministic, not block-order
    dependent: shuffling input block layout leaves the result unchanged."""
    import ray.data

    from wikirec_ray.pipelines.webfilters import dedup_lines_global

    rng_texts = [
        "\n".join(f"w{(i * 7 + j) % 23} line" for j in range(5)) for i in range(40)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(40)), pa.int64()),
            "text": pa.array(rng_texts, pa.string()),
        }
    )
    a = {
        r["doc_id"]: r["text"]
        for r in dedup_lines_global(
            ray.data.from_arrow(t), n_parts=8
        ).take_all()
    }
    rev = t.take(pa.array(list(range(39, -1, -1))))
    b = {
        r["doc_id"]: r["text"]
        for r in dedup_lines_global(
            ray.data.from_arrow(rev).repartition(7), n_parts=8
        ).take_all()
    }
    assert a == b
    brute = _brute_line_dedup({i: rng_texts[i] for i in range(40)})
    assert a == {k: v[0] for k, v in brute.items()}


def test_scrub_pii(ray_session):
    import ray.data

    from wikirec_ray.pipelines.webfilters import scrub_pii

    rows = [
        (0, "contact bob.smith+x@mail.example.org or call +1 (555) 123-4567 now"),
        (1, "server at 10.0.42.7 and backup 192.168.1.255 ok"),
        (2, "no pii here at all"),
        (3, None),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    got = {r["doc_id"]: r for r in scrub_pii(ds).take_all()}
    assert got[0]["text"] == "contact <EMAIL> or call <PHONE> now"
    assert (got[0]["n_email"], got[0]["n_phone"], got[0]["n_ipv4"]) == (1, 1, 0)
    assert got[1]["text"] == "server at <IP> and backup <IP> ok"
    assert got[1]["n_ipv4"] == 2
    assert got[2]["text"] == "no pii here at all"
    assert got[3]["text"] == ""  # null-safe


def _brute_rep_ratios(text: str, top_ns=(2, 3, 4), dup_ns=(5, 10)):
    words = [w for w in __import__("re").split(r"\s+", text) if w]
    tot = sum(len(w) for w in words) or 1
    out = {}
    for k in top_ns:
        grams = {}
        for i in range(len(words) - k + 1):
            g = tuple(words[i : i + k])
            grams[g] = grams.get(g, 0) + 1
        best = max(
            (c * sum(len(w) for w in g) for g, c in grams.items()), default=0
        )
        out[f"top{k}_char_frac"] = round(best / tot, 6)
    for k in dup_ns:
        grams = {}
        for i in range(len(words) - k + 1):
            g = tuple(words[i : i + k])
            grams[g] = grams.get(g, 0) + 1
        dup = sum(
            c * sum(len(w) for w in g) for g, c in grams.items() if c > 1
        )
        out[f"dup{k}_char_frac"] = round(dup / tot, 6)
    return out


def test_repetition_ratios(ray_session):
    import ray.data

    from wikirec_ray.pipelines.webfilters import repetition_ratios

    texts = [
        "buy now buy now buy now limited offer",          # heavy 2-gram rep
        # clean: 60 distinct words — the published thresholds assume docs
        # long enough that one n-gram can't dominate by chance
        " ".join(f"word{i:02d}" for i in range(60)),
        " ".join(["a b c d e f g h i j"] * 3),            # long dup 10-gram
        "one two",                                        # shorter than most n
        "",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    got = {r["doc_id"]: r for r in repetition_ratios(ds).take_all()}
    for i, t in enumerate(texts):
        want = _brute_rep_ratios(t)
        for key, v in want.items():
            assert abs(got[i][key] - v) < 1e-9, (i, key, got[i][key], v)
    # the planted-repetition docs fail the published thresholds; clean passes
    assert not got[0]["keep"]
    assert got[1]["keep"]
    assert not got[2]["keep"]
    # batch-split invariance: one doc per block gives identical stats
    got2 = {
        r["doc_id"]: r
        for r in repetition_ratios(ds.repartition(5)).take_all()
    }
    for i in got:
        assert {k: got[i][k] for k in got[i]} == {k: got2[i][k] for k in got2[i]}


def test_scrub_pii_ip_vs_phone_order(ray_session):
    """Multi-digit-octet IPs must scrub as <IP>, not <PHONE> (review r04:
    the phone pattern matches dot-separated digit groups), and the scrubbed
    column must respect text_col."""
    import ray.data

    from wikirec_ray.pipelines.webfilters import scrub_pii

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "content": ["host 192.168.10.25 and 10.22.33.44 tel 555-123-4567"],
            }
        )
    )
    r = scrub_pii(ds, text_col="content").take_all()[0]
    assert r["content"] == "host <IP> and <IP> tel <PHONE>"
    assert (r["n_ipv4"], r["n_phone"]) == (2, 1)
