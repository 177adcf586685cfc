"""Dedup / ANN / textstats / multimodal operator tests, incl. planted
near-duplicates (the synthetic corpus has none of its own)."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(ray_session, rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


BASE = (
    "spark join window hash merge sort filter scan table column row value "
    "stream batch vector group order key part customer line data query agg"
)


@pytest.fixture(scope="module")
def planted(ray_session):
    """10 distinct docs + 3 near-dup variants of doc 0 + 1 exact dup."""
    rng = np.random.default_rng(3)
    words = BASE.split()
    rows = []
    for i in range(10):
        w = [words[int(x)] for x in rng.integers(0, len(words), 60)]
        rows.append((i, " ".join(w)))
    base_words = rows[0][1].split()
    v1 = base_words.copy(); v1[5] = "changed"
    v2 = base_words.copy(); v2[10] = "other"; v2[20] = "words"
    v3 = base_words[:-3]
    rows += [(100, " ".join(v1)), (101, " ".join(v2)), (102, " ".join(v3))]
    rows.append((103, rows[0][1]))  # exact dup
    return rows


def test_exact_dedup(planted, ray_session):
    from wikirec_ray.pipelines.dedup import exact_dedup

    out = exact_dedup(_docs_ds(ray_session, planted)).take_all()
    by_fp = {r["fingerprint"]: r for r in out}
    assert len(out) == len(planted) - 1  # 103 collapses into 0
    dup = [r for r in out if r["n_dups"] == 2]
    assert len(dup) == 1 and dup[0]["keep_id"] == 0


def test_minhash_finds_planted_near_dups(planted, ray_session):
    from wikirec_ray.pipelines.dedup import minhash_dedup_groups

    out = minhash_dedup_groups(
        _docs_ds(ray_session, planted), threshold=0.5
    ).take_all()
    group = {r["doc_id"]: r["group_id"] for r in out}
    # all planted variants cluster with doc 0
    assert group[100] == group[0] == group[101] == group[102] == group[103]
    # distinct docs stay singletons
    assert len({group[i] for i in range(1, 10)}) == 9
    assert all(group[i] != group[0] for i in range(1, 10))


def test_label_propagation_matches_union_find(planted, ray_session):
    """The distributed min-label components must equal driver union-find
    over the same candidate pairs (VERDICT r01 item 1)."""
    import pyarrow.compute as pc

    from wikirec_ray.pipelines.dedup import connected_components, minhash_candidates

    cands = minhash_candidates(_docs_ds(ray_session, planted))
    pairs = cands.map_batches(
        lambda b: b.filter(pc.greater_equal(b["est_jaccard"], 0.5)),
        batch_format="pyarrow",
    ).materialize()
    # oracle: classic union-find over the (small, test-sized) pair list
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in pairs.take_all():
        a, b = find(int(r["id_a"])), find(int(r["id_b"]))
        if a != b:
            parent[max(a, b)] = min(a, b)
    want = {n: find(n) for n in list(parent)}
    got = {r["key"]: r["label"] for r in connected_components(pairs).take_all()}
    assert set(got) == set(want) | {v for v in want.values()}
    assert all(got[n] == want.get(n, n) for n in got)


def test_label_propagation_chain(ray_session):
    """A path graph (diameter > 1) needs several propagation rounds."""
    import ray.data

    from wikirec_ray.pipelines.dedup import connected_components

    edges = [(i, i + 1) for i in range(9, 0, -1)] + [(20, 21), (23, 22)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in edges], pa.int64()),
                "id_b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    got = {r["key"]: r["label"] for r in connected_components(ds).take_all()}
    assert all(got[i] == 1 for i in range(1, 11))
    # a LONG chain (diameter 41 > the old 15-iteration cap) must converge
    # fully under the defaults (review finding)
    long_edges = [(i, i + 1) for i in range(41)]
    ds2 = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in long_edges], pa.int64()),
                "id_b": pa.array([b for _, b in long_edges], pa.int64()),
            }
        )
    )
    got2 = {r["key"]: r["label"] for r in connected_components(ds2).take_all()}
    assert all(got2[i] == 0 for i in range(42)), got2
    assert got[20] == got[21] == 20
    assert got[22] == got[23] == 22


def test_minhash_estimate_close_to_true_jaccard(planted):
    from wikirec_ray.functions.hashing import (
        minhash_params,
        minhash_signature,
        shingle_hashes,
        token_hashes,
    )

    a, b = minhash_params(256)
    t0 = planted[0][1].split()
    t1 = planted[10][1].split()  # one word changed
    s0 = set(map(tuple, zip(t0, t0[1:], t0[2:])))
    s1 = set(map(tuple, zip(t1, t1[1:], t1[2:])))
    true_j = len(s0 & s1) / len(s0 | s1)
    sig0 = minhash_signature(shingle_hashes(token_hashes(t0), 3), a, b)
    sig1 = minhash_signature(shingle_hashes(token_hashes(t1), 3), a, b)
    est = (sig0 == sig1).mean()
    assert abs(est - true_j) < 0.15


def test_simhash_candidates(planted, ray_session):
    """Full brute oracle (this is the SimHash family's external check now
    that the driver `simhash` slot was retired final-r5 for
    `collapsed_search`): the distributed banded-bucket pipeline must
    return EXACTLY the pairs within max_hamming of each other — any pair
    at Hamming ≤ 3 shares ≥1 of the 4 16-bit bands (pigeonhole), so
    banding loses nothing; per-doc fingerprints come from the scalar
    kernel already pinned == the flat kernel in test_compress."""
    from wikirec_ray.functions.hashing import popcount64
    from wikirec_ray.pipelines.dedup import (
        simhash_candidates,
        simhash_fingerprints,
    )

    ds = _docs_ds(ray_session, planted)
    fps = {
        int(r["doc_id"]): np.uint64(r["simhash"])
        for r in simhash_fingerprints(ds).take_all()
    }
    ids = sorted(fps)

    def bands(x):
        return [(int(x) >> (16 * j)) & 0xFFFF for j in range(4)]

    for max_h in (3, 10):
        want = {}
        for i, a in enumerate(ids):
            xor = np.asarray(
                [fps[a] ^ fps[b] for b in ids[i + 1:]], np.uint64
            )
            if not len(xor):
                continue
            hs = popcount64(xor)
            for b, h in zip(ids[i + 1:], hs.tolist()):
                # candidacy = shares >=1 of the 4 16-bit bands; at
                # max_h <= 3 the pigeonhole makes that automatic (4 bands,
                # <=3 flipped bits), which the max_h=3 leg asserts
                shares = any(
                    ba == bb for ba, bb in zip(bands(fps[a]), bands(fps[b]))
                )
                if h <= max_h and (shares or max_h <= 3):
                    assert shares or max_h > 3  # pigeonhole sanity
                    want[(a, b)] = int(h)
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_candidates(ds, max_hamming=max_h).take_all()
        }
        assert got == want
    assert (0, 103) in got and got[(0, 103)] == 0  # identical docs
    assert (0, 100) in got  # planted near-dups stay close in hamming space


def test_jaccard_pairs_exact(planted, ray_session):
    from wikirec_ray.pipelines.dedup import jaccard_pairs

    out = jaccard_pairs(_docs_ds(ray_session, planted)).take_all()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    # oracle for pair (0, 103): identical token sets
    assert got[(0, 103)] == 1.0
    # spot-check one pair against a set-based oracle
    t0 = set(planted[0][1].split())
    t5 = set(planted[5][1].split())
    want = round(len(t0 & t5) / len(t0 | t5), 6)
    assert abs(got[(0, 5)] - want) < 1e-9


def test_bucketed_embedding_dups_recall(ray_session, sf_dir):
    """The LSH-bucketed pairs path must recover most brute-force pairs at
    the oracle threshold while never broadcasting the full matrix."""
    import os

    import ray.data

    from wikirec_ray.pipelines.dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_bucketed,
    )

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    truth = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs(ds, threshold=0.4).take_all()
    }
    got_rows = embedding_dup_pairs_bucketed(ds, threshold=0.4, n_bits=3).take_all()
    got = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in got_rows}
    assert truth, "oracle produced no pairs — threshold mis-tuned"
    recall = len(truth & set(got)) / len(truth)
    assert recall >= 0.8, f"bucketed recall {recall:.2f} < 0.8"
    # no false positives: every reported pair really clears the threshold
    assert all(v >= 0.4 for v in got.values())
    assert set(got) <= truth


def test_embedding_dups_and_ann(ray_session, sf_dir):
    import os

    import pyarrow.parquet as pq
    import ray.data

    from wikirec_ray.pipelines.ann import ann_topk_queries, lsh_topk
    from wikirec_ray.pipelines.dedup import embedding_dup_pairs

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    # numpy oracle
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = t["vec_id"].to_numpy()
    mat = np.stack([np.asarray(v, np.float64) for v in t["embedding"].to_pylist()])
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = nm @ nm.T

    # brute-force ANN matches oracle
    out = ann_topk_queries(ds, n_queries=4, k=5).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["neighbor_id"], r["cos_sim"]))
    for q in range(4):
        row = sims[q].copy()
        row[q] = -np.inf
        r6 = np.round(row, 6)
        want = sorted(range(len(ids)), key=lambda j: (-r6[j], ids[j]))[:5]
        got = [n for n, _ in sorted(by_q[q], key=lambda x: (-x[1], x[0]))]
        assert got == [int(ids[j]) for j in want], q

    # embedding near-dup pairs match oracle at threshold
    thr = 0.4
    out2 = embedding_dup_pairs(ds, threshold=thr).take_all()
    got_pairs = {(r["id_a"], r["id_b"]) for r in out2}
    want_pairs = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[i] < ids[j] and sims[i, j] >= thr
    }
    assert got_pairs == want_pairs

    # LSH recall vs brute force; these synthetic embeddings are near-uniform
    # so candidate sets must stay generous (4 bits + 1-bit multiprobe covers
    # ~30% of the corpus → measured recall ~0.65)
    qv = mat[:4]
    lsh_out = lsh_topk(ds, ids[:4].tolist(), qv, k=5, n_bits=4).take_all()
    lsh_by_q = {}
    for r in lsh_out:
        lsh_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = []
    for q in range(4):
        brute = {n for n, _ in by_q[q]}
        approx = lsh_by_q.get(q, set())
        recalls.append(len(brute & approx) / max(len(brute), 1))
    assert np.mean(recalls) >= 0.4, recalls


def test_ivf_topk_recall(ray_session, sf_dir):
    import os

    import pyarrow.parquet as pq
    import ray.data

    from wikirec_ray.pipelines.ann import brute_force_topk, ivf_topk, train_ivf_centroids

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = t["vec_id"].to_numpy()
    mat = np.stack([np.asarray(v, np.float64) for v in t["embedding"].to_pylist()])
    centroids = train_ivf_centroids(ds, n_centroids=16)
    assert centroids.shape[1] == mat.shape[1]
    qv = mat[:4]
    brute = brute_force_topk(ds, ids[:4].tolist(), qv, k=5).take_all()
    approx = ivf_topk(ds, ids[:4].tolist(), qv, centroids, k=5, nprobe=6).take_all()
    by_q_b: dict = {}
    for r in brute:
        by_q_b.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    by_q_a: dict = {}
    for r in approx:
        by_q_a.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(by_q_b[q] & by_q_a.get(q, set())) / len(by_q_b[q]) for q in by_q_b
    ]
    # probing 6/16 partitions of near-uniform vectors
    assert np.mean(recalls) >= 0.5, recalls
    # full probe == exact
    exact_probe = ivf_topk(ds, ids[:4].tolist(), qv, centroids, k=5, nprobe=16).take_all()
    by_q_e: dict = {}
    for r in exact_probe:
        by_q_e.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert by_q_e == by_q_b


def test_textstats(ray_session):
    from wikirec_ray.pipelines.textstats import LangId, quality_scores

    rows = [
        (0, "the cat is on the mat and it is flat"),
        (1, "der hund ist von der stadt und das ist gut"),
        (2, "el perro de la casa es un animal por la noche"),
        (3, "xyzzy plugh"),
    ]
    ds = _docs_ds(ray_session, rows)
    out = {
        r["doc_id"]: r
        for r in ds.map_batches(
            LangId, batch_format="pyarrow", concurrency=2
        ).take_all()
    }
    assert out[0]["pred_lang"] == "en"
    assert out[1]["pred_lang"] == "de"
    assert out[2]["pred_lang"] == "es"
    assert out[3]["pred_lang"] == "und"

    q = {r["doc_id"]: r for r in quality_scores(ds).take_all()}
    assert q[0]["n_tokens"] == 10
    assert q[3]["uniq_ratio"] == 1.0
    assert 0 < q[0]["stop_ratio"] < 1


def test_props_k_histogram(ray_session):
    """JSON-props histogram (was the driver's props_k_hist slot, retired r5
    for facet/filtered search): regex extraction + combiner aggregation."""
    import ray.data

    from wikirec_ray.pipelines.textstats import props_k_histogram

    ds = ray.data.from_arrow(pa.table({"props": pa.array(
        [f'{{"k": {i % 3}, "x": 9}}' for i in range(20)]
        + ["no match", None], pa.string())}))
    got = {r["k"]: r["n_events"] for r in props_k_histogram(ds).take_all()}
    assert got == {0: 7, 1: 7, 2: 6}


def test_multimodal_plumbing(ray_session):
    from wikirec_ray.pipelines.multimodal import DecodeStage, _try_pil, media_features

    if _try_pil() is None:  # real kernel gated only when Pillow is absent
        with pytest.raises(NotImplementedError):
            DecodeStage(kernel="real")

    rows = [(0, "hello"), (1, ""), (2, "ünïcode")]
    out = {r["media_id"]: r for r in media_features(_docs_ds(ray_session, rows)).take_all()}
    assert out[0]["n_bytes"] == 5 and out[0]["first_byte"] == ord("h")
    assert out[1]["n_bytes"] == 0 and out[1]["first_byte"] == 0
    assert out[2]["n_bytes"] == len("ünïcode".encode()) and out[2]["mean_byte"] > 0


def test_bigrams(ray_session):
    from wikirec_ray.pipelines.textstats import bigram_counts

    rows = [(0, "a b a b c"), (1, "a b x")]
    out = bigram_counts(_docs_ds(ray_session, rows), top_n=10).take_all()
    got = {(r["w1"], r["w2"]): r["n"] for r in out}
    assert got == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1, ("b", "x"): 1}


def test_entry_contract(ray_session):
    """Driver smoke: entry() runs and yields rows with a stable schema."""
    import __ray_entry__ as em

    out = em.entry()
    rows = out.take_all()
    assert len(rows) >= 0
    assert set(rows[0].keys()) == {"query_id", "rank", "doc_id", "score"}
    names = set(em.queries())
    assert set(em.oracle_sql()) <= names


def test_ivf_partitioned_equals_query_time(ray_session, sf_dir, tmp_path):
    """The materialized-IVF query (reads only probed partition dirs) must
    return exactly what the per-batch-reassignment path returns with the
    same centroids and probes."""
    import os

    import ray.data

    from wikirec_ray.pipelines.ann import (
        head_query_vectors,
        ivf_build,
        ivf_topk,
        ivf_topk_partitioned,
    )

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out_dir = str(tmp_path / "ivf")
    centroids = ivf_build(ds, out_dir, n_centroids=8)
    assert os.path.exists(os.path.join(out_dir, "centroids.npy"))
    parts = [p for p in os.listdir(out_dir) if p.startswith("ivf_part=")]
    assert len(parts) >= 2, "expected a real partition layout"

    qids, qvecs = head_query_vectors(ds, 4)
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in ivf_topk(ds, qids, qvecs, centroids, k=5, nprobe=3).take_all()
    )
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in ivf_topk_partitioned(
            out_dir, qids, qvecs, k=5, nprobe=3
        ).take_all()
    )
    assert got == want


def test_export_clean_corpus_resume(planted, ray_session, tmp_path):
    """Export composite: exact-dup drop (min-id survivor), quality filter,
    partitioned atomic writes, manifest resume, corruption heal."""
    import os

    import pyarrow.parquet as pq

    from wikirec_ray.pipelines.export import export_clean_corpus, read_exported

    rows = planted + [(200, ""), (201, "tiny")]  # empty + 1-token docs
    ds = _docs_ds(ray_session, rows)
    out = str(tmp_path / "corpus")
    m = export_clean_corpus(ds, out, min_tokens=2, range_size=64, resume=False)
    got = {r["doc_id"]: r["n_tokens"] for r in read_exported(out).take_all()}
    # doc 103 is an exact dup of 0 -> dropped; 200 empty and 201 single-token
    # fail min_tokens=2; everything else survives
    assert 103 not in got and 200 not in got and 201 not in got
    assert set(got) == {r[0] for r in planted if r[0] != 103}
    assert got[0] == len(planted[0][1].split())
    assert m["n_docs"] == len(got)
    # resume: everything skips
    m2 = export_clean_corpus(ds, out, min_tokens=2, range_size=64, resume=True)
    assert all(v["skipped"] for v in m2["partitions"].values())
    # corrupt one partition -> only it rebuilds, content identical
    victim = os.path.join(out, sorted(m2["partitions"])[0])
    open(victim, "wb").write(b"garbage")
    m3 = export_clean_corpus(ds, out, min_tokens=2, range_size=64, resume=True)
    rebuilt = [k for k, v in m3["partitions"].items() if not v["skipped"]]
    assert rebuilt == [os.path.basename(victim)]
    got2 = {r["doc_id"]: r["n_tokens"] for r in read_exported(out).take_all()}
    assert got2 == got


def test_hash_join_semantics(ray_session):
    import ray.data

    from wikirec_ray.pipelines.joins import hash_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 3], pa.int64()),
                  "a": pa.array(["p", "q", "r", "s"])})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([2, 3, 4], pa.int64()),
                  "b": pa.array([20.0, 30.0, 40.0])})
    )
    inner = sorted(
        (r["k"], r["a"], r["b"]) for r in hash_join(left, right, "k").take_all()
    )
    assert inner == [(2, "q", 20.0), (3, "r", 30.0), (3, "s", 30.0)]
    lo = sorted(
        (r["k"], r["a"], r["b"])
        for r in hash_join(left, right, "k", join_type="left outer").take_all()
    )
    assert lo == [(1, "p", None), (2, "q", 20.0), (3, "r", 30.0), (3, "s", 30.0)]
    # different key names + suffix on collision
    right2 = ray.data.from_arrow(
        pa.table({"rk": pa.array([3], pa.int64()), "a": pa.array(["z"])})
    )
    out = hash_join(left, right2, left_on="k", right_on="rk").take_all()
    assert {(r["k"], r["a"], r["a_r"]) for r in out} == {(3, "r", "z"), (3, "s", "z")}
    import pytest as _pt

    with _pt.raises(ValueError):
        hash_join(left, right, "k", join_type="cross")


def test_broadcast_lookup_matches_hash_join(ray_session):
    """broadcast_lookup (ray.put'd small side, no shuffle) == hash_join on
    unique-key lookups for inner and left outer; duplicate right keys and
    unsupported join types refuse loudly."""
    import numpy as np
    import pytest as _pt
    import ray.data

    from wikirec_ray.pipelines.joins import broadcast_lookup, hash_join

    rng = np.random.default_rng(5)
    big = ray.data.from_arrow(
        pa.table({
            "k": pa.array(rng.integers(0, 40, 500), pa.int64()),
            "x": pa.array(rng.normal(size=500)),
        })
    ).repartition(7)
    dim = ray.data.from_arrow(
        pa.table({
            "dk": pa.array(list(range(0, 40, 2)), pa.int64()),
            "name": pa.array([f"n{i}" for i in range(0, 40, 2)]),
        })
    )

    def canon(ds):
        return sorted(
            (r["k"], round(r["x"], 9), r.get("name"))
            for r in ds.take_all()
        )

    for jt in ("inner", "left outer"):
        got = canon(broadcast_lookup(big, dim, "k", "dk", join_type=jt))
        want = canon(hash_join(big, dim, "k", "dk", join_type=jt))
        assert got == want and len(got) > 100, jt

    # collision suffix parity with hash_join
    dim2 = ray.data.from_arrow(
        pa.table({"dk": pa.array([3], pa.int64()), "x": pa.array([99.0])})
    )
    out = broadcast_lookup(big, dim2, "k", "dk").take_all()
    assert out and all(r["x_r"] == 99.0 and r["k"] == 3 for r in out)

    dup = ray.data.from_arrow(
        pa.table({"dk": pa.array([1, 1], pa.int64()), "name": pa.array(["a", "b"])})
    )
    with _pt.raises(ValueError, match="duplicate"):
        broadcast_lookup(big, dup, "k", "dk")
    with _pt.raises(ValueError, match="inner"):
        broadcast_lookup(big, dim, "k", "dk", join_type="right outer")

    # null left keys never match (review r5: the NaN->int64 cast is
    # undefined and could fabricate a hit): inner drops them, left outer
    # keeps them with null value columns
    nulls = ray.data.from_arrow(
        pa.table({"k": pa.array([2, None, 4], pa.int64()),
                  "x": pa.array([1.0, 2.0, 3.0])})
    )
    inner = broadcast_lookup(nulls, dim, "k", "dk").take_all()
    assert sorted((r["k"], r["name"]) for r in inner) == [(2, "n2"), (4, "n4")]
    louter = broadcast_lookup(nulls, dim, "k", "dk",
                              join_type="left outer").take_all()
    assert sorted((r["k"], r["name"]) for r in louter
                  if r["k"] is not None) == [(2, "n2"), (4, "n4")]
    assert [r["name"] for r in louter if r["k"] is None] == [None]


def test_approx_distinct_error_bound(ray_session, sf_dir):
    import os

    import duckdb
    import ray.data

    from wikirec_ray.pipelines.textstats import approx_distinct

    path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(path, columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{path}')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_multimodal_resize_and_frames(ray_session):
    import pytest as _pt

    from wikirec_ray.pipelines.multimodal import (
        DecodeStage,
        FrameSampleStage,
        ResizeStage,
        synth_media_batch,
    )

    docs = _docs_ds(ray_session, [(0, "x" * 300), (1, "y" * 10), (2, "")])
    media = docs.map_batches(synth_media_batch, batch_format="pyarrow")
    # resize: payload shrinks to header + 64 bytes, meta columns present
    resized = media.map_batches(
        ResizeStage, fn_constructor_kwargs={"target_w": 8, "target_h": 8},
        batch_format="pyarrow", concurrency=2,
    ).take_all()
    by_id = {r["media_id"]: r for r in resized}
    assert len(by_id[0]["payload"]) == DecodeStage.HEADER + 64
    assert len(by_id[1]["payload"]) == DecodeStage.HEADER + 10  # already small
    assert by_id[0]["meta_width"] == 8
    # frame sample: 300 bytes @ frame 64 -> 5 frames, every 4 -> idx 0, 4
    frames = media.map_batches(
        FrameSampleStage, fn_constructor_kwargs={"frame_size": 64, "every": 4},
        batch_format="pyarrow", concurrency=2,
    ).take_all()
    f0 = sorted(r["frame_idx"] for r in frames if r["media_id"] == 0)
    assert f0 == [0, 4]
    assert not [r for r in frames if r["media_id"] == 2]  # empty body -> none
    # real kernels stay honestly gated when their dependency is absent
    from wikirec_ray.pipelines.multimodal import _try_pil

    if _try_pil() is None:
        with _pt.raises(NotImplementedError):
            ResizeStage(kernel="real")
    with _pt.raises(NotImplementedError):
        FrameSampleStage(kernel="real")  # PyAV is never shipped here


def test_minhash_dedup_no_pairs(ray_session):
    """All-distinct corpus: every doc is its own group; the empty pair
    stream must not break the propagation loop or the final union."""
    import ray.data

    from wikirec_ray.pipelines.dedup import connected_components, minhash_dedup_groups

    ds = _docs_ds(
        ray_session,
        [(1, "totally unique alpha beta"), (2, "different gamma delta words")],
    )
    out = sorted(
        (r["doc_id"], r["group_id"])
        for r in minhash_dedup_groups(ds, threshold=0.99).take_all()
    )
    assert out == [(1, 1), (2, 2)]
    empty = ray.data.from_arrow(
        pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
    )
    assert connected_components(empty).take_all() == []


def test_export_stale_partition_not_read(planted, ray_session, tmp_path):
    """Re-exporting a shrunk corpus leaves old part files on disk; reads
    must serve only manifest-listed partitions."""
    import os

    from wikirec_ray.pipelines.export import export_clean_corpus, read_exported

    out = str(tmp_path / "corpus")
    export_clean_corpus(
        _docs_ds(ray_session, planted), out, min_tokens=1, range_size=8,
        resume=False,
    )
    n_parts_full = len(
        [p for p in os.listdir(out) if p.startswith("part-")]
    )
    # shrink to the first 5 docs (one range) without cleaning the dir
    export_clean_corpus(
        _docs_ds(ray_session, planted[:5]), out, min_tokens=1, range_size=8,
        resume=False,
    )
    assert (
        len([p for p in os.listdir(out) if p.startswith("part-")])
        == n_parts_full
    ), "stale files should still be on disk for this test to mean anything"
    got = sorted(r["doc_id"] for r in read_exported(out).take_all())
    assert got == [r[0] for r in planted[:5]]


def test_minhash_oracle_short_and_empty_docs(ray_session):
    """Review r03: the SQL oracle must reproduce shingle_hashes' short-doc
    (<k tokens → whole-doc fold) and empty-doc (shared sentinel signature)
    paths — pipeline and DuckDB compared on a corpus that exercises both."""
    import duckdb
    import pyarrow as pa
    import ray.data

    import __ray_entry__ as entrymod
    from wikirec_ray.pipelines.dedup import minhash_dedup_groups

    rows = [
        (0, "spark join window hash merge sort filter scan the big"),
        (1, "spark join window hash merge sort filter scan the big"),  # exact dup
        (2, "spark join"),            # short (2 tokens)
        (3, "spark join"),            # same short pair -> same fold shingle
        (4, "spark"),                 # single token
        (5, "merge"),                 # different single token
        (6, ""),                      # empty
        (7, ""),                      # empty -> sentinel-pairs with 6
        (8, "value vector stream dup key line slow fast column agg"),
    ]
    tbl = pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows], pa.string())}
    )
    ds = ray.data.from_arrow(tbl)
    got = {
        r["doc_id"]: r["group_id"]
        for r in minhash_dedup_groups(
            ds, threshold=entrymod.MINHASH_THRESHOLD,
            n_perm=entrymod.MINHASH_N_PERM, n_bands=entrymod.MINHASH_N_BANDS,
            shingle_k=entrymod.MINHASH_K,
        ).take_all()
    }
    con = duckdb.connect()
    con.register("documents", tbl)
    want = dict(con.execute(entrymod.oracle_sql()["minhash_dedup"]).fetchall())
    assert got == want
    # the semantic expectations themselves
    assert got[1] == got[0] and got[3] == got[2] and got[7] == got[6]
    assert got[4] != got[5]


def test_hash_join_supplier_part_region(ray_session, sf_dir):
    """Three-table distributed join over the remaining relational tables
    (supplier ⋈ nation ⋈ region), checked against DuckDB on the same
    parquet — covers the tables no driver entry reads."""
    import os

    import duckdb
    import ray.data

    from wikirec_ray.pipelines.joins import hash_join

    supplier = ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    nation = ray.data.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_regionkey", "n_name"],
    )
    region = ray.data.read_parquet(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    j = hash_join(supplier, nation, left_on="s_nationkey", right_on="n_nationkey")
    j = hash_join(j, region, left_on="n_regionkey", right_on="r_regionkey")
    got = sorted(
        (r["s_suppkey"], r["n_name"], r["r_name"]) for r in j.take_all()
    )
    con = duckdb.connect()
    want = sorted(
        map(tuple, con.execute(f"""
            SELECT s_suppkey, n_name, r_name
            FROM read_parquet('{os.path.join(sf_dir, "supplier.parquet")}') s
            JOIN read_parquet('{os.path.join(sf_dir, "nation.parquet")}') n
              ON s_nationkey = n_nationkey
            JOIN read_parquet('{os.path.join(sf_dir, "region.parquet")}') r
              ON n_regionkey = r_regionkey
        """).fetchall())
    )
    assert got == want and len(got) > 0


def test_pipelines_tolerate_empty_corpus(ray_session):
    """Every headline pipeline must run on a 0-row documents table — the
    classic production edge (an empty shard/partition)."""
    import ray.data

    from wikirec_ray.pipelines.dedup import exact_dedup, minhash_dedup_groups
    from wikirec_ray.pipelines.encode import encode_corpus
    from wikirec_ray.pipelines.textstats import lm_quality_scores, quality_scores
    from wikirec_ray.pipelines.webfilters import gopher_quality_mask
    from wikirec_ray.stages.phrases import train_phrases
    from wikirec_ray.stages.stats import corpus_stats, vocabulary_prune

    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    assert quality_scores(empty).count() == 0
    assert lm_quality_scores(empty).count() == 0
    assert exact_dedup(empty).count() == 0
    assert minhash_dedup_groups(empty).count() == 0
    assert vocabulary_prune(empty).count() == 0
    assert gopher_quality_mask(empty).count() == 0
    assert encode_corpus(empty).count() == 0
    assert train_phrases(empty) == {}
    assert corpus_stats(empty) == {"n_docs": 0, "total_tokens": 0, "avgdl": 0.0}


def test_lm_quality_scores_brute_oracle(ray_session):
    """Brute numpy oracle for the unigram-LM scorer — the hard check moved
    here when the lm_scores driver slot was retired (final r5) to fund
    regex_search: logp(t) = ln((tf_t + 1) / (T + |V|)), per-doc mean over
    its token stream, rounded 6dp."""
    import math
    import re as _re
    from collections import Counter

    import ray.data

    from wikirec_ray.pipelines.textstats import lm_quality_scores
    from wikirec_ray.schema import TOKEN_SPLIT_REGEX

    texts = [
        "spark join table spark spark",
        "window vector vector hash",
        "spark window",
        "singleton oddity",
        "",
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in lm_quality_scores(ds).take_all()
    }

    toks = {
        i: [t for t in _re.split(TOKEN_SPLIT_REGEX, x.lower()) if t]
        for i, x in enumerate(texts)
    }
    freq = Counter(t for ts in toks.values() for t in ts)
    total, v = sum(freq.values()), len(freq)
    for i, ts in toks.items():
        if not ts:
            assert i not in got  # empty docs emit no row (no tokens)
            continue
        want = sum(
            math.log((freq[t] + 1) / (total + v)) for t in ts
        ) / len(ts)
        assert got[i][0] == len(ts)
        assert got[i][1] == pytest.approx(round(want, 6), abs=2e-6), i


def test_keyword_and_phrase_snippets(ray_session):
    """KWIC snippet extraction == a DuckDB replay over the 1-indexed token
    list (same tokenizer contract as the oracle SQL elsewhere): every
    term/phrase occurrence, 0-based doc position, window-clamped context."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from wikirec_ray.pipelines.snippets import keyword_snippets, phrase_snippets

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    ids = list(range(160))
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(1, 25))))
             for _ in ids]
    texts[0] = ""          # empty doc
    texts[1] = "w1"        # single-token doc (window clamps both sides)
    texts[2] = "w1 w2 w1 w2 w1"  # overlapping phrase occurrences
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(tbl).repartition(5)

    con = duckdb.connect()
    con.register("docs", tbl)
    toks = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
            "x -> x <> '')")

    def canon(rows):
        return sorted((int(d), int(p), s) for d, p, s in rows)

    # --- keyword snippets -------------------------------------------------
    got = canon(
        (r["doc_id"], r["pos"], r["snippet"])
        for r in keyword_snippets(ds, ["w1", "w5"], window=2).take_all()
    )
    want = canon(con.execute(f"""
        WITH t AS (SELECT doc_id, {toks} AS toks FROM docs),
        h AS (SELECT doc_id, i, toks FROM t,
              LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) r
              WHERE toks[i] IN ('w1', 'w5'))
        SELECT doc_id, i - 1 AS pos,
               array_to_string(toks[greatest(i - 2, 1) :
                                    least(i + 2, len(toks))], ' ') AS snippet
        FROM h
    """).fetchall())
    assert got == want and len(got) > 50

    # --- phrase snippets --------------------------------------------------
    got_p = canon(
        (r["doc_id"], r["pos"], r["snippet"])
        for r in phrase_snippets(ds, ["w1", "w2"], window=1).take_all()
    )
    want_p = canon(con.execute(f"""
        WITH t AS (SELECT doc_id, {toks} AS toks FROM docs),
        h AS (SELECT doc_id, i, toks FROM t,
              LATERAL (SELECT unnest(range(1, len(toks))) AS i) r
              WHERE toks[i] = 'w1' AND toks[i + 1] = 'w2')
        SELECT doc_id, i - 1 AS pos,
               array_to_string(toks[greatest(i - 1, 1) :
                                    least(i + 2, len(toks))], ' ') AS snippet
        FROM h
    """).fetchall())
    assert got_p == want_p and len(got_p) > 3
    # doc 2 has the overlapping occurrences at 0 and 2
    assert [(d, p) for d, p, _ in got_p if d == 2] == [(2, 0), (2, 2)]

    # single-token and empty docs survive the clamps
    got1 = [(r["doc_id"], r["pos"], r["snippet"])
            for r in keyword_snippets(ds, ["w1"], window=3).take_all()
            if r["doc_id"] == 1]
    assert got1 == [(1, 0, "w1")]
