"""merge_indexes — combining independently built indexes by file reuse.

Contracts pinned here (see ``stages/merge.py``):
- merged(build(A), build(B)) == build(A ∪ B) — segments, df, stats and
  every retrieval route (exact, WAND, phrase over positions AND the
  precomputed-bigram fast path, facet/filtered via merged sidecars);
- the partitioning assumption is enforced loudly: overlapping doc
  ranges, mismatched layouts, pending tombstones, mixed sidecars and
  diverging bigram sets all raise before any file is written;
- the merged index is a first-class index: delete + compact work on it,
  and (hardlink reuse) compacting the merged index never mutates the
  source indexes' bytes.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wikirec_ray.pipelines.query import IndexReader
from wikirec_ray.schema import DOC_RANGE_SIZE
from wikirec_ray.stages.index_build import build_index
from wikirec_ray.stages.merge import merge_indexes

N_A, N_B = 140, 170
OFFSET_B = 2 * DOC_RANGE_SIZE  # crawl B's id block: ranges 2..


def _texts(n, seed0):
    vocab = np.array([f"w{i}" for i in range(24)])
    probs = 1.0 / np.arange(1, 25)
    probs /= probs.sum()
    out = []
    for i in range(n):
        rng = np.random.default_rng(seed0 + i)
        ln = int(rng.integers(6, 50))
        out.append(" ".join(rng.choice(vocab, size=ln, p=probs)))
    return out


def _ds(ids, texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )


def _corpora():
    ids_a = list(range(N_A))
    ids_b = [OFFSET_B + i for i in range(N_B)]
    tx_a, tx_b = _texts(N_A, 100), _texts(N_B, 9000)
    return (ids_a, tx_a), (ids_b, tx_b)


QUERY_SETS = [["w0"], ["w1", "w3"], ["w0", "w2", "w7"], ["w5", "w5"],
              ["w19", "w23"], ["zzabsent"], ["w4", "zzabsent"]]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("merge")
    (ids_a, tx_a), (ids_b, tx_b) = _corpora()
    dir_a, dir_b = str(root / "ia"), str(root / "ib")
    dir_full = str(root / "ifull")
    kw = dict(resume=False, store_positions=True, precompute_bigrams=0)
    build_index(_ds(ids_a, tx_a), dir_a, **kw)
    build_index(_ds(ids_b, tx_b), dir_b, **kw)
    build_index(_ds(ids_a + ids_b, tx_a + tx_b), dir_full, **kw)
    merged = str(root / "im")
    merge_indexes([dir_a, dir_b], merged)
    return {"a": dir_a, "b": dir_b, "full": dir_full, "merged": merged,
            "root": root}


def test_merge_equals_full_build(built):
    rm, rf = IndexReader(built["merged"]), IndexReader(built["full"])
    assert rm.stats == rf.stats
    assert rm.df == rf.df
    for terms in QUERY_SETS:
        assert rm.topk(terms, 10) == rf.topk(terms, 10)
        assert rm.topk_wand(terms, 10, force_wand=True) == \
            rf.topk(terms, 10)
    assert rm.phrase_topk(["w0", "w1"], 10) == rf.phrase_topk(["w0", "w1"], 10)
    assert rm.near_topk(["w0", "w2"], 10, window=4) == \
        rf.near_topk(["w0", "w2"], 10, window=4)


def test_merged_segments_identical_to_full_build(built):
    # the per-range encoders and the tpart merge are deterministic, so the
    # merged segments must equal a full build's TABLE-for-TABLE
    seg_m = sorted(os.listdir(os.path.join(built["merged"], "segments")))
    seg_f = sorted(os.listdir(os.path.join(built["full"], "segments")))
    assert seg_m == seg_f
    for name in seg_m:
        tm = pq.read_table(os.path.join(built["merged"], "segments", name))
        tf = pq.read_table(os.path.join(built["full"], "segments", name))
        assert tm.equals(tf), name


def test_merge_precomputed_bigrams(ray_session, tmp_path):
    (ids_a, tx_a), (ids_b, tx_b) = _corpora()
    dir_a, dir_b = str(tmp_path / "pa"), str(tmp_path / "pb")
    kw = dict(resume=False, store_positions=True)
    build_index(_ds(ids_a, tx_a), dir_a, precompute_bigrams=8, **kw)
    # same pair set via the frozen-set reuse path: build B with A's pairs
    from wikirec_ray.state.segments import load_bigram_pairs

    pairs = load_bigram_pairs(dir_a)
    # diverging sets must be rejected UNCONDITIONALLY: build B with an
    # explicit pair list of the same SIZE but different content
    build_index(_ds(ids_b, tx_b), dir_b,
                precompute_bigrams=pairs[:-1] + [("zz", "qq")], **kw)
    bad_out = str(tmp_path / "pm_bad")
    with pytest.raises(ValueError, match="bigram"):
        merge_indexes([dir_a, dir_b], bad_out)
    assert not os.path.exists(bad_out)  # rejected before any write
    # equal sets merge, and the composite fast path serves the union
    dir_b2 = str(tmp_path / "pb2")
    build_index(_ds(ids_b, tx_b), dir_b2, precompute_bigrams=pairs, **kw)
    merged = str(tmp_path / "pm")
    merge_indexes([dir_a, dir_b2], merged)
    rm = IndexReader(merged)
    dir_full = str(tmp_path / "pfull")
    build_index(_ds(ids_a + ids_b, tx_a + tx_b), dir_full,
                precompute_bigrams=pairs, **kw)
    rf = IndexReader(dir_full)
    assert rm.bigrams == rf.bigrams and len(rm.bigrams) > 0
    w1, w2 = pairs[0]
    assert rm.phrase_topk([w1, w2], 10) == rf.phrase_topk([w1, w2], 10)


def test_merge_meta_sidecars(built, tmp_path):
    import shutil

    from wikirec_ray.stages.doc_meta import build_doc_meta

    (ids_a, tx_a), (ids_b, tx_b) = _corpora()
    # work on COPIES: the module-scoped fixture indexes must stay
    # sidecar-free for the other tests
    dir_a, dir_b = str(tmp_path / "ia"), str(tmp_path / "ib")
    shutil.copytree(built["a"], dir_a)
    shutil.copytree(built["b"], dir_b)

    def attrs(ids):
        return _ds(ids, ["" for _ in ids]).map_batches(
            lambda b: pa.table({
                "doc_id": b["doc_id"],
                "lang": pa.array(
                    ["en" if i % 3 else "de" for i in b["doc_id"].to_pylist()],
                    pa.string()),
            }),
            batch_format="pyarrow",
        )

    build_doc_meta(attrs(ids_a), dir_a, ["lang"], resume=False)
    # mixed with/without sidecars must raise BEFORE any write (silent
    # absence would only surface at query time)
    merged_mixed = str(tmp_path / "mixed")
    with pytest.raises(ValueError, match="sidecar"):
        merge_indexes([dir_a, dir_b], merged_mixed)
    assert not os.path.exists(merged_mixed)
    build_doc_meta(attrs(ids_b), dir_b, ["lang"], resume=False)
    merged = str(tmp_path / "meta_merged")
    merge_indexes([dir_a, dir_b], merged)
    rm = IndexReader(merged)
    assert rm.meta_cols() == ["lang"]
    full_counts = {}
    for i in list(range(N_A)) + [OFFSET_B + j for j in range(N_B)]:
        v = "en" if i % 3 else "de"
        full_counts[v] = full_counts.get(v, 0) + 1
    got = dict(rm.facet_counts(["w0"], "lang", 5))
    # w0 is a near-universal zipf head term; facet counts must span crawls
    assert set(got) == {"en", "de"}
    assert rm.filtered_topk(["w0", "w1"], 5, "lang", "de") == [
        hit for hit in rm.topk(["w0", "w1"], 10**6)
        if hit[0] % 3 == 0
    ][:5]


def test_merge_rejections(built, tmp_path):
    (ids_a, tx_a), _ = _corpora()
    # overlapping ranges: a third index reusing crawl A's id block
    dir_c = str(tmp_path / "overlap")
    build_index(_ds([5, 6, 7], ["w0 w1", "w2", "w0 w3"]), dir_c,
                resume=False, store_positions=True)
    with pytest.raises(ValueError, match="range"):
        merge_indexes([built["a"], dir_c], str(tmp_path / "m1"))
    # layout mismatch: positions off vs on
    dir_d = str(tmp_path / "plain")
    build_index(_ds([3 * DOC_RANGE_SIZE], ["w0 w1"]), dir_d, resume=False)
    with pytest.raises(ValueError, match="store_positions"):
        merge_indexes([built["a"], dir_d], str(tmp_path / "m2"))
    # tombstones pending
    from wikirec_ray.stages.lifecycle import delete_docs

    dir_e = str(tmp_path / "tomb")
    build_index(_ds([3 * DOC_RANGE_SIZE + i for i in range(4)],
                    ["w0 w1", "w2 w0", "w1", "w0"]), dir_e,
                resume=False, store_positions=True)
    delete_docs(dir_e, [3 * DOC_RANGE_SIZE])
    with pytest.raises(ValueError, match="tombstone"):
        merge_indexes([built["a"], dir_e], str(tmp_path / "m3"))
    # output already an index
    with pytest.raises(ValueError, match="already"):
        merge_indexes([built["a"], built["b"]], built["full"])
    # fewer than two inputs
    with pytest.raises(ValueError, match="two"):
        merge_indexes([built["a"]], str(tmp_path / "m4"))


def test_merged_index_is_first_class(built, tmp_path):
    """delete + compact on the merged index; hardlinked sources unharmed."""
    import shutil

    from wikirec_ray.stages.lifecycle import compact_index, delete_docs

    merged2 = str(tmp_path / "m_lifecycle")
    shutil.copytree(built["merged"], merged2, copy_function=os.link)
    ra_before = IndexReader(built["a"]).topk(["w0", "w1"], 10)
    victim = IndexReader(merged2).topk(["w0", "w1"], 1)[0][0]
    delete_docs(merged2, [victim])
    rm = IndexReader(merged2)
    assert victim not in [d for d, _ in rm.topk(["w0", "w1"], 10)]
    compact_index(merged2)
    rm2 = IndexReader(merged2)
    assert victim not in [d for d, _ in rm2.topk(["w0", "w1"], 10**6)]
    # the source index (sharing inodes pre-compaction) is untouched:
    # every writer replaces files via os.replace, never in place
    assert IndexReader(built["a"]).topk(["w0", "w1"], 10) == ra_before
