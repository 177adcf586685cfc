"""wikirec_ray — a Ray-Data-native inverted-index build + BM25 query engine.

A from-scratch re-expression of the capabilities of ``andrewtavis/wikirec``
(reference at ``/root/reference``, cited by file:line in docstrings) on top of
``ray.data.Dataset`` pipelines:

- streaming HTML→text extraction and tokenization as ``map_batches`` over
  zero-copy Arrow batches (``stages/extract.py``, ``stages/analyze.py``),
- corpus statistics (document frequency, doc lengths, avgdl) via partial
  per-batch aggregation + a small ``groupby`` (``stages/stats.py``),
- a term-hash-partitioned shuffle that builds delta-gap + varint-compressed
  posting lists with block-max metadata, salted by doc-id range so no shuffle
  group exceeds a bounded size regardless of term skew
  (``stages/index_build.py``),
- immutable on-disk index segments with per-partition manifests carrying
  lineage + build metrics for resumable runs (``state/segments.py``),
- exact term-at-a-time BM25 (k1=1.5, b=0.75) and rank-safe block-max WAND
  top-k retrieval, plus wikirec's multi-input ``recommend`` combine
  (``pipelines/query.py``),
- training-data-pipeline operators: exact / MinHash-LSH / SimHash / n-gram
  Jaccard / embedding-cosine dedup, ANN similarity search, language-ID,
  quality scoring, token counting, fingerprinting (``pipelines/``).

The reference's dense N×N similarity matrix (its "index",
``/root/reference/src/wikirec/model.py:196-290``) is replaced wholesale by the
inverted index; its ``multiprocessing.Pool`` parallelism
(``data_utils.py:476-484``) by Ray Data's streaming executor.
"""

__version__ = "0.1.0"
