"""Text-encoder stage (SURVEY T3 slot) — the reference's BERT path
(``model.py`` gen_embeddings, method="bert": sentence-transformers over the
corpus, then the dense similarity matrix).  The heavy model is not shipped
in this container, so the stage follows the multimodal pattern: the
Ray-side plumbing (actor pool, model load once per ``__init__``, batched
inference, ``fixed_size_list`` embedding column) is real and tested; the
kernel auto-selects:

  kernel="real"  — sentence-transformers model named by
                   ``WIKIREC_ST_MODEL`` (or the default MiniLM), loaded
                   once per actor; raises with guidance when the package
                   is absent.
  kernel="fake"  — deterministic signed-random-projection embedding
                   (each token's 64-bit hash seeds ±1/√d signs per
                   dimension; count-weighted mean pool, L2 normalized) —
                   the classic hashing-trick embedding, fully vectorized,
                   engine-checkable, and good enough to drive the ANN
                   pipelines end-to-end in tests.
  kernel="auto"  — real if importable, else fake.

``encode_corpus`` composes the stage into the reference's embed→similar
flow: documents → embeddings Dataset, ready for ``pipelines.ann`` (the
scalable replacement for gen_embeddings → gen_sim_matrix).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from wikirec_ray.functions.hashing import GOLD64, fmix64, token_hashes_arrow
from wikirec_ray.stages.analyze import _flat_tokens


def _try_sentence_transformers():
    try:
        from sentence_transformers import SentenceTransformer  # noqa: F401

        return SentenceTransformer
    except ImportError:
        return None


class TextEncoderStage:
    """Actor-pool stage: (id, text) -> (id, embedding fixed_size_list<dim>)."""

    def __init__(
        self,
        dim: int = 64,
        kernel: str = "fake",
        model: str | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        import os

        if kernel == "auto":
            kernel = "real" if _try_sentence_transformers() else "fake"
        if kernel == "real":
            cls = _try_sentence_transformers()
            if cls is None:
                raise NotImplementedError(
                    "real text encoding needs sentence-transformers "
                    "(pip install sentence-transformers) — use kernel='fake' "
                    "(or 'auto') for plumbing tests"
                )
            name = model or os.environ.get(
                "WIKIREC_ST_MODEL", "sentence-transformers/all-MiniLM-L6-v2"
            )
            self.model = cls(name)
            self.dim = int(self.model.get_sentence_embedding_dimension())
        elif kernel == "fake":
            if dim < 1:
                raise ValueError("dim must be >= 1")
            self.dim = dim
            # per-dimension salts: deterministic sign projections
            with np.errstate(over="ignore"):
                self._salts = fmix64(
                    np.arange(1, dim + 1, dtype=np.uint64) * GOLD64
                )
        else:
            raise ValueError(f"unknown kernel {kernel!r}")
        self.kernel = kernel
        self.id_col = id_col
        self.text_col = text_col

    def _fake_encode(self, batch: pa.Table) -> np.ndarray:
        parents, flat = _flat_tokens(batch[self.text_col].combine_chunks())
        par = parents.to_numpy(zero_copy_only=False)
        h = token_hashes_arrow(flat)
        n = batch.num_rows
        out = np.zeros((n, self.dim), np.float64)
        if len(h):
            # hash only the UNIQUE token values and aggregate per
            # (doc, token) pair — stream-sized (tokens × dim) temporaries
            # hit this sandbox's fresh-allocation fault-in cost (CLAUDE.md;
            # review r03), and the zipfian stream makes U << tokens
            uniq, codes = np.unique(h, return_inverse=True)
            with np.errstate(over="ignore"):
                signs_u = (
                    (fmix64(uniq[:, None] ^ self._salts[None, :]) & np.uint64(1))
                    .astype(np.float64) * 2.0 - 1.0
                )  # (U, dim)
            U = len(uniq)
            pair_key = par.astype(np.int64) * U + codes
            uk, cnts = np.unique(pair_key, return_counts=True)
            np.add.at(
                out, uk // U, cnts[:, None].astype(np.float64) * signs_u[uk % U]
            )
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-12)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.kernel == "real":
            texts = [t or "" for t in batch[self.text_col].to_pylist()]
            if not texts:  # empty block: encode([]) returns shape (0,)
                mat = np.zeros((0, self.dim), np.float64)
            else:
                mat = np.asarray(
                    self.model.encode(texts, convert_to_numpy=True), np.float64
                )
        else:
            mat = self._fake_encode(batch)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.ascontiguousarray(mat).reshape(-1)), mat.shape[1]
                ),
            }
        )


def encode_corpus(
    ds: ray.data.Dataset,
    dim: int = 64,
    kernel: str = "fake",
    model: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | tuple = 2,
) -> ray.data.Dataset:
    """documents -> (id, embedding) Dataset — the reference's
    gen_embeddings step as an actor-pool stage; feed the result to
    ``pipelines.ann`` for the similar-items flow."""
    return ds.map_batches(
        TextEncoderStage,
        fn_constructor_kwargs=dict(
            dim=dim, kernel=kernel, model=model, id_col=id_col, text_col=text_col
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
