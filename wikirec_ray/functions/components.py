"""Partition-pinned shard state for iterative min-label propagation.

Lives in a LEAF module importing only numpy + pyarrow on purpose: the class
is instantiated as a Ray actor (``ray.remote`` applied at the call site in
``pipelines/dedup.py``), and a fresh actor process pays the import graph of
the module that defines its class on the first method call.  Defining it
next to the dedup pipelines made every shard cold-import ``ray.data`` and
the whole package (~2-4 s per process, multiplied by the shard count under
CPU contention — measured as the dominant cost of small
``connected_components`` runs).  Here a shard's first call imports only
this file's two array libraries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class ComponentShard:
    """Owns the edges whose SOURCE hashes to this shard plus the labels of
    those source nodes (symmetric edges make every node a source, so
    ownership is total and disjoint).  Per-shard memory is
    O(edges / n_parts).  See ``dedup.connected_components`` for the
    routing / iteration protocol built on top."""

    def __init__(self, part_id: int, n_parts: int):
        self.pid = part_id
        self.P = n_parts
        self._src_chunks: list[np.ndarray] = []
        self._dst_chunks: list[np.ndarray] = []
        self.nodes = np.empty(0, np.int64)
        self.labels = np.empty(0, np.int64)

    def add_edges(self, t: pa.Table) -> None:
        self._src_chunks.append(t["key"].to_numpy().astype(np.int64))
        self._dst_chunks.append(t["val"].to_numpy().astype(np.int64))

    def finalize(self) -> int:
        src = np.concatenate(self._src_chunks) if self._src_chunks else np.empty(0, np.int64)
        dst = np.concatenate(self._dst_chunks) if self._dst_chunks else np.empty(0, np.int64)
        self._src_chunks = []
        self._dst_chunks = []
        order = np.argsort(src, kind="stable")
        self.src, self.dst = src[order], dst[order]
        self.nodes = np.unique(self.src)
        self.labels = self.nodes.copy()
        if len(self.src):
            run_starts = np.searchsorted(self.src, self.nodes)
            self.labels = np.minimum(
                self.nodes, np.minimum.reduceat(self.dst, run_starts)
            )
        # bucket layout computed ONCE: per-round emit is then a gather +
        # P slices, O(E + P), not P full-length masks (O(P·E))
        pid = self.dst % self.P
        self._emit_order = np.argsort(pid, kind="stable")
        self._dst_by_pid = self.dst[self._emit_order]
        self._src_idx_by_pid = np.searchsorted(
            self.nodes, self.src[self._emit_order]
        )
        self._bucket_bounds = np.searchsorted(
            pid[self._emit_order], np.arange(self.P + 1)
        )
        return len(self.nodes)

    def emit(self):
        """Messages (dst_nodes, candidate_labels) bucketed by owner shard —
        one return value per shard (``num_returns`` routing, so a target
        fetches only ITS bucket, never the full message set)."""
        if len(self.src) == 0:
            empty = (np.empty(0, np.int64), np.empty(0, np.int64))
            return tuple(empty for _ in range(self.P)) if self.P > 1 else empty
        lab_arranged = self.labels[self._src_idx_by_pid]
        bb = self._bucket_bounds
        out = [
            (self._dst_by_pid[bb[p] : bb[p + 1]], lab_arranged[bb[p] : bb[p + 1]])
            for p in range(self.P)
        ]
        return tuple(out) if self.P > 1 else out[0]

    def apply(self, *buckets) -> int:
        """Min-merge incoming candidate labels; returns the total label
        decrease (0 = this shard converged this round)."""
        if len(self.nodes) == 0:
            return 0
        nodes_all = np.concatenate([b[0] for b in buckets])
        if len(nodes_all) == 0:
            return 0
        labs_all = np.concatenate([b[1] for b in buckets])
        before = int(self.labels.sum())
        # sort + reduceat instead of the slow unbuffered minimum.at ufunc
        idx = np.searchsorted(self.nodes, nodes_all)
        order = np.argsort(idx, kind="stable")
        idx_s, labs_s = idx[order], labs_all[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(idx_s)) + 1])
        mins = np.minimum.reduceat(labs_s, starts)
        pos = idx_s[starts]
        self.labels[pos] = np.minimum(self.labels[pos], mins)
        return before - int(self.labels.sum())

    def table(self) -> pa.Table:
        return pa.table(
            {"key": pa.array(self.nodes), "label": pa.array(self.labels)}
        )
