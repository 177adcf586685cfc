"""Delta-gap + LEB128 varint posting-list compression, vectorized in NumPy.

The reference has no index and no compression (its "index" is a dense N×N
float matrix, ``/root/reference/src/wikirec/model.py:258-290``); this module
is the storage format the north rule pins for posting lists: doc_ids are
delta-gap encoded (first value absolute, then gaps) and both gaps and term
frequencies are LEB128 varints (7 payload bits per byte, high bit =
continuation).

Both encode and decode are vectorized: encode loops over the ≤10 possible
byte positions (not over values); decode computes value boundaries from the
continuation bits and reduces with ``np.add.reduceat``-style segment ids.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # ceil(64 / 7)


def varint_encode(values: np.ndarray) -> bytes:
    """uint64/int64 array -> LEB128 bytes. Values must be non-negative."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    work = v.copy()
    payload = np.zeros((n, _MAX_VARINT_BYTES), dtype=np.uint8)
    nbytes = np.ones(n, dtype=np.int64)  # every value takes >= 1 byte
    for i in range(_MAX_VARINT_BYTES):
        payload[:, i] = (work & np.uint64(0x7F)).astype(np.uint8)
        work >>= np.uint64(7)
        more = work != 0
        if i + 1 < _MAX_VARINT_BYTES:
            nbytes[more] = i + 2
        # set continuation bit on byte i wherever byte i+1 will exist
        payload[more, i] |= 0x80
        if not more.any():
            break
    # gather the used bytes row-major
    col = np.concatenate([np.arange(c) for c in nbytes]) if n else np.empty(0, np.int64)
    row = np.repeat(np.arange(n), nbytes)
    return payload[row, col].tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """LEB128 bytes -> uint64 array. ``count`` (if given) is validated."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    n = int(is_end.sum())
    if count is not None and n != count:
        raise ValueError(f"varint stream holds {n} values, expected {count}")
    # segment id per byte: 0-based index of the value this byte belongs to
    seg = np.zeros(len(b), dtype=np.int64)
    seg[1:] = np.cumsum(is_end[:-1])
    # bit shift per byte = 7 * (position within its value)
    starts = np.zeros(n, dtype=np.int64)
    ends = np.flatnonzero(is_end)
    starts[1:] = ends[:-1] + 1
    pos = np.arange(len(b)) - starts[seg]
    vals = np.zeros(n, dtype=np.uint64)
    np.add.at(vals, seg, (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64)))
    return vals


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (vectorized): 1 + one byte per further
    7-bit group.  Lets callers slice a concatenated varint stream without
    re-encoding."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nb = np.ones(len(v), dtype=np.int64)
    for i in range(1, _MAX_VARINT_BYTES):
        nb += (v >= (np.uint64(1) << np.uint64(7 * i))).astype(np.int64)
    return nb


def delta_encode(doc_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing doc_id array -> gap array (first value absolute)."""
    d = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    if len(d) == 0:
        return d
    out = np.empty_like(d)
    out[0] = d[0]
    np.subtract(d[1:], d[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.ascontiguousarray(gaps, dtype=np.uint64), dtype=np.uint64)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted doc_ids, aligned tfs) -> (doc_blob, tf_blob)."""
    return varint_encode(delta_encode(doc_ids)), varint_encode(tfs)


def decode_postings(doc_blob: bytes, tf_blob: bytes, count: int | None = None):
    doc_ids = delta_decode(varint_decode(doc_blob, count))
    tfs = varint_decode(tf_blob, count)
    return doc_ids, tfs


def decode_restarted(blob: bytes, counts: np.ndarray) -> np.ndarray:
    """Decode a varint delta-gap stream whose delta RESTARTS at each segment
    start (segment i holds ``counts[i]`` values; the first value of a
    segment is absolute).  One decode + one cumsum over the whole stream,
    then a per-segment correction — the shared kernel behind block-restart
    posting decode, per-posting position decode, and run-restart shuffle
    decode (previously four hand-inlined copies)."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    gaps = varint_decode(blob, total)
    if total == 0:
        return gaps
    csum = np.cumsum(gaps, dtype=np.uint64)
    starts = np.zeros(len(counts), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    with np.errstate(over="ignore"):
        adj = csum[starts] - gaps[starts]
    return csum - np.repeat(adj, counts)


def gather_segments(
    values: np.ndarray, starts: np.ndarray, lengths: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate ``values[starts[i] : starts[i] + lengths[i]]`` for all i,
    fully vectorized (the variable-length segment gather used to reorder
    per-posting position sub-streams).  Returns (gathered values,
    int64[len+1] output segment boundaries)."""
    starts = np.asarray(starts, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    out_starts = np.zeros(len(lengths) + 1, np.int64)
    np.cumsum(lengths, out=out_starts[1:])
    idx = np.repeat(starts, lengths) + (
        np.arange(int(out_starts[-1]), dtype=np.int64)
        - np.repeat(out_starts[:-1], lengths)
    )
    return values[idx], out_starts
