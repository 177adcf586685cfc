"""Window-shaped aggregates over the ordered ``events`` log.

The reference has no streaming constructs (SURVEY §2.9), but a production
data engine needs the batch expression of them: Ray Data has no event-time
windows, so tumbling windows become a derived window-start key + groupby
(with per-batch partial aggregation — the combiner pattern), and session
windows become one hash-partitioned shuffle (``key % n_parts``) with a
vectorized sort-and-diff pass per partition.  The partitioning assumption:
all events of one KEY land in one partition (guaranteed by the hash), while
a partition holds many keys so no hot key unbounds a group; no
late-data/watermark semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def tumbling_window_agg(
    ds: ray.data.Dataset,
    window: str = "hour",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> ray.data.Dataset:
    """(key, window_start, n_events, sum_value) per tumbling window.

    Per-batch partial aggregation first (one row per (key, window) per
    batch), then a small groupby-sum — the shuffle moves O(keys × windows)
    rows, not O(events)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch[ts_col].combine_chunks(), unit=window)
        g = (
            pa.table({key_col: batch[key_col], "window_start": win,
                      value_col: batch[value_col]})
            .group_by([key_col, "window_start"])
            .aggregate([(value_col, "sum"), (value_col, "count")])
        )
        return pa.table(
            {
                key_col: g[key_col],
                "window_start": g["window_start"],
                "sum_value": g[f"{value_col}_sum"],
                "n_events": pc.cast(g[f"{value_col}_count"], pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(Sum("sum_value", alias_name="sum_value"),
                   Sum("n_events", alias_name="n_events"))
    )

    def final(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("sum_value"),
            "sum_value",
            pc.round(batch["sum_value"], ndigits=6),
        )

    return out.map_batches(final, batch_format="pyarrow")


def hopping_window_agg(
    ds: ray.data.Dataset,
    window_s: int = 3600,
    hop_s: int = 1800,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Hopping (overlapping) windows: every event lands in window_s/hop_s
    windows; output (key, window_start epoch-seconds, sum_value, n_events).

    Same combiner shape as the tumbling path — the explode happens INSIDE
    the per-batch partial aggregation, so the shuffle still moves
    O(keys × windows) rows, not O(events × windows).  window_start is an
    epoch-second int64 (engine- and SQL-portable; no timestamp-zone
    ambiguity)."""
    assert window_s % hop_s == 0, "window must be a multiple of hop"
    k = window_s // hop_s
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        base = (ts // (hop_s * 1_000_000)) * hop_s  # epoch seconds, hop grid
        n = len(ts)
        ws = np.concatenate([base - i * hop_s for i in range(k)])
        g = (
            pa.table(
                {
                    key_col: pa.chunked_array(
                        [batch[key_col].combine_chunks()] * k
                    ),
                    "window_start": pa.array(ws),
                    value_col: pa.chunked_array(
                        [batch[value_col].combine_chunks()] * k
                    ),
                }
            )
            .group_by([key_col, "window_start"])
            .aggregate([(value_col, "sum"), (value_col, "count")])
        )
        return pa.table(
            {
                key_col: g[key_col],
                "window_start": g["window_start"],
                "sum_value": g[f"{value_col}_sum"],
                "n_events": pc.cast(g[f"{value_col}_count"], pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(Sum("sum_value", alias_name="sum_value"),
                   Sum("n_events", alias_name="n_events"))
    )
    return out.map_batches(
        lambda b: b.set_column(
            b.column_names.index("sum_value"), "sum_value",
            pc.round(b["sum_value"], ndigits=6),
        ),
        batch_format="pyarrow",
    )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    n_parts: int = 64,
) -> ray.data.Dataset:
    """As-of join — an operator Ray Data lacks: each left row matches the
    most recent right row of the SAME key with right.ts <= left.ts (ties on
    ts resolved to the max right id, deterministically).  Emits
    (event_id, matched_event_id, lag_s) for matched rows.

    One hash shuffle on ``key % n_parts`` (both sides into the same
    groupby); inside a partition both sides are ordered by a composite
    (key, ts_rel) int64 key and every left row finds its match with ONE
    ``searchsorted`` — no per-key loop.  Partitioning assumption: all rows
    of one key share a partition (guaranteed by the hash); a partition
    holds many keys."""

    def tag(is_left: int):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": b[key_col],
                    "ts": b[ts_col],
                    "rid": b[id_col],
                    "is_left": pa.array(np.full(b.num_rows, is_left, np.int8)),
                    "ppart": pa.array(
                        (b[key_col].to_numpy() % n_parts).astype(np.int32)
                    ),
                }
            )

        return fn

    both = left.map_batches(tag(1), batch_format="pyarrow").union(
        right.map_batches(tag(0), batch_format="pyarrow")
    )

    def join_part(g: pa.Table) -> pa.Table:
        keys = g["key"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        rid = g["rid"].to_numpy()
        is_left = g["is_left"].to_numpy().astype(bool)
        if not is_left.any() or is_left.all():
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "matched_event_id": pa.array([], pa.int64()),
                    "lag_s": pa.array([], pa.float64()),
                }
            )
        # composite sortable key: dense key rank * shift + ts_rel, with
        # shift sized to the partition's ts range — collision-free, and the
        # rank remap keeps the product inside int64 even for huge raw keys
        ts_rel = ts - ts.min()
        shift = int(ts_rel.max()) + 2
        uk = np.unique(keys)
        if len(uk) * shift >= 1 << 62:  # pragma: no cover - pathological
            raise ValueError("asof_join partition key×ts range exceeds int64")
        krank = np.searchsorted(uk, keys)
        ck = krank * shift + ts_rel
        r_ck, r_rid = ck[~is_left], rid[~is_left]
        order = np.lexsort((r_rid, r_ck))
        r_ck, r_rid = r_ck[order], r_rid[order]
        r_keys = keys[~is_left][order]
        r_ts = ts[~is_left][order]
        l_ck, l_rid, l_keys, l_ts = ck[is_left], rid[is_left], keys[is_left], ts[is_left]
        pos = np.searchsorted(r_ck, l_ck, side="right") - 1
        ok = pos >= 0
        posc = np.maximum(pos, 0)
        ok &= r_keys[posc] == l_keys  # match must be the same key
        out_l = l_rid[ok]
        out_r = r_rid[posc[ok]]
        lag = np.round((l_ts[ok] - r_ts[posc[ok]]) / 1e6, 6)
        return pa.table(
            {
                "event_id": pa.array(out_l.astype(np.int64)),
                "matched_event_id": pa.array(out_r.astype(np.int64)),
                "lag_s": pa.array(lag),
            }
        )

    return both.groupby("ppart").map_groups(join_part, batch_format="pyarrow")


def sessionize(
    ds: ray.data.Dataset,
    gap_minutes: float = 30.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    n_parts: int = 64,
) -> ray.data.Dataset:
    """(key, n_sessions): a new session starts when the gap since the key's
    previous event exceeds ``gap_minutes``.

    Arrow-native and skew-bounded: one shuffle on ``key % n_parts`` (a
    partition holds MANY keys, so no single hot user unbounds a group), then
    one vectorized pass per partition — lexsort by (key, ts, tiebreak),
    boolean diff for user/gap breaks, ``add.reduceat`` for per-key counts.
    No pandas conversion, no per-key ``map_groups`` dispatch."""
    from wikirec_ray.functions.partitions import partitioned_map_groups

    gap_us = int(gap_minutes * 60 * 1_000_000)

    def per_part(g: pa.Table) -> pa.Table:
        users = g[key_col].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        tie = g[tiebreak_col].to_numpy()
        order = np.lexsort((tie, ts, users))
        users, ts = users[order], ts[order]
        new_user = np.ones(len(users), bool)
        new_user[1:] = users[1:] != users[:-1]
        brk = new_user.copy()
        brk[1:] |= (ts[1:] - ts[:-1]) > gap_us
        ub = np.flatnonzero(new_user)
        counts = np.add.reduceat(brk.astype(np.int64), ub)
        return pa.table(
            {
                key_col: pa.array(users[ub]),
                "n_sessions": pa.array(counts.astype(np.int64)),
            }
        )

    return partitioned_map_groups(
        ds, lambda b: b[key_col].to_numpy(), per_part, n_parts
    )
