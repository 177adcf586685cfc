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
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def add_ppart(b: pa.Table) -> pa.Table:
        return b.append_column(
            "ppart", pa.array((b[key_col].to_numpy() % n_parts).astype(np.int32))
        )

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

    return (
        ds.map_batches(add_ppart, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(per_part, batch_format="pyarrow")
    )
