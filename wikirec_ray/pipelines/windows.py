"""Window-shaped aggregates over the ordered ``events`` log.

The reference has no streaming constructs (SURVEY §2.9), but a production
data engine needs the batch expression of them: Ray Data has no event-time
windows, so tumbling windows become a derived window-start key + groupby
(with per-batch partial aggregation — the combiner pattern), and session
windows become ``groupby(key).map_groups`` over ts-sorted groups.  The
ordering assumption: all events of one key fit one group and are sorted
there; no late-data/watermark semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
) -> ray.data.Dataset:
    """(key, n_sessions): a new session starts when the gap since the key's
    previous event exceeds ``gap_minutes``.  One shuffle keyed on the
    session key; windowing runs inside ts-sorted groups (the guide's
    streaming-shaped pattern)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        ts = g.sort_values([ts_col, "event_id"])[ts_col]
        new_sessions = (ts.diff() > gap).sum() + 1
        return pd.DataFrame({key_col: [g[key_col].iloc[0]],
                             "n_sessions": np.array([new_sessions], np.int64)})

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
