"""Shared hash-partitioned-groupby helper.

Half the engine's shuffles follow one shape: derive an int partition key
(``key % n_parts``), ``groupby`` that ONE small int column, and run an
exact vectorized computation inside each partition — the pattern that
avoids per-group dispatch over millions of tiny natural keys (see
``dedup._aggregate_pairs``'s measured numbers).  This module is the single
implementation; callers supply the key extraction and the per-partition
function (which receives the partition table INCLUDING the ``ppart``
column and may ignore it).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray.data


def partitioned_map_groups(
    ds: ray.data.Dataset,
    key_fn: Callable[[pa.Table], np.ndarray],
    fn: Callable[[pa.Table], pa.Table],
    n_parts: int = 64,
    part_col: str = "ppart",
) -> ray.data.Dataset:
    """``fn`` per hash partition of ``key_fn(batch) % n_parts``."""

    def add_pp(b: pa.Table) -> pa.Table:
        keys = np.asarray(key_fn(b))
        return b.append_column(
            part_col, pa.array((keys % n_parts).astype(np.int32))
        )

    return (
        ds.map_batches(add_pp, batch_format="pyarrow")
        .groupby(part_col)
        .map_groups(fn, batch_format="pyarrow")
    )
