"""Driver-style correctness check: run every queries() entry at a given sf
dir, run its oracle_sql() in DuckDB over the same parquet tables, compare
row-count + schema + order-insensitive values (columns sorted by name,
floats rounded to 6dp).

Usage: python tools/check_oracle.py [sf_dir] [only_query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], float):
            df[c] = df[c].astype(float).round(6)
    return df.sort_values(list(df.columns), ignore_index=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL  {name}: ray side raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in sqls:
            print(f"rows  {name}: {len(ray_df)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            sql_df = canon(con.sql(sqls[name]).df())
        except Exception as e:
            print(f"FAIL  {name}: SQL raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ok = True
        if len(ray_df) == 0 and len(sql_df) == 0:
            print(f"ok    {name}: 0 rows both sides [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        if list(ray_df.columns) != list(sql_df.columns):
            print(f"FAIL  {name}: columns {list(ray_df.columns)} vs {list(sql_df.columns)}")
            ok = False
        elif len(ray_df) != len(sql_df):
            print(f"FAIL  {name}: rows {len(ray_df)} vs {len(sql_df)}")
            ok = False
        else:
            for c in ray_df.columns:
                a, b = ray_df[c].to_numpy(), sql_df[c].to_numpy()
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    eq = np.allclose(a.astype(float), b.astype(float), atol=1e-6, equal_nan=True)
                else:
                    eq = (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all()
                if not eq:
                    bad = np.flatnonzero(
                        ~np.isclose(a.astype(float), b.astype(float), atol=1e-6)
                        if a.dtype.kind == "f"
                        else (pd.Series(a).astype(str) != pd.Series(b).astype(str)).to_numpy()
                    )[:3]
                    print(f"FAIL  {name}: column {c} differs at rows {bad.tolist()}")
                    for i in bad:
                        print(f"        ray={ray_df.iloc[i].to_dict()}")
                        print(f"        sql={sql_df.iloc[i].to_dict()}")
                    ok = False
                    break
        if ok:
            print(f"ok    {name}: {len(ray_df)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
