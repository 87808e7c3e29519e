#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate — STRICT.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [name ...]

For each query dumped by graft.Verify (<out>/<name>/ parquet dir) run the
matching SQL from <out>/oracle_sql.json in DuckDB against the same parquet
tables, then compare the way the driver does:

  * both sides load into pandas (spark parquet via pyarrow, oracle via
    duckdb's .df()), columns sorted by name;
  * any non-scalar output column (list / ndarray / dict / struct) is an
    outright FAIL — the driver's pandas sort throws on these;
  * pandas dtypes must match EXACTLY (int64 vs float64 vs datetime64 units
    all count — DuckDB HUGEINT aggregates come back float64 and the driver
    hash rejects them against Spark's int64);
  * values must be byte-identical after a stable row sort (no float
    rounding, no list→tuple normalization).

Round-4 history: the previous lenient replica (floats to 9 sig digits,
lists tupled) said PASS on 16 rows the driver scored red. Dev tool only —
the engine itself never depends on DuckDB.
"""
import json
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def nonscalar_cols(df):
    # scan EVERY value, not a head() sample: a column scalar in early rows
    # but list-valued later must still be rejected, like the driver would
    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            vals = df[c].dropna()
            if vals.map(
                    lambda v: isinstance(v, (list, dict, np.ndarray, tuple))
            ).any():
                bad.append(c)
    return bad


def canon(df):
    """Columns sorted by name, rows sorted stably over all columns."""
    df = df[sorted(df.columns)]
    if len(df.columns) and len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def compare(name, spark_df, duck_df):
    """Return None if identical under driver semantics, else reason."""
    ns = nonscalar_cols(spark_df)
    if ns:
        return f"non-scalar spark output columns {ns} (driver checker would crash)"
    nd = nonscalar_cols(duck_df)
    if nd:
        return f"non-scalar oracle output columns {nd}"
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        return f"columns differ spark={list(s.columns)} duck={list(d.columns)}"
    sdt, ddt = [str(t) for t in s.dtypes], [str(t) for t in d.dtypes]
    if sdt != ddt:
        diffs = [(c, a, b) for c, a, b in zip(s.columns, sdt, ddt) if a != b]
        return f"dtype mismatch (spark vs duck): {diffs}"
    if len(s) != len(d):
        return f"row count spark={len(s)} duck={len(d)}"
    if not s.equals(d):
        neq = ~(s.eq(d) | (s.isna() & d.isna()))
        bad_rows = neq.any(axis=1)
        idx = list(s.index[bad_rows][:3])
        samples = [(i, s.loc[i].to_dict(), d.loc[i].to_dict()) for i in idx]
        return f"values differ on {int(bad_rows.sum())} rows, first: {samples}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = Path(out_dir, name)
        if not res_dir.is_dir():
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(sql).df()
            spark_df = pd.read_parquet(res_dir)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        try:
            reason = compare(name, spark_df, duck_df)
        except Exception as e:
            print(f"FAIL {name}: comparator crashed: {e}")
            n_fail += 1
            continue
        if reason is None:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {reason}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
