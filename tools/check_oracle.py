#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify (<out>/<name>/ parquet dir) run the
matching SQL from <out>/oracle_sql.json in DuckDB against the same parquet
tables, then compare: columns sorted by name, rows sorted, values compared
exactly (floats to 9 significant digits). Dev tool only — the engine itself
never depends on DuckDB.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir, name)
        if not res_dir.is_dir():
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql)
            duck_cols = [d[0] for d in duck.description]
            duck_rows = duck.fetchall()
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        dc, dr = canon(duck_cols, duck_rows)
        gc, gr = canon(got_cols, got_rows)
        if dc != gc:
            print(f"FAIL {name}: columns differ spark={gc} duck={dc}")
            n_fail += 1
        elif dr != gr:
            diffs = [(a, b) for a, b in zip(gr, dr) if a != b]
            print(f"FAIL {name}: rows spark={len(gr)} duck={len(dr)}, "
                  f"first diffs: {diffs[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
