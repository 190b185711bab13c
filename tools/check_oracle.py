#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Loads each <verify_out_dir>/<name> parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB over the <sf_dir> parquet tables, sorts
columns by name and rows by all columns, and reports row/schema/value
matches. Dev tooling only — the real gate is the driver's CORRECTNESS_r{N}.

Strictness (round 2): the round-1 version allowed 1e-9 relative tolerance
and type-insensitive string compare, which reported "ALL OK" while the
driver's hash compare failed 12 DECIMAL-typed queries. The compare is now
representation-exact, modeled on a canonical-string hasher:
  - column dtypes must match (so DECIMAL vs DOUBLE is a schema fail here,
    not a silent value pass);
  - each cell must match in Python type name AND canonical repr — no
    numeric tolerance. NaN==NaN is allowed (both render 'nan'), but
    -0.0 vs 0.0, Decimal('1.4000') vs Decimal('1.4'), 1 vs 1.0, and
    '1' vs 1 all fail, mirroring how a value hasher would see them.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    """Exact representation compare: type name + canonical repr."""
    if a is None and b is None:
        return True
    if type(a).__name__ != type(b).__name__:
        return False
    if isinstance(a, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return repr(a) == repr(b)  # bit-exact incl. -0.0 vs 0.0
    return str(a) == str(b)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if [str(t) for t in g.dtypes] != [str(t) for t in w.dtypes]:
            print(f"FAIL {name}: dtypes {list(map(str, g.dtypes))} "
                  f"!= {list(map(str, w.dtypes))}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        bad = None
        for c in g.columns:
            gv, wv = g[c].tolist(), w[c].tolist()
            for i, (x, y) in enumerate(zip(gv, wv)):
                if not values_equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col {c} row {i}: "
                  f"spark={x!r} ({type(x).__name__}) "
                  f"duck={y!r} ({type(y).__name__})")
            n_fail += 1
        else:
            print(f"OK   {name}: {len(g)} rows x {len(g.columns)} cols")
    print(f"{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'} "
          f"({len(oracle)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
