#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the engine
itself is pure Scala/Spark).

Reads each `<outDir>/<name>` parquet dumped by graft.Verify, runs the
matching SQL from `<outDir>/oracle_sql.json` in DuckDB over the sfDir parquet
tables, and compares: schema (column names), row count, and values (rows
sorted, columns sorted by name — like the driver's hash compare).

Usage: oracle_check.py <sfDir> <outDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return str(a) == str(b)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())

    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.read_parquet(res_dir)
        want = con.execute(oracle[name]).fetchdf()
        errs = []
        if sorted(got.columns) != sorted(want.columns):
            errs.append(f"schema: spark={sorted(got.columns)} duck={sorted(want.columns)}")
        elif len(got) != len(want):
            errs.append(f"rows: spark={len(got)} duck={len(want)}")
        else:
            g, w = canon(got), canon(want)
            for c in g.columns:
                bad = [i for i in range(len(g))
                       if not cmp_cell(g[c].iloc[i], w[c].iloc[i])]
                if bad:
                    i = bad[0]
                    errs.append(f"col {c}: {len(bad)} diffs, first@{i}: "
                                f"spark={g[c].iloc[i]!r} duck={w[c].iloc[i]!r} "
                                f"(dtypes {g[c].dtype}/{w[c].dtype})")
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1

    # rows-only queries (no oracle): just report row counts
    for res_dir in sorted(Path(out_dir).iterdir()):
        if res_dir.is_dir() and res_dir.name not in oracle:
            try:
                n = len(pd.read_parquet(res_dir))
                print(f"ROWS {res_dir.name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            except Exception as e:
                print(f"ROWS {res_dir.name}: unreadable: {e}")

    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
