#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <outDir> <sfDir>

Reads each <outDir>/<query> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against <sfDir>'s tables,
and compares: column names (sorted), row count, and cell values (rows sorted
by all columns; floats exact after the queries' own rounding, with a 1e-9
fallback tolerance reported separately).
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
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)


def cells_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, False
        if a == b:
            return True, False
        denom = max(abs(a), abs(b), 1.0)
        return abs(a - b) / denom < 1e-9, True
    return a == b, False


def main():
    outdir, sfdir = Path(sys.argv[1]), sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.loads((outdir / "oracle_sql.json").read_text())
    n_pass = n_fail = n_fuzzy = 0
    for name in sorted(oracles):
        pq_dir = outdir / name
        if not pq_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = pd.read_parquet(pq_dir)
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        dtype_diff = [f"{c}(spark={spark_df[c].dtype},duck={duck_df[c].dtype})"
                      for c in sc if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
        if dtype_diff:
            print(f"FAIL {name}: dtypes differ {'; '.join(dtype_diff)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        a = canon(spark_df).sort_values(sc, kind="mergesort").reset_index(drop=True)
        b = canon(duck_df).sort_values(sc, kind="mergesort").reset_index(drop=True)
        bad = fuzzy = 0
        for col in sc:
            av, bv = a[col].tolist(), b[col].tolist()
            for x, y in zip(av, bv):
                ok, was_fuzzy = cells_equal(x, y)
                if not ok:
                    if bad < 3:
                        print(f"  {name}.{col}: spark={x!r} duck={y!r}")
                    bad += 1
                elif was_fuzzy:
                    fuzzy += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells ({len(a)} rows)")
            n_fail += 1
        else:
            tag = f" ({fuzzy} fuzzy-float)" if fuzzy else ""
            if fuzzy:
                n_fuzzy += 1
            print(f"PASS {name}: {len(a)} rows{tag}")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {n_fuzzy} fuzzy-float-pass")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
