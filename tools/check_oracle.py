#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>, loads the Spark parquet result,
runs the matching oracle SQL in DuckDB (tables = parquet files in
<sfDir>), sorts columns by name and rows by all columns, and compares
values exactly. Not shipped engine code — a development harness only.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes (and object-dtype date columns) for compare
    import datetime
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            vals = df[c].dropna()
            if len(vals) and isinstance(
                    vals.iloc[0], (datetime.date, datetime.datetime)):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_bad += 1
        elif len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_bad += 1
        else:
            try:
                pd.testing.assert_frame_equal(
                    g, e, check_dtype=False, check_exact=True)
                print(f"OK   {name} ({len(g)} rows)")
            except AssertionError as ex:
                print(f"FAIL {name}: value mismatch\n{str(ex)[:800]}")
                n_bad += 1
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
