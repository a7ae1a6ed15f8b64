#!/usr/bin/env python3
"""Local pre-flight of the driver's correctness gate: compare each
graft.Verify output parquet against its DuckDB oracle on the same tables.
Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.execute(sql).df()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
                failures += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
                failures += 1
                continue
            # dtype-tolerant value compare, but report dtype drift
            drift = [(c, str(g[c].dtype), str(w[c].dtype))
                     for c in g.columns if str(g[c].dtype) != str(w[c].dtype)]
            eq = g.astype(str).equals(w.astype(str))
            if not eq:
                diff_cols = [c for c in g.columns
                             if not g[c].astype(str).equals(w[c].astype(str))]
                print(f"FAIL {name}: value mismatch in {diff_cols}")
                for c in diff_cols[:2]:
                    mask = g[c].astype(str) != w[c].astype(str)
                    print(f"  {c}: got={g[c][mask].head(3).tolist()} "
                          f"want={w[c][mask].head(3).tolist()}")
                failures += 1
            else:
                note = f" (dtype drift: {drift})" if drift else ""
                print(f"OK   {name}: {len(g)} rows{note}")
        except Exception as e:
            print(f"ERROR {name}: {str(e)[:300]}")
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
