#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only, not
part of the library). Runs Verify's parquet dumps against the DuckDB
oracle SQL and diffs values column-by-column.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json, sys, math
import duckdb

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if type(v).__name__ == "Decimal":
        return str(v)
    return v

def table(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    data = [tuple(canon(r[i]) for i in order) for r in rows]
    return cols_sorted, data

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        # dtype lint (round-8 verdict ask): the driver's checker renders
        # HUGEINT/DECIMAL as float (hash-mismatch with identical values)
        # and cannot lexsort nested columns. Catch both at DESCRIBE time
        # so the trap class can't recur. sum(BIGINT) silently widens to
        # HUGEINT in DuckDB — wrap it in CAST(... AS BIGINT).
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
            bad_ty = [(c, t) for c, t, *_ in desc
                      if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL")
                      or t.endswith("[]") or t.startswith(("STRUCT", "MAP", "UNION"))]
            if bad_ty:
                print(f"FAIL {name}: oracle dtype lint {bad_ty} "
                      f"(CAST sums to BIGINT; render nested cols scalar)")
                n_bad += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: oracle DESCRIBE failed: {e}")
            n_bad += 1
            continue
        try:
            got_cols, got = table(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            want_cols, want = table(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            n_bad += 1
        elif got != want:
            n_bad += 1
            print(f"FAIL {name}: {len(got)} vs {len(want)} rows", )
            for i, (g, w) in enumerate(zip(got, want)):
                if g != w:
                    print(f"  first diff at row {i}:\n    got  {g}\n    want {w}")
                    break
            else:
                print(f"  row count mismatch only")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(got)} rows)")
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
