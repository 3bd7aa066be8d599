#!/usr/bin/env python3
"""Same-scope DuckDB baseline for the bench comparison (dev tool only).

BASELINE.md's 548 s DuckDB number is the round-1 capture of a 77-query
oracle suite; the Spark registry has since grown to 350+. This re-times
the CURRENT oracle suite (the oracle_sql.json a Verify run dumps) in
DuckDB against the same parquet tables, so `bench_vs_baseline` can be
judged as a same-scope ratio. Reports per-family subtotals (the prefix
before the first '_' in each entry name) and the total, median of N
passes.

A per-query cap (seconds, 4th arg, 0 = uncapped) interrupts runaway
queries via con.interrupt() from a timer thread — the uncapped suite
contains DuckDB-quadratic vector-pair oracles that alone exceed an
hour at sf0.1, so a capped capture marks them `capped: true` (their
recorded time is a LOWER bound) while the tractable majority gets
exact numbers.

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> [passes=3] [cap=0]
"""
import json
import sys
import threading
import time
from collections import defaultdict

import duckdb


def main(sf_dir, oracle_path, passes=3, cap=0.0):
    oracle = json.load(open(oracle_path))
    per_query_passes = []
    totals = []
    capped = set()
    for p in range(passes):
        con = duckdb.connect()
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"]:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        times = {}
        t0 = time.time()
        for name, sql in sorted(oracle.items()):
            q0 = time.time()
            timer = None
            if cap > 0:
                timer = threading.Timer(cap, con.interrupt)
                timer.start()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                if "interrupt" in str(e).lower():
                    capped.add(name)
                    print(f"CAP {name}: exceeded {cap}s", file=sys.stderr)
                else:
                    print(f"ERR {name}: {e}", file=sys.stderr)
            finally:
                if timer is not None:
                    timer.cancel()
            times[name] = time.time() - q0
        totals.append(time.time() - t0)
        per_query_passes.append(times)
        con.close()
        print(f"pass {p + 1}/{passes}: {totals[-1]:.1f} s", file=sys.stderr)

    # median-of-passes per query, then family rollup
    med = {}
    for name in per_query_passes[0]:
        vals = sorted(t[name] for t in per_query_passes)
        med[name] = vals[len(vals) // 2]
    fam = defaultdict(lambda: [0.0, 0])
    for name, s in med.items():
        f = name.split("_", 1)[0]
        fam[f][0] += s
        fam[f][1] += 1
    out = {
        "metric": "duckdb_oracle_suite",
        "unit": "sec",
        "sf": sf_dir,
        "n_queries": len(med),
        "passes": passes,
        "cap_s": cap,
        "capped": sorted(capped),
        "pass_totals": [round(t, 2) for t in totals],
        "total_median_sum": round(sum(med.values()), 2),
        "families": {f: {"n": n, "sec": round(s, 2)}
                     for f, (s, n) in sorted(fam.items())},
        "top10": dict(sorted(med.items(), key=lambda kv: -kv[1])[:10]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 3,
         float(sys.argv[4]) if len(sys.argv) > 4 else 0.0)
