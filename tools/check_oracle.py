"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same sf dir, then compares
row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [only_query_substr]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry
from solr_semantic_importer_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r)) if not hasattr(r, "asDict") else r.asDict()
        out.append(tuple(repr(d[c]) for c in sorted(d)))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else None

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = get_spark("oracle-check", cores=16, shuffle_partitions=16)
    qs, os_ = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and only not in name:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r[c] for c in scols) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:300]}", flush=True)
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle (rows={len(srows)})", flush=True)
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}", flush=True)
            continue
        dt = time.monotonic() - t0
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"schema {scols} vs {ocols}"))
            print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(ocols)}", flush=True)
            continue
        if len(srows) != len(orows):
            failures.append((name, f"rows {len(srows)} vs {len(orows)}"))
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}", flush=True)
            continue
        a = normalize(srows, scols)
        b = normalize(orows, ocols)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ: {diffs}"))
            print(f"FAIL {name}: values differ, first diffs: {diffs}", flush=True)
            continue
        print(f"OK   {name}: {len(srows)} rows ({dt:.1f}s)", flush=True)

    print(f"\n{len(qs) - len(failures)}/{len(qs)} OK", flush=True)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
