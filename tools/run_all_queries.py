"""Run every `__spark_entry__.queries()` entry at a given SF (Spark side
only, no DuckDB): a scale-smoke that catches size-sensitive bugs the
sf0.01 oracle gate can't (hardcoded limits, skew blowups, driver-side
materialization that only hurts at volume).

Usage: python tools/run_all_queries.py [sf_dir] [only_prefix]
Prints one line per entry: name, rows, seconds; exits nonzero on any
failure. Order follows queries() insertion order.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else None

    import __spark_entry__ as entry
    from solr_semantic_importer_spark.session import get_spark

    spark = get_spark("query-sweep", cores=int(os.environ.get("SSI_CPUS", 8)),
                      shuffle_partitions=16)
    failures = 0
    t_all = time.monotonic()
    for name, fn in entry.queries().items():
        if only and not name.startswith(only):
            continue
        t0 = time.monotonic()
        try:
            n = fn(spark, sf_dir).count()
            print(f"OK   {name}: {n} rows ({time.monotonic() - t0:.1f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            failures += 1
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    print(f"\ntotal {time.monotonic() - t_all:.1f}s, failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
