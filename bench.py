"""Benchmark harness — runs the engine's query suite end-to-end.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS  (default 32).

Each query is materialized with a `noop` write (full execution, no
driver collect bottleneck) — the honest measure of plan cost.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from converttovectordb_spark.queries import QUERIES
    from converttovectordb_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM/codegen paths so the first timed query doesn't absorb
    # session startup cost.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in QUERIES.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:  # keep the bench alive; report the failure
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            timings[name] = -1.0
            continue
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"bench: {name} {dt:.2f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "query_suite_total_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
