"""Product-analytics probe (r12): measured slopes for the new family —
funnel_conversion, retention_cohorts, and the stateful stream_funnel —
at 1x/4x/16x the sf0.1 events table.

Why: the batch pair is three filter->agg->user-join stages and a
distinct-agg rollup whose 100 TB claim ("joins carry the user
dimension, not events") should be a measured number, not a docstring;
the stream funnel inherits the micro-batch intercept the streaming
section already decomposes, so its slope (not its bench total) is the
scale-relevant term.

Method: the sf0.1 events table is replicated with disjoint user_ids
into sf-shaped dirs (<dir>/events.parquet), so the probe calls the
EXACT graded query functions — zero probe/production drift. Same-time-
range replication grows per-week density, the honest retention
condition. Run:

    python tools/analytics_scale_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
MULTS = [1, 4, 16]
QUERY_NAMES = ["funnel_conversion", "retention_cohorts", "stream_funnel"]


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("analytics-scale-probe")
        .master("local[32]")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from converttovectordb_spark.queries import QUERIES, load_events

    ev0 = load_events(spark, SF_DIR).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    n0 = ev0.count()

    root = tempfile.mkdtemp(prefix="analytics_probe_")
    try:
        dirs: dict[int, str] = {}
        for mult in MULTS:
            copies = [
                ev0.withColumn(
                    "event_id", F.col("event_id") + F.lit(k * n0)
                ).withColumn(
                    "user_id", F.col("user_id") + F.lit(k * 1_000_000)
                )
                for k in range(mult)
            ]
            df = copies[0]
            for c in copies[1:]:
                df = df.unionByName(c)
            d = os.path.join(root, f"x{mult}")
            os.makedirs(d)
            df.repartition(8 * mult).write.parquet(
                os.path.join(d, "events.parquet")
            )
            dirs[mult] = d

        print(f"rows at 1x: {n0}")
        results: dict[str, dict[int, float]] = {}
        for name in QUERY_NAMES:
            fn = QUERIES[name]
            for mult in MULTS:
                best = None
                for _ in range(2):
                    t0 = time.time()
                    rows = fn(spark, dirs[mult]).collect()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                results.setdefault(name, {})[mult] = best
                print(
                    f"{name:22s} x{mult:<3d} {best:7.2f} s "
                    f"({len(rows)} rows)"
                )
        print("\n| query | 1x | 4x | 16x | 16x/1x |")
        print("|---|---|---|---|---|")
        for name, r in results.items():
            print(
                f"| {name} | {r[1]:.2f} | {r[4]:.2f} | {r[16]:.2f} "
                f"| {r[16] / r[1]:.2f}x |"
            )
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
