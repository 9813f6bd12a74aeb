"""Bucket-routed funnel vs the per-user door, on the groups axis.

r14 verdict #2: the funnel door shares the ~190-500 µs/GROUP pandas
constructor + state round-trip floor that cost the per-user sessionize
door ~15 s of pure overhead at 80k users/batch — the recipe proven by
`tools/stateful_bucket_probe.py` (2.8×/1.8×/8.7× at 5k/20k/80k) is the
named lever. This probe measures the promoted production door
(`streaming.stateful.stream_funnel_bucketed`: one lexsort segments the
bucket by user, each slice advances through the SHARED
`_advance_funnel` kernel, live machines packed into ONE array-typed
state row) against `stream_funnel` with an exact output-equality check.

Event mix per user: view → click(+10 min) → purchase(+20 min) for half
the users, view+click only for a quarter, view only for the rest, plus
one out-of-order noise event — every machine shape (terminal,
mid-funnel, fresh) is carried.

    python tools/funnel_bucket_probe.py          # full ladder
    python tools/funnel_bucket_probe.py --quick  # smallest rung
"""

from __future__ import annotations

import os
import sys
import time
import uuid

sys.path.insert(0, ".")

WINDOW_S = 86_400
EVENTS_PER_USER = 4


def main() -> int:
    quick = "--quick" in sys.argv
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cpus))

    import tempfile

    from pyspark.sql import functions as F

    from converttovectordb_spark.session import get_spark
    from converttovectordb_spark.streaming.stateful import (
        stream_funnel,
        stream_funnel_bucketed,
    )

    spark = get_spark("funnel-bucket-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
    spark.range(cpus * 100, numPartitions=cpus).groupBy(
        (F.col("id") % 10).alias("g")
    ).count().collect()

    ladder = [5_000] if quick else [5_000, 20_000, 80_000]
    for n_users in ladder:
        # slot s per user: 0=view, 1=click (u%2==0 or u%4==1),
        # 2=purchase (u%2==0), 3=noise 'error' — interleaved across
        # users in ts like a real feed
        src = (
            spark.range(n_users * EVENTS_PER_USER)
            .select(
                F.col("id").alias("event_id"),
                (F.col("id") % n_users).alias("user_id"),
                (F.col("id") / n_users).cast("long").alias("_slot"),
            )
            .select(
                "event_id",
                "user_id",
                F.timestamp_micros(
                    F.lit(1_700_000_000_000_000)
                    + F.col("_slot") * 600_000_000
                    + F.col("user_id") * 1_000
                ).alias("ts"),
                F.when(F.col("_slot") == 0, "view")
                .when(
                    (F.col("_slot") == 1)
                    & (
                        (F.col("user_id") % 2 == 0)
                        | (F.col("user_id") % 4 == 1)
                    ),
                    "click",
                )
                .when(
                    (F.col("_slot") == 2) & (F.col("user_id") % 2 == 0),
                    "purchase",
                )
                .otherwise("error")
                .alias("event_type"),
            )
        )
        with tempfile.TemporaryDirectory(prefix="funprobe_") as tmp:
            src.orderBy("ts").coalesce(4).write.parquet(f"{tmp}/events")
            schema = (
                "event_id bigint, user_id bigint, ts timestamp, "
                "event_type string"
            )

            def run(door):
                ev = (
                    spark.readStream.schema(schema)
                    .parquet(f"{tmp}/events")
                    .filter(
                        F.col("event_type").isin(
                            "view", "click", "purchase"
                        )
                    )
                )
                out = door(ev)
                name = f"fun_{uuid.uuid4().hex[:8]}"
                t0 = time.perf_counter()
                q = (
                    out.writeStream.outputMode("append")
                    .format("memory")
                    .queryName(name)
                    .option("checkpointLocation", f"{tmp}/ckpt_{name}")
                    .trigger(availableNow=True)
                    .start()
                )
                q.processAllAvailable()
                q.stop()
                wall = time.perf_counter() - t0
                rows = spark.table(name).collect()
                spark.catalog.dropTempView(name)
                return wall, sorted(
                    (r["user_id"], r["stage_order"], r["stage_ts"])
                    for r in rows
                )

            w_user, rows_user = run(
                lambda ev: stream_funnel(
                    ev, window_s=WINDOW_S, watermark_delay=None
                )
            )
            w_bkt, rows_bkt = run(
                lambda ev: stream_funnel_bucketed(
                    ev,
                    window_s=WINDOW_S,
                    buckets=4 * cpus,
                    watermark_delay=None,
                )
            )
            assert rows_bkt == rows_user, (
                f"bucket funnel diverged at {n_users} users: "
                f"{len(rows_bkt)} vs {len(rows_user)} rows"
            )
            print(
                f"users={n_users:>7,} ({n_users * EVENTS_PER_USER:,} events): "
                f"per-user {w_user:.2f}s | bucket(B={4 * cpus}) "
                f"{w_bkt:.2f}s | speedup {w_user / w_bkt:.2f}x | "
                f"outputs equal ({len(rows_user):,} stage rows)"
            )

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
