"""Bucketed-sessionize state footprint under churn (r14 verdict #6).

The bucket door packs every OPEN session in a bucket into one
array-typed state row, so its per-batch state write is proportional to
DISTINCT carried-open users per bucket — a high-churn stream (many
one-event drive-by users inside the gap) fattens bucket rows where the
per-user door would write many small rows. This probe prices that:
U_active heavy users (4 events, one session left open) plus
churn× U_active drive-by users (1 event each, all left open), one
availableNow batch, then measure

  * state rows (statestore reader) — per-user: one per open user;
    bucket: one per non-empty bucket,
  * on-disk state checkpoint bytes (the RocksDB/HDFS-backed store's
    real footprint — what an executor must hold and snapshot).

Guidance from the measured table lands in SCALING.md (when to prefer
which door, by churn × active users).

    python tools/stateful_churn_probe.py          # full ladder
    python tools/stateful_churn_probe.py --quick  # churn=1 only
"""

from __future__ import annotations

import os
import sys
import time
import uuid

sys.path.insert(0, ".")

GAP_S = 1800
U_ACTIVE = 5_000


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> int:
    quick = "--quick" in sys.argv
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cpus))

    import tempfile

    from pyspark.sql import functions as F

    from converttovectordb_spark.session import get_spark
    from converttovectordb_spark.streaming.stateful import (
        stream_sessionize,
        stream_sessionize_bucketed,
    )

    spark = get_spark("stateful-churn-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
    spark.range(cpus * 100, numPartitions=cpus).groupBy(
        (F.col("id") % 10).alias("g")
    ).count().collect()

    ladder = [1] if quick else [1, 4, 16]
    for churn in ladder:
        n_drive = churn * U_ACTIVE
        # heavy users 0..U_ACTIVE-1: 4 in-gap events (one open session)
        heavy = spark.range(U_ACTIVE * 4).select(
            F.col("id").alias("event_id"),
            (F.col("id") % U_ACTIVE).alias("user_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + (F.col("id") / U_ACTIVE).cast("long") * 60_000_000
                + (F.col("id") % U_ACTIVE) * 1_000
            ).alias("ts"),
            F.lit(1.0).alias("value"),
        )
        # drive-by users U_ACTIVE..: ONE event each, inside the batch's
        # time range → every one leaves a 1-event open session carried
        drive = spark.range(n_drive).select(
            (F.col("id") + U_ACTIVE * 4).alias("event_id"),
            (F.col("id") + U_ACTIVE).alias("user_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + (F.col("id") % 180) * 1_000_000
            ).alias("ts"),
            F.lit(1.0).alias("value"),
        )
        src = heavy.unionByName(drive)
        with tempfile.TemporaryDirectory(prefix="churnprobe_") as tmp:
            src.orderBy("ts").coalesce(4).write.parquet(f"{tmp}/events")
            schema = (
                "event_id bigint, user_id bigint, ts timestamp, "
                "value double"
            )

            def run(door, tag):
                ev = spark.readStream.schema(schema).parquet(
                    f"{tmp}/events"
                )
                name = f"churn_{tag}_{uuid.uuid4().hex[:8]}"
                ckpt = f"{tmp}/ckpt_{name}"
                t0 = time.perf_counter()
                q = (
                    door(ev)
                    .writeStream.outputMode("append")
                    .format("memory")
                    .queryName(name)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                q.processAllAvailable()
                q.stop()
                wall = time.perf_counter() - t0
                spark.catalog.dropTempView(name)
                state_rows = (
                    spark.read.format("statestore").load(ckpt).count()
                )
                return wall, state_rows, _du(f"{ckpt}/state")

            w_u, rows_u, bytes_u = run(
                lambda ev: stream_sessionize(
                    ev, gap_s=GAP_S, watermark_delay=None
                ),
                "user",
            )
            w_b, rows_b, bytes_b = run(
                lambda ev: stream_sessionize_bucketed(
                    ev,
                    gap_s=GAP_S,
                    buckets=4 * cpus,
                    watermark_delay=None,
                ),
                "bkt",
            )
            opens = U_ACTIVE + n_drive
            print(
                f"churn={churn:>2}x ({opens:,} open sessions): "
                f"per-user {rows_u:,} rows / {bytes_u / 1e6:.2f} MB "
                f"({bytes_u / opens:.0f} B/open), {w_u:.2f}s | "
                f"bucket(B={4 * cpus}) {rows_b:,} rows / "
                f"{bytes_b / 1e6:.2f} MB ({bytes_b / opens:.0f} B/open), "
                f"{w_b:.2f}s"
            )

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
