"""Fatter groups for the stateful floor: bucket-routed sessionize.

r13 closed the per-ROW cost of the stateful doors (vectorized group
functions, ~0.03 µs/row marginal) and named the remaining floor: the
~300-500 µs/GROUP pandas constructor + state round-trip overhead,
paid once per user per micro-batch. This probe prototypes the named
lever (r13 verdict #7): route the stream by
``groupBy(pmod(hash(user_id), B))`` so one applyInPandasWithState
group carries ~users/B users, with an in-group vectorized segmenter
over the whole bucket (user-change OR gap breaks in ONE lexsort +
diff pass; carried open sessions merged via dict ops per carried
user, not per row) and the bucket's open sessions packed into ONE
array-typed state row.

Measured on the groups axis (users 1×/4×/16×, constant 4 events/user,
single availableNow batch, B = 4×cores buckets) against the
per-user door, with an exact output-equality check between the two.
Measured 2.8x/1.8x/8.7x at 5k/20k/80k users — ADOPTED as
`streaming.stateful.stream_sessionize_bucketed` (per-user door stays
the graded replay's pin; outputs are equality-checked here and in
tests/test_streaming.py).

    python tools/stateful_bucket_probe.py          # full ladder
    python tools/stateful_bucket_probe.py --quick  # smallest rung
"""

from __future__ import annotations

import os
import sys
import time
import uuid

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

GAP_S = 1800
EVENTS_PER_USER = 4


def bucket_sessionize(events, *, gap_s: int = GAP_S, buckets: int = 128):
    """Measured door = the PRODUCTION door (promoted into
    streaming/stateful.py after this probe's ladder cleared the 2x
    adoption bar; the probe keeps importing it so measurement and
    production cannot drift)."""
    from converttovectordb_spark.streaming.stateful import (
        stream_sessionize_bucketed,
    )

    return stream_sessionize_bucketed(
        events, gap_s=gap_s, buckets=buckets, watermark_delay=None
    )


def main() -> int:
    quick = "--quick" in sys.argv
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cpus))

    import tempfile

    from pyspark.sql import functions as F

    from converttovectordb_spark.session import get_spark
    from converttovectordb_spark.streaming.stateful import (
        stream_sessionize,
    )

    spark = get_spark("stateful-bucket-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
    # worker warm (the per-user door's first pandas stage pays forks)
    spark.range(cpus * 100, numPartitions=cpus).groupBy(
        (F.col("id") % 10).alias("g")
    ).count().collect()

    ladder = [5_000] if quick else [5_000, 20_000, 80_000]
    for n_users in ladder:
        # E events/user: 3 in one session + 1 past the gap (so every
        # user closes one session and leaves one open — both carry
        # paths exercised); ts interleaved across users like a real feed
        src = (
            spark.range(n_users * EVENTS_PER_USER)
            .select(
                F.col("id").alias("event_id"),
                (F.col("id") % n_users).alias("user_id"),
                F.timestamp_micros(
                    F.lit(1_700_000_000_000_000)
                    + (F.col("id") / n_users).cast("long") * 60_000_000
                    + F.when(
                        (F.col("id") / n_users).cast("long") == 3,
                        7_200_000_000,
                    ).otherwise(0)
                    + (F.col("id") % n_users) * 1_000
                ).alias("ts"),
                (F.col("id") % 97).cast("double").alias("value"),
            )
        )
        with tempfile.TemporaryDirectory(prefix="bktprobe_") as tmp:
            src.orderBy("ts").coalesce(4).write.parquet(f"{tmp}/events")
            schema = (
                "event_id bigint, user_id bigint, ts timestamp, "
                "value double"
            )

            def run(door):
                ev = spark.readStream.schema(schema).parquet(
                    f"{tmp}/events"
                )
                out = door(ev)
                name = f"bkt_{uuid.uuid4().hex[:8]}"
                t0 = time.perf_counter()
                q = (
                    out.writeStream.outputMode("append")
                    .format("memory")
                    .queryName(name)
                    .option(
                        "checkpointLocation",
                        f"{tmp}/ckpt_{name}",
                    )
                    .trigger(availableNow=True)
                    .start()
                )
                q.processAllAvailable()
                q.stop()
                wall = time.perf_counter() - t0
                rows = spark.table(name).collect()
                spark.catalog.dropTempView(name)
                return wall, sorted(
                    (
                        r["user_id"],
                        r["session_start"],
                        r["session_end"],
                        r["n_events"],
                        round(r["total_value"], 6),
                    )
                    for r in rows
                )

            w_user, rows_user = run(
                lambda ev: stream_sessionize(
                    ev, gap_s=GAP_S, watermark_delay=None
                )
            )
            w_bkt, rows_bkt = run(
                lambda ev: bucket_sessionize(
                    ev, gap_s=GAP_S, buckets=4 * cpus
                )
            )
            assert rows_bkt == rows_user, (
                f"bucket door diverged at {n_users} users: "
                f"{len(rows_bkt)} vs {len(rows_user)} rows"
            )
            print(
                f"users={n_users:>7,} ({n_users * EVENTS_PER_USER:,} events): "
                f"per-user {w_user:.2f}s | bucket(B={4 * cpus}) "
                f"{w_bkt:.2f}s | speedup {w_user / w_bkt:.2f}x | "
                f"outputs equal ({len(rows_user):,} sessions)"
            )

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
