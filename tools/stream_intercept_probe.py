"""Fixed-intercept measurement of the availableNow replay harness
(r15 verdict #8): how much of stream_funnel / stream_sessionize wall
is the streaming FRAMEWORK (query start, offset log, state store
instancing, processAllAvailable handshake, stop) versus the data?

Arms, interleaved in one session, N reps each:
  empty   — the same door over a stream dir containing ZERO files
            (schema-only source): pure framework intercept.
  replay  — the graded query itself (real events).

If intercept/replay >= ~50%, the graded doors are framework-floor-
bound at this SF and further plan work is pointless (record the floor
in SCALING.md and stop); otherwise §2 applies to the remainder.

Usage: python tools/stream_intercept_probe.py [reps]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time
import uuid

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from converttovectordb_spark import queries as Q
    from converttovectordb_spark.session import get_spark
    from converttovectordb_spark.streaming.stateful import (
        stream_funnel,
        stream_sessionize,
    )

    spark = get_spark("stream-intercept")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = (
        f"event_id bigint, ts {Q._events_physical_ts(sf_dir)}, "
        "user_id bigint, event_type string, value double, props string"
    )

    def empty_replay(door) -> float:
        """availableNow over a dir with no files: framework-only."""
        stream_dir = tempfile.mkdtemp(prefix="intercept_empty_")
        name = f"intercept_{uuid.uuid4().hex[:8]}"
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        t0 = time.time()
        try:
            ev = (
                spark.readStream.schema(schema)
                .parquet(stream_dir)
                .transform(Q._normalize_events_ts)
                .select("user_id", "event_id", "ts", "event_type", "value")
            )
            q = (
                door(ev)
                .writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            spark.table(name).count()
        finally:
            dt = time.time() - t0
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            try:
                spark.catalog.dropTempView(name)
            except Exception:
                pass
            shutil.rmtree(stream_dir, ignore_errors=True)
        return round(dt, 3)

    def graded(qname) -> float:
        t0 = time.time()
        Q.QUERIES[qname](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return round(dt, 3)

    doors = {
        "stream_funnel": lambda ev: stream_funnel(
            ev, window_s=86_400, watermark_delay=None
        ),
        "stream_sessionize": lambda ev: stream_sessionize(
            ev, gap_s=1800, watermark_delay=None
        ),
    }
    for qname, door in doors.items():
        empty_replay(door)  # warm, untimed
        graded(qname)  # warm, untimed
        empties, fulls = [], []
        for _ in range(reps):
            empties.append(empty_replay(door))
            fulls.append(graded(qname))
        e_med, f_med = statistics.median(empties), statistics.median(fulls)
        print(
            f"{qname}: empty min {min(empties):.2f} med {e_med:.2f} "
            f"{empties} | graded min {min(fulls):.2f} med {f_med:.2f} "
            f"{fulls} | intercept share (med) {e_med / f_med:.0%}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
