"""Does `pinSharedSubtrees` pay at 10× the graded SF? (r15 verdict #9:
keep the 100 TB notes alive with numbers.)

r16 unpinned the recall family because on local[32] at sf0.1 the
duplicated subtrees of one action are concurrency-hidden and the cache
build serializes them. The 100 TB claim is that the trade inverts once
the duplicated subtree saturates the box. This probe tests exactly
that: the same interleaved pinned-vs-unpinned A/B
(`spark.converttovectordb.pinSharedSubtrees` on/off) on the synthetic
10× dir from tools/suite_scale_probe.py, where each duplicated
brute-force/scoring pass is 10× wider.

Usage: python tools/pin_scale_probe.py [reps] [query ...]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, ".")

DEFAULT_TARGETS = [
    "ivf_recall_curve",
    "adc_recall_curve",
    "mrl_recall_curve",
]


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    targets = sys.argv[2:] or DEFAULT_TARGETS
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("pin-scale-probe")
        .master("local[32]")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from converttovectordb_spark import pins
    from converttovectordb_spark.queries import QUERIES
    from tools.suite_scale_probe import MULT, _replicate_into

    root = tempfile.mkdtemp(prefix="pin_scale_")
    try:
        big = os.path.join(root, f"x{MULT}")
        t0 = time.time()
        _replicate_into(spark, big, MULT)
        print(f"replicated sf0.1 × {MULT} in {time.time() - t0:.1f}s",
              flush=True)

        def timed(fn) -> float:
            t0 = time.time()
            fn(spark, big).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            spark.catalog.clearCache()
            pins.release_pins()
            return round(dt, 3)

        for name in targets:
            fn = QUERIES[name]
            spark.conf.set(
                "spark.converttovectordb.pinSharedSubtrees", "false"
            )
            timed(fn)  # per-dir artifact build + warm, untimed
            pinned, unpinned = [], []
            for _ in range(reps):
                spark.conf.set(
                    "spark.converttovectordb.pinSharedSubtrees", "true"
                )
                pinned.append(timed(fn))
                spark.conf.set(
                    "spark.converttovectordb.pinSharedSubtrees", "false"
                )
                unpinned.append(timed(fn))
            print(
                f"{name} @{MULT}x: pinned min {min(pinned):.2f} med "
                f"{statistics.median(pinned):.2f} {pinned} | unpinned min "
                f"{min(unpinned):.2f} med {statistics.median(unpinned):.2f} "
                f"{unpinned}",
                flush=True,
            )
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
