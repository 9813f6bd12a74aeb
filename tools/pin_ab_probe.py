"""Same-window paired A/B of the r15 `_pin` changes (r15 verdict #4).

For each target query, alternately times the query AS COMMITTED
(pins active) and with `queries._pin` monkeypatched to identity
(pins disabled — the r14 duplicated-subtree shape), interleaved in ONE
Spark session so host-window drift hits both arms equally. Reports
per-arm min/median over N reps; the keep/revert decision is the
min-time comparison (the r15 protocol).

Usage: python tools/pin_ab_probe.py [reps] [query ...]
Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

DEFAULT_TARGETS = [
    "binary_quant_recall",
    "mrl_recall_curve",
    "adc_recall_curve",
    "ivf_recall_kmeans",
]


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    targets = sys.argv[2:] or DEFAULT_TARGETS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from converttovectordb_spark import pins
    from converttovectordb_spark import queries as Q
    from converttovectordb_spark.session import get_spark

    spark = get_spark("pin-ab")
    spark.sparkContext.setLogLevel("ERROR")
    real_pin = Q._pin

    def timed(fn) -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        pins.release_pins()
        return round(dt, 3)

    for name in targets:
        fn = Q.QUERIES[name]
        spark.sparkContext.setJobDescription(f"pin-ab warm {name}")
        timed(fn)  # artifact + codegen warm, untimed
        pinned, unpinned = [], []
        for _ in range(reps):
            Q._pin = real_pin
            spark.sparkContext.setJobDescription(f"pin-ab {name} pinned")
            pinned.append(timed(fn))
            Q._pin = lambda df: df
            spark.sparkContext.setJobDescription(f"pin-ab {name} unpinned")
            unpinned.append(timed(fn))
        Q._pin = real_pin
        print(
            f"{name}: pinned min {min(pinned):.2f} med "
            f"{statistics.median(pinned):.2f} {pinned} | unpinned min "
            f"{min(unpinned):.2f} med {statistics.median(unpinned):.2f} "
            f"{unpinned}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
