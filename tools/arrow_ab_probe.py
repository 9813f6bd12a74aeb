"""Same-window paired A/B: Arrow cogroup scorer vs the r15 fold path
for the shuffled-IVF-join queries (r15 verdict #1's 'done' criterion).

Interleaves the two arms in ONE Spark session (the r15 window-noise
protocol); reports per-arm min/median.

Usage: python tools/arrow_ab_probe.py [reps] [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

DEFAULT_TARGETS = ["vector_knn_selfjoin_ivf", "hard_negatives_corpus"]


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    targets = sys.argv[2:] or DEFAULT_TARGETS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from converttovectordb_spark import queries as Q
    from converttovectordb_spark.operators import search as S
    from converttovectordb_spark.session import get_spark

    spark = get_spark("arrow-ab")
    spark.sparkContext.setLogLevel("ERROR")
    orig = S.ivf_knn_join_shuffled

    def fold_variant(*a, **k):
        k["scorer"] = "fold"
        return orig(*a, **k)

    def timed(fn) -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return round(dt, 3)

    for name in targets:
        fn = Q.QUERIES[name]
        spark.sparkContext.setJobDescription(f"arrow-ab warm {name}")
        timed(fn)  # artifact/codegen/worker warm, untimed
        arrow, fold = [], []
        for _ in range(reps):
            Q.ivf_knn_join_shuffled = orig
            spark.sparkContext.setJobDescription(f"arrow-ab {name} arrow")
            arrow.append(timed(fn))
            Q.ivf_knn_join_shuffled = fold_variant
            spark.sparkContext.setJobDescription(f"arrow-ab {name} fold")
            fold.append(timed(fn))
        Q.ivf_knn_join_shuffled = orig
        print(
            f"{name}: arrow min {min(arrow):.2f} med "
            f"{statistics.median(arrow):.2f} {arrow} | fold min "
            f"{min(fold):.2f} med {statistics.median(fold):.2f} {fold}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
